"""Is jnp.fft the right convolution engine on this TPU?

The proxy-grid far field spends its time in 3-D FFTs over TINY axes
(2G = 22) with a large channel minor dim (B = 3p³ = 192) — measured
166 ms/apply + 229 ms/build at 40.96k blobs, while the per-frequency
matmul work is ~2 GFLOP (sub-millisecond on the MXU).  Hypothesis: XLA's
TPU FFT lowering (padding/transposes on 22-length axes) is the cost, and
explicit DFT-by-matmul over the small axes reclaims it.

Measures, on apply- and build-shaped arrays:
  fft      jnp.fft.rfftn / irfftn (current implementation)
  dftmm    explicit small-axis DFT matmuls, real/imag split

Run as a background job; serialize with other TPU work.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(x)))


def dft_mats(g, dtype=np.float32):
    """(g, g) DFT matrix as (re, im) numpy constants."""
    k = np.arange(g)
    w = np.exp(-2j * np.pi * np.outer(k, k) / g)
    return w.real.astype(dtype), w.imag.astype(dtype)


def idft_mats(g, dtype=np.float32):
    k = np.arange(g)
    w = np.exp(2j * np.pi * np.outer(k, k) / g) / g
    return w.real.astype(dtype), w.imag.astype(dtype)


def main():
    import jax
    import jax.numpy as jnp

    REPS = 20
    G = 11
    gx = gy = gz = 2 * G            # 22
    B = 192                          # 3·4³
    rng = np.random.default_rng(0)

    def chain(f, x0):
        @jax.jit
        def run(x):
            def body(_, v):
                y = f(v)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, REPS, body, x)
        return run

    def timeit(run, x):
        y = run(x)
        _sync(y)
        t0 = time.perf_counter()
        y = run(x)
        _sync(y)
        return (time.perf_counter() - t0) / REPS * 1e3

    # ---- apply-shaped: (1, 22, 22, 22, B) real → rfftn → irfftn
    x = jnp.asarray(rng.standard_normal((1, gx, gy, gz, B)), jnp.float32)

    def fft_round(v):
        vh = jnp.fft.rfftn(v, axes=(1, 2, 3))
        return jnp.fft.irfftn(vh, s=(gx, gy, gz), axes=(1, 2, 3)).astype(
            v.dtype)

    t_fft = timeit(chain(fft_round, x), x)

    # DFT-by-matmul: full complex spectrum over x, y; half over z via rfft
    # matrix (gz//2+1 rows)
    dxr, dxi = dft_mats(gx)
    dyr, dyi = dft_mats(gy)
    hz = gz // 2 + 1
    dzr_f, dzi_f = dft_mats(gz)
    dzr, dzi = dzr_f[:hz], dzi_f[:hz]
    ixr, ixi = idft_mats(gx)
    iyr, iyi = idft_mats(gy)
    # inverse over half-spectrum z: for real output, use the full inverse
    # against the Hermitian-completed spectrum — equivalently real matmul
    # with doubled interior columns
    w = np.ones(hz)
    if gz % 2 == 0:
        w[1:-1] = 2.0
    else:
        w[1:] = 2.0
    izf = np.exp(2j * np.pi * np.outer(np.arange(gz), np.arange(hz)) / gz)
    izr = (izf.real * w / gz).astype(np.float32)
    izi = (izf.imag * w / gz).astype(np.float32)

    j = lambda a: jnp.asarray(a)

    def dft_round(v):
        # forward: z (real → complex half), then y, then x
        ar = jnp.einsum("fz,kxyzb->kxyfb", j(dzr), v)
        ai = jnp.einsum("fz,kxyzb->kxyfb", j(dzi), v)
        br = jnp.einsum("gy,kxyfb->kxgfb", j(dyr), ar) - jnp.einsum(
            "gy,kxyfb->kxgfb", j(dyi), ai)
        bi = jnp.einsum("gy,kxyfb->kxgfb", j(dyr), ai) + jnp.einsum(
            "gy,kxyfb->kxgfb", j(dyi), ar)
        cr = jnp.einsum("hx,kxgfb->khgfb", j(dxr), br) - jnp.einsum(
            "hx,kxgfb->khgfb", j(dxi), bi)
        ci = jnp.einsum("hx,kxgfb->khgfb", j(dxr), bi) + jnp.einsum(
            "hx,kxgfb->khgfb", j(dxi), br)
        # inverse: x, y (complex), then z (half → real)
        er = jnp.einsum("xh,khgfb->kxgfb", j(ixr), cr) - jnp.einsum(
            "xh,khgfb->kxgfb", j(ixi), ci)
        ei = jnp.einsum("xh,khgfb->kxgfb", j(ixr), ci) + jnp.einsum(
            "xh,khgfb->kxgfb", j(ixi), cr)
        fr = jnp.einsum("yg,kxgfb->kxyfb", j(iyr), er) - jnp.einsum(
            "yg,kxgfb->kxyfb", j(iyi), ei)
        fi = jnp.einsum("yg,kxgfb->kxyfb", j(iyr), ei) + jnp.einsum(
            "yg,kxgfb->kxyfb", j(iyi), er)
        out = jnp.einsum("zf,kxyfb->kxyzb", j(izr), fr) - jnp.einsum(
            "zf,kxyfb->kxyzb", j(izi), fi)
        return out

    # correctness vs fft on CPU-checkable size
    ref = fft_round(x)
    got = dft_round(x)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    t_dft = timeit(chain(dft_round, x), x)

    print(json.dumps({
        "case": "apply_roundtrip", "shape": [1, gx, gy, gz, B],
        "fft_ms": round(t_fft, 2), "dftmm_ms": round(t_dft, 2),
        "rel_err": err,
    }), flush=True)

    # ---- spread (P2M), interpolation (L2P) and the conv einsum at the
    # measured 40.96k-blob shapes: is the 166 ms far apply scatter/gather-
    # bound?  Compare the current segment_sum/gather against one-hot
    # matmuls (ctx-resident (ncell, N) indicator, MXU contraction).
    N = 40960
    ncell = G ** 3
    p3 = 64
    cid = jnp.asarray(rng.integers(0, ncell, N), jnp.int32)
    W3 = jnp.asarray(rng.standard_normal((N, p3)), jnp.float32)
    Fv = jnp.asarray(rng.standard_normal((1, N, 3)), jnp.float32)

    from rigid_body_light_tpu.ops import farfield

    @jax.jit
    def p2m_only(F):
        return farfield._p2m(W3, cid, F, ncell, 4)

    def timeit_plain(fn, x, reps=10):
        y = fn(x)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(x)
        _sync(y)
        return (time.perf_counter() - t0) / reps * 1e3

    t_p2m = timeit_plain(p2m_only, Fv)

    onehot = jax.nn.one_hot(cid, ncell, dtype=jnp.float32)  # (N, ncell)

    @jax.jit
    def p2m_mm(F):
        V = (W3[None, :, :, None] * F[:, :, None, :]).reshape(1, N, p3 * 3)
        return jnp.einsum("nc,knb->kcb", onehot, V)

    t_p2m_mm = timeit_plain(p2m_mm, Fv)
    ref = p2m_only(Fv)
    got = p2m_mm(Fv)
    err_p2m = float(jnp.max(jnp.abs(ref - got)) /
                    (1e-30 + jnp.max(jnp.abs(ref))))
    print(json.dumps({"case": "p2m_40960",
                      "segment_sum_ms": round(t_p2m, 2),
                      "onehot_mm_ms": round(t_p2m_mm, 2),
                      "rel_err": err_p2m}), flush=True)

    Unodes = jnp.asarray(rng.standard_normal((1, ncell, p3 * 3)),
                         jnp.float32)

    @jax.jit
    def l2p_gather(U):
        return farfield._l2p(W3, cid, U, 4)

    @jax.jit
    def l2p_mm(U):
        local = jnp.einsum("nc,kcb->knb", onehot, U).reshape(1, N, p3, 3)
        return jnp.einsum("np,knpx->knx", W3, local)

    t_l2p = timeit_plain(l2p_gather, Unodes)
    t_l2p_mm = timeit_plain(l2p_mm, Unodes)
    ref = l2p_gather(Unodes)
    got = l2p_mm(Unodes)
    err_l2p = float(jnp.max(jnp.abs(ref - got)) /
                    (1e-30 + jnp.max(jnp.abs(ref))))
    print(json.dumps({"case": "l2p_40960",
                      "gather_ms": round(t_l2p, 2),
                      "onehot_mm_ms": round(t_l2p_mm, 2),
                      "rel_err": err_l2p}), flush=True)

    # conv einsum: (nf, B, B) complex khat × (k, nf, B) — reads the
    # resident lattice once per apply
    nf = 2 * G * 2 * G * (G + 1)
    khat = (jnp.asarray(rng.standard_normal((nf, B, B)), jnp.float32)
            + 1j * jnp.asarray(rng.standard_normal((nf, B, B)), jnp.float32))
    Qf = (jnp.asarray(rng.standard_normal((1, nf, B)), jnp.float32)
          + 1j * jnp.asarray(rng.standard_normal((1, nf, B)), jnp.float32))

    @jax.jit
    def conv(q):
        return jnp.einsum("oij,koj->koi", khat, q)

    t_conv = timeit_plain(conv, Qf)
    print(json.dumps({"case": "conv_einsum", "nf": int(nf), "B": B,
                      "complex_ms": round(t_conv, 2)}), flush=True)


if __name__ == "__main__":
    main()
