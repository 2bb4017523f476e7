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

    # ---- build-shaped slab: (22, 22, B, B) rfft over axis 1 + fft axis 0
    xs = jnp.asarray(rng.standard_normal((gy, gz, B, B // 4)), jnp.float32)

    def fft_slab(v):
        vf = jnp.fft.rfft(v, axis=1)
        return jnp.abs(jnp.fft.fft(vf, axis=0)).astype(v.dtype)

    t_fft_s = timeit(chain(fft_slab, xs), xs)

    def dft_slab(v):
        ar = jnp.einsum("fz,yzbc->yfbc", j(dzr), v)
        ai = jnp.einsum("fz,yzbc->yfbc", j(dzi), v)
        br = jnp.einsum("gy,yfbc->gfbc", j(dyr), ar) - jnp.einsum(
            "gy,yfbc->gfbc", j(dyi), ai)
        bi = jnp.einsum("gy,yfbc->gfbc", j(dyr), ai) + jnp.einsum(
            "gy,yfbc->gfbc", j(dyi), ar)
        return jnp.sqrt(br * br + bi * bi)

    ref = fft_slab(xs)
    got = dft_slab(xs)
    err_s = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    t_dft_s = timeit(chain(dft_slab, xs), xs)
    print(json.dumps({
        "case": "build_slab", "shape": [gy, gz, B, B // 4],
        "fft_ms": round(t_fft_s, 2), "dftmm_ms": round(t_dft_s, 2),
        "rel_err": err_s,
    }), flush=True)


if __name__ == "__main__":
    main()
