"""Which formulation of the far-field frequency-domain convolution is
fast on this TPU?

The proxy-grid far apply at 40.96k blobs measures 166 ms while its
idealized components (FFT 2 ms, spread 3.2, interp 3.5 —
tpu_fft_microbench) total ~10 ms.  Prime suspect: the per-frequency
complex GEMV ``einsum("oij,koj->koi")`` over nfreq=5808 batched 192×192
blocks — ~1.7 GFLOP that lowers as batched complex matvecs (MXU-hostile
M=1, complex 4×).  Measures, at the exact _far_free shapes (G=11, p=4):

  conv_c64      the shipped complex einsum, k = 1 and 2
  conv_split    real/imag split into 4 real f32 einsums
  conv_bcast    broadcast-multiply-reduce (explicit VPU form)
  conv_pack     re/im packed as 2k RHS columns: (o, i, j)×(o, j, 2k) GEMM
  full_apply    the actual ctx-hoisted mobility_apply at 40.96k
  far_part      the far tier alone (spread + FFT + conv + interp)

All big operands are jit ARGUMENTS (closed-over constants >100 MB are
serialized into the program and the tunnel rejects them).
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


def main():
    import jax
    import jax.numpy as jnp

    REPS = 20
    G = 11
    p = 4
    B = 3 * p ** 3
    g2 = 2 * G
    nfreq = g2 * g2 * (G + 1)
    rng = np.random.default_rng(0)

    def timeit(f, x, *args):
        # scan over REPS distinct inputs inside ONE jit: sequential by
        # data flow (accumulated f32 sum), nothing loop-invariant, no
        # complex carries (the axon backend rejects those in fori_loop);
        # all operands are jit args, never constants
        xs = jnp.stack([x * (1.0 + 1e-6 * i) for i in range(REPS)])

        @jax.jit
        def run(vs, *a):
            def step(acc, v):
                u = f(v, *a)
                return acc + jnp.sum(u), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), vs)
            return out

        y = run(xs, *args)
        _sync(y)
        t0 = time.perf_counter()
        y = run(xs, *args)
        _sync(y)
        return (time.perf_counter() - t0) / REPS * 1e3

    # complex arrays cross the tunnel as (re, im) f32 pairs — complex64
    # jit arguments come back UNIMPLEMENTED from this backend
    kr = jnp.asarray(rng.standard_normal((nfreq, B, B)), jnp.float32)
    ki = jnp.asarray(rng.standard_normal((nfreq, B, B)), jnp.float32)

    for k in (1, 2):
        qr = jnp.asarray(rng.standard_normal((k, nfreq, B)), jnp.float32)

        def conv_c64(q, a, b):
            kh = a + 1j * b
            u = jnp.einsum("oij,koj->koi", kh, q + 0.5j * q)
            return jnp.abs(u).astype(jnp.float32)

        t = timeit(conv_c64, qr, kr, ki)
        print(json.dumps({"case": f"conv_c64_k{k}", "ms": round(t, 2)}),
              flush=True)

        def conv_split(q, a, b):
            x, y = q, 0.5 * q
            ur = jnp.einsum("oij,koj->koi", a, x) - jnp.einsum(
                "oij,koj->koi", b, y)
            ui = jnp.einsum("oij,koj->koi", a, y) + jnp.einsum(
                "oij,koj->koi", b, x)
            return jnp.sqrt(ur * ur + ui * ui)

        t = timeit(conv_split, qr, kr, ki)
        print(json.dumps({"case": f"conv_split_k{k}", "ms": round(t, 2)}),
              flush=True)

        def conv_bcast(q, a, b):
            kh = a + 1j * b
            u = jnp.sum(kh[None] * (q + 0.5j * q)[:, :, None, :], axis=-1)
            return jnp.abs(u).astype(jnp.float32)

        t = timeit(conv_bcast, qr, kr, ki)
        print(json.dumps({"case": f"conv_bcast_k{k}", "ms": round(t, 2)}),
              flush=True)

        def conv_pack(q, a, b, kk=k):
            x, y = q, 0.5 * q
            rhs = jnp.concatenate([x, y], axis=0).transpose(1, 2, 0)
            ar = jnp.einsum("oij,ojc->oic", a, rhs)      # (o, i, 2k)
            br = jnp.einsum("oij,ojc->oic", b, rhs)
            ur = ar[..., :kk] - br[..., kk:]
            ui = ar[..., kk:] + br[..., :kk]
            return jnp.sqrt(ur * ur + ui * ui)

        t = timeit(conv_pack, qr, kr, ki)
        print(json.dumps({"case": f"conv_pack_k{k}", "ms": round(t, 2)}),
              flush=True)

    # the actual far path end to end with hoisted khat, 40.96k blobs
    from rigid_body_light_tpu.ops import farfield

    N = 40960
    L = 48.0
    r = jnp.asarray(rng.uniform(0, L, (N, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    ctx = jax.jit(lambda rr: farfield.prepare(rr, a=1.0, eta=1.0,
                                              wall=False, grid=G, p=p))(r)
    apply_fn = jax.jit(lambda f, rr, c: farfield.mobility_apply(
        f, rr, a=1.0, eta=1.0, wall=False, grid=G, p=p, ctx=c))
    u = apply_fn(F, r, ctx)
    _sync(u)
    t0 = time.perf_counter()
    for _ in range(5):
        u = apply_fn(F, r, ctx)
        _sync(u)
    print(json.dumps({"case": "full_apply_ctx",
                      "ms": round((time.perf_counter() - t0) / 5 * 1e3,
                                  1)}), flush=True)

    far_fn = jax.jit(lambda f, c: farfield._far_part(
        f[None], None, c.W3, c.cid, (G, G, G), c.h, c.lo[2], p, False,
        0.75, khat_free=c.khat_free))
    u = far_fn(F, ctx)
    _sync(u)
    t0 = time.perf_counter()
    for _ in range(5):
        u = far_fn(F, ctx)
        _sync(u)
    print(json.dumps({"case": "far_part_only",
                      "ms": round((time.perf_counter() - t0) / 5 * 1e3,
                                  1)}), flush=True)


if __name__ == "__main__":
    main()
