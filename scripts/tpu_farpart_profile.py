"""Fine-grained profile of the proxy-grid far apply at 40.96k blobs.

tpu_conv_variants measured: far_part 41.7 ms total, conv einsum 6.4 ms,
idealized spread/interp/FFT ~9 ms — ~27 ms unaccounted.  This times the
REAL stages on the real ctx: _p2m (with its transposes), rfftn on the
padded grid, the conv einsum at the shipped layout, irfftn, _l2p.

Run as a background job; serialize with other TPU work.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import farfield

    G = 11
    p = 4
    B = 3 * p ** 3
    N = 40960
    L = 48.0
    REPS = 10
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, L, (N, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    ctx = jax.jit(lambda rr: farfield.prepare(rr, a=1.0, eta=1.0,
                                              wall=False, grid=G, p=p))(r)
    _ = float(jnp.sum(ctx.W3))
    ncell = G ** 3

    def timeit(name, f, *args):
        run = jax.jit(f)
        y = run(*args)
        s = float(jnp.sum(jnp.abs(y)))
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = run(*args)
            s += float(jnp.sum(jnp.abs(y)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(json.dumps({"case": name, "ms": round(dt, 2)}), flush=True)
        return y

    # cumulative fused prefixes: marginal stage cost = difference between
    # consecutive rows (per-dispatch tunnel overhead subtracts out)
    def s_p2m(f, c):
        return farfield._p2m(c.W3, c.cid, f[None], ncell, p)

    def s_fft(f, c):
        q = s_p2m(f, c)
        Qg = jnp.zeros((1, 2 * G, 2 * G, 2 * G, B), q.dtype)
        Qg = Qg.at[:, :G, :G, :G, :].set(q.reshape(1, G, G, G, B))
        return jnp.fft.rfftn(Qg, axes=(1, 2, 3))

    def s_conv(f, c):
        qh = s_fft(f, c)
        qf = qh.reshape(1, -1, B)
        return farfield._conv_pack(c.khat_free[0], qf)

    def s_ifft(f, c):
        uf = s_conv(f, c)
        uh = uf.reshape(1, 2 * G, 2 * G, G + 1, B)
        return jnp.fft.irfftn(uh, s=(2 * G, 2 * G, 2 * G),
                              axes=(1, 2, 3))[:, :G, :G, :G, :]

    def s_l2p(f, c):
        un = s_ifft(f, c)
        return farfield._l2p(c.W3, c.cid,
                             un.reshape(1, ncell, B), p)

    def s_noop(f, c):
        return f * 2.0

    timeit("noop", s_noop, F, ctx)
    timeit("p2m", s_p2m, F, ctx)
    timeit("p2m_fft", s_fft, F, ctx)
    timeit("p2m_fft_conv", s_conv, F, ctx)
    timeit("p2m_fft_conv_ifft", s_ifft, F, ctx)
    timeit("full_far", s_l2p, F, ctx)

    # near sweep alone
    t = ctx.nbr.shape[0]
    F_s = jnp.concatenate([F[None][:, ctx.order],
                           jnp.zeros((1, t * farfield.TILE - N, 3),
                                     jnp.float32)], axis=1)
    timeit("near_sweep", lambda xs, cs, ids, fs, nbr: farfield._near_sweep(
        xs, cs, ids, fs, None, nbr, nbr.shape[1], False, 0.75, 0, t),
        ctx.x_s, ctx.ci_s, ctx.id_s, F_s, ctx.nbr)


if __name__ == "__main__":
    main()
