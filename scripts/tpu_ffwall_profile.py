"""Wall far-field profile at 102.4k blobs: grid sensitivity + near/far
split + the per-step position-tier rebuild cost.

The ctx-hoisted wall apply measured 240 ms at (10, 10, 5) vs the exact
sweep's 294 ms — too thin an edge for the fluctuating step to win
(0.104 vs 0.171 steps/s: the step also pays per-step lattice builds and
position-tier rebuilds).  This aims the optimization: which grid is
best, where the apply time goes (XLA-gather near sweep vs Gz²-coupled
far convolutions), and what prepare(geo=...) costs per call (the RFD
displaced evaluations and the per-step pin_geometry each pay it).

Run as a background job; serialize with other TPU work.
"""
import functools
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

    from rigid_body_light_tpu.ops import farfield

    a, eta = 0.243553, 1.0
    REPS = 8
    n = 102400
    rng = np.random.default_rng(0)
    # the ffstep slab: thin settled layer (bodies at z ~ 2-2.4 in units
    # of 2a-ish) — NOT the tall ffbench slab; z-thinness is what small-Gz
    # grids exploit
    side = 12.0 * np.sqrt(n / 10240.0)
    pos = rng.uniform([-side, -side, 1.0], [side, side, 8.0], (n, 3))
    r = jnp.asarray(pos, jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def _renorm(u):
        return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

    for grid in [(10, 10, 5), (12, 12, 3), (14, 14, 2), (16, 16, 2),
                 (12, 12, 2)]:
        rec = {"grid": grid}
        try:
            ctx = jax.jit(functools.partial(
                farfield.prepare, a=a, eta=eta, wall=True, grid=grid,
                p=4))(r)
            _sync(ctx.W3)

            for pallas_near in (True, False):
                @jax.jit
                def chain(F, ctx, grid=grid, up=pallas_near):
                    def body(_, v):
                        return _renorm(farfield.mobility_apply(
                            v, r, a=a, eta=eta, wall=True, grid=grid, p=4,
                            ctx=ctx, use_pallas=up))
                    return jax.lax.fori_loop(0, REPS, body, F)

                u = chain(F, ctx)
                s = _sync(u)
                key = "apply_ms" if pallas_near else "apply_ms_xla_near"
                if not np.isfinite(s):
                    rec[key] = "non-finite"
                    continue
                t0 = time.perf_counter()
                _sync(chain(F, ctx))
                rec[key] = round((time.perf_counter() - t0) / REPS * 1e3, 1)
            rec["max_nbr"] = int(ctx.nbr.shape[1])
            # compiled-kernel parity vs the XLA near path (one shot)
            u_p = jax.jit(functools.partial(
                farfield.mobility_apply, r=r, a=a, eta=eta, wall=True,
                grid=grid, p=4, use_pallas=True))(F, ctx=ctx)
            u_x = jax.jit(functools.partial(
                farfield.mobility_apply, r=r, a=a, eta=eta, wall=True,
                grid=grid, p=4, use_pallas=False))(F, ctx=ctx)
            rec["pallas_vs_xla_near_relerr"] = float(
                jnp.max(jnp.abs(u_p - u_x)) / jnp.max(jnp.abs(u_x)))
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps(rec), flush=True)
        time.sleep(5)

    # near/far marginals at the best-guess thin grid, chained
    grid = (14, 14, 2)
    ctx = jax.jit(functools.partial(
        farfield.prepare, a=a, eta=eta, wall=True, grid=grid, p=4))(r)
    _sync(ctx.W3)
    t = ctx.nbr.shape[0]

    @jax.jit
    def far_chain(F, ctx):
        def body(_, v):
            u = farfield._far_part(v[None], ctx.ahat, ctx.W3, ctx.cid,
                                   grid, ctx.h, ctx.lo[2], 4, True, 0.75,
                                   khat_free=ctx.khat_free,
                                   khat_wall=ctx.khat_wall)[0]
            return _renorm(u)
        return jax.lax.fori_loop(0, REPS, body, F)

    u = far_chain(F, ctx)
    _sync(u)
    t0 = time.perf_counter()
    _sync(far_chain(F, ctx))
    print(json.dumps({"case": "far_only_14x14x2",
                      "ms": round((time.perf_counter() - t0) / REPS * 1e3,
                                  1)}), flush=True)
    time.sleep(5)

    pad = t * farfield.TILE - n

    @jax.jit
    def near_chain(F, ctx):
        def body(_, v):
            F_s = jnp.concatenate(
                [v[None][:, ctx.order],
                 jnp.zeros((1, pad, 3), jnp.float32)], axis=1)
            U_s = farfield._near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s, F_s,
                                       ctx.ah_s, ctx.nbr,
                                       ctx.nbr.shape[1], True, 0.75, 0,
                                       t)[:, :n]
            u = jnp.zeros_like(v)[None].at[:, ctx.order, :].set(U_s)[0]
            return _renorm(u)
        return jax.lax.fori_loop(0, REPS, body, F)

    u = near_chain(F, ctx)
    _sync(u)
    t0 = time.perf_counter()
    _sync(near_chain(F, ctx))
    print(json.dumps({"case": "near_only_14x14x2",
                      "ms": round((time.perf_counter() - t0) / REPS * 1e3,
                                  1)}), flush=True)
    time.sleep(5)

    # position-tier rebuild (what RFD displaced evals + pin_geometry pay)
    geo = jax.jit(functools.partial(
        farfield.prepare_geometry, a=a, eta=eta, wall=True, grid=grid,
        p=4))(r)
    _sync(geo.lo)

    @jax.jit
    def prep_chain(r0, geo):
        def body(i, acc):
            c = farfield.prepare(r0 * (1.0 + 1e-7 * i), a=a, eta=eta,
                                 wall=True, grid=grid, p=4, geo=geo)
            return acc + jnp.sum(c.W3)
        return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

    _ = float(prep_chain(r, geo))
    t0 = time.perf_counter()
    _ = float(prep_chain(r, geo))
    print(json.dumps({"case": "prepare_geo_bound",
                      "ms": round((time.perf_counter() - t0) / 4 * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
