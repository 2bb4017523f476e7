"""Component breakdown of the proxy-grid far field on the real chip.

Times, at a bench-density case: the near sweep alone, the far part alone
(kernel-hat lattices hoisted by LICM — loop-constant positions), the
kernel-hat build alone, and the full apply.  Drives the near-tile-size /
cell-occupancy tuning (farfield.TILE, farfield.CELL_TARGET).

Usage: python scripts/tpu_farfield_components.py [case_index]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPS = 10


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(x)))


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import farfield

    a = 0.243553
    rng = np.random.default_rng(0)

    def cube(n, L):
        return rng.uniform(0, L, (n, 3))

    def slab(n):
        side = 12.0 * np.sqrt(n / 10240.0)
        return rng.uniform([-side, -side, 1.0], [side, side, 40.0], (n, 3))

    cases = [
        (40960, False, cube(40960, 22.0), None),
        (102400, True, slab(102400), (10, 10, 5)),
        (204800, False, cube(204800, 38.0), None),
    ]
    if len(sys.argv) > 1:
        cases = [cases[int(sys.argv[1])]]
    p = 4
    for n, wall, pos, grid in cases:
        if grid is None:
            grid = farfield.auto_grid(n, p, wall)
        if np.isscalar(grid):
            grid = (int(grid),) * 3
        r = jnp.asarray(pos, jnp.float32)
        F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        rec = {"n_blobs": n, "wall": wall, "grid": grid, "p": p,
               "tile": farfield.TILE,
               "max_nbr": farfield.default_max_nbr(n, grid, p)}

        def renorm(u):
            return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

        def chain(apply_fn):
            @jax.jit
            def run(F):
                def body(_, v):
                    return renorm(apply_fn(v))
                return jax.lax.fori_loop(0, REPS, body, F)
            return run

        def timed(label, fn, arg):
            t0 = time.perf_counter()
            out = fn(arg)
            s = _sync(out)
            rec[label + "_compile_s"] = round(time.perf_counter() - t0, 0)
            if not np.isfinite(s):
                rec[label] = "non-finite"
                return
            t0 = time.perf_counter()
            _sync(fn(arg))
            rec[label + "_ms"] = round(
                (time.perf_counter() - t0) / REPS * 1e3, 2)

        # components via the public knob: near-only = huge grid-less far
        # part is not separable post-hoc, so rebuild the two halves the
        # way mobility_apply composes them
        dtype = r.dtype
        x = r * jnp.asarray(1.0 / a, dtype)
        lo, h = farfield._grid_geometry(x, grid)
        ci, cid = farfield._cell_indices(x, lo, h, grid)
        t3 = (x - lo) / h - ci.astype(dtype)
        W3 = farfield._blob_weights(t3, farfield._cheb_nodes(p))
        order = farfield.tiles.cell_snake_order(ci, grid)
        T = farfield.TILE
        t = -(-n // T)
        pad = t * T - n
        x_s = jnp.concatenate([x[order], jnp.broadcast_to(
            x[order[-1:]], (pad, 3))])
        ci_s = jnp.concatenate([ci[order], jnp.broadcast_to(
            ci[order[-1:]], (pad, 3))])
        id_s = jnp.concatenate(
            [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
        max_nbr = rec["max_nbr"]
        nbr, _ = farfield._near_neighbor_lists(ci_s, t, max_nbr)

        def near_apply(v):
            F_s = jnp.concatenate([v[None][:, order],
                                   jnp.zeros((1, pad, 3), dtype)], axis=1)
            U_s = farfield._near_sweep(
                x_s, ci_s, id_s, F_s, None, nbr, max_nbr, wall,
                farfield.rpy.WALL_H_FLOOR, 0, t)[:, :n]
            return jnp.zeros((1, n, 3), dtype).at[:, order].set(U_s)[0]

        def far_apply(v):
            return farfield._far_part(
                v[None], None, W3, cid, grid, h, lo[2], p, wall,
                farfield.rpy.WALL_H_FLOOR)[0]

        timed("near", chain(near_apply), F)
        timed("far", chain(far_apply), F)
        timed("full", chain(functools.partial(
            farfield.mobility_apply, r=r, a=a, wall=wall, grid=grid, p=p)),
            F)

        # kernel-hat build alone (jitted on h, so nothing is constant-folded)
        khat = jax.jit(lambda hh: farfield._far_kernel_hat(
            hh, grid, p, dtype))
        t0 = time.perf_counter()
        _sync(khat(h))
        rec["khat_compile_s"] = round(time.perf_counter() - t0, 0)
        t0 = time.perf_counter()
        _sync(khat(h * (1.0 + 1e-6)))
        rec["khat_build_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        print(json.dumps(rec), flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
