"""Proxy-grid far field vs the all-pairs Pallas sweep (open domain).

Measures the free-space mobility matvec on the real chip at bench-like
density: exact symmetric Pallas kernel vs near+far split for several
(grid, p), with the component times (far-only vs total) and the f32
operator error vs the exact sweep.  Run as a background job.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import farfield, rpy_pallas

    a, eta = 0.243553, 1.0
    REPS = 10
    rng = np.random.default_rng(0)

    # (n, wall, positions-maker, variants).  Open cases: uniform cube at
    # bench-like density.  Wall cases: the scale-demo slab (xy wide, z thin)
    # with anisotropic grids keeping cells near-cubic.
    def cube(n, L):
        return rng.uniform(0, L, (n, 3)) * a / 0.243553

    def slab(n):
        side = 12.0 * np.sqrt(n / 10240.0)
        return rng.uniform([-side, -side, 1.0], [side, side, 40.0], (n, 3))

    cases = [
        (40960, False, cube(40960, 22.0), [(None, 4), (None, 6)]),
        (102400, False, cube(102400, 30.0), [(None, 4), (None, 6)]),
        (102400, True, slab(102400), [((10, 10, 5), 4), ((8, 8, 4), 4)]),
        (204800, False, cube(204800, 38.0), [(None, 4)]),
        (204800, True, slab(204800), [((12, 12, 5), 4)]),
        (40960, True, slab(40960), [((7, 7, 4), 4)]),    # wall crossover pin
        (65536, False, cube(65536, 25.8), [(None, 4)]),  # free crossover pin
        (20480, True, slab(20480), [((6, 6, 3), 4)]),    # wall lower bracket
        # scale headroom: 1M blobs on one chip (dense cells ≈ 750/supercell;
        # the blocked-SMEM neighbor stream makes the Pallas near sweep
        # feasible here — the whole-table prefetch layout could not fit).
        # The all-pairs baseline CHAIN is skipped ("noref"): 10 chained
        # exact N² sweeps at 1M is ~minutes of chip time in one execute
        # RPC and crashed the TPU worker (round-5 log) — accuracy is
        # still measured on-chip via the streamed row-block comparator.
        (1048576, False, cube(1048576, 64.9), [(None, 4)], "noref"),
        (1048576, True, slab(1048576), [((14, 14, 5), 4)], "noref"),
        # band tier (round 5): p=6-class error at p=4 lattice cost —
        # (grid, p, band_p) triples
        (102400, True, slab(102400), [((10, 10, 5), 4, 6), ((10, 10, 5), 6)],
         "noref"),
        (102400, False, cube(102400, 30.0), [(None, 4, 6)], "noref"),
    ]
    if len(sys.argv) > 1:  # one case per process (tunnel stability)
        cases = [cases[int(sys.argv[1])]]
    for case in cases:
        n, wall, pos, variants = case[:4]
        noref = len(case) > 4 and case[4] == "noref"
        r = jnp.asarray(pos, jnp.float32)
        F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        out = {"n_blobs": n, "wall": wall}

        def _renorm(u):
            # keep the chained M^k application O(1) in magnitude: repeated
            # unnormalized application overflows f32 at this N (lam_max >> 1)
            return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

        @jax.jit
        def ap_chain(F):
            def body(_, v):
                return _renorm(rpy_pallas.mobility_apply(v, r, a=a, eta=eta,
                                                         wall=wall))
            return jax.lax.fori_loop(0, REPS, body, F)

        if not noref:
            t0 = time.perf_counter()
            u_ref = ap_chain(F)
            _sync(u_ref)
            out["allpairs_compile_s"] = round(time.perf_counter() - t0, 0)
            t0 = time.perf_counter()
            _sync(ap_chain(F))
            out["allpairs_pallas_ms"] = round(
                (time.perf_counter() - t0) / REPS * 1e3, 2)
            print(json.dumps(out), flush=True)
            time.sleep(5)
        u_ref1 = None

        for variant in variants:
            grid, p = variant[:2]
            band_p = variant[2] if len(variant) > 2 else 0
            resolved = grid if grid is not None else farfield.auto_grid(
                n, p, wall)
            rec = {"n_blobs": n, "wall": wall, "grid": grid, "p": p,
                   "band_p": band_p, "resolved_grid": resolved}

            # ctx hoisted ONCE per chain — exactly how the production
            # solvers run it (saddle.hoist_positions binds a prepared
            # FarCtx per solve).  The round-3 numbers called
            # mobility_apply without ctx inside the loop, so every
            # "apply" paid the full kernel-lattice rebuild (~130 ms at
            # 41k) — that measured the rebuild, not the operator.
            t0 = time.perf_counter()
            ctx = jax.jit(functools.partial(
                farfield.prepare, a=a, eta=eta, wall=wall, grid=grid,
                p=p, band_p=band_p))(r)
            _sync(ctx.W3)
            rec["prepare_s"] = round(time.perf_counter() - t0, 1)

            @jax.jit
            def ff_chain(F, ctx):
                def body(_, v):
                    return _renorm(farfield.mobility_apply(
                        v, r, a=a, eta=eta, wall=wall, grid=grid, p=p,
                        band_p=band_p, ctx=ctx))
                return jax.lax.fori_loop(0, REPS, body, F)

            t0 = time.perf_counter()
            u = ff_chain(F, ctx)
            s = _sync(u)
            rec["compile_s"] = round(time.perf_counter() - t0, 0)
            if not np.isfinite(s):
                rec["error"] = "non-finite (overflow?)"
                print(json.dumps(rec), flush=True)
                continue
            t0 = time.perf_counter()
            _sync(ff_chain(F, ctx))
            rec["farfield_ms"] = round(
                (time.perf_counter() - t0) / REPS * 1e3, 2)
            # one-shot operator error vs the exact kernel sweep — jitted
            # (eager materializes every intermediate incl. the kernel-hat
            # lattice and OOM'd 16 GB at the 102k wall case) and with the
            # timed chains' buffers released first
            jax.clear_caches()
            u1 = jax.jit(functools.partial(
                farfield.mobility_apply, r=r, a=a, eta=eta, wall=wall,
                grid=grid, p=p, band_p=band_p))(F, ctx=ctx)
            if n <= 50000 and not wall:
                if u_ref1 is None:
                    u_ref1 = jax.jit(functools.partial(
                        rpy_pallas.mobility_apply, r=r, a=a, eta=eta,
                        wall=wall))(F)
                rec["rel_err_vs_exact"] = float(
                    jnp.max(jnp.abs(u1 - u_ref1)) / jnp.max(jnp.abs(u_ref1)))
            else:
                # streamed row-block compare (mobility_apply_rows): never
                # holds the full exact output next to the proxy context —
                # this is what measures wall accuracy at >=102k ON CHIP
                # (previously inferred from f64 CPU only).  A row sample
                # bounds the max-norm error estimate.
                blk, nblk = 8192, 4
                starts = [int(s) for s in
                          np.linspace(0, n - blk, nblk).round()]
                err = 0.0
                scale = 0.0
                for s0 in starts:
                    ur = jax.jit(functools.partial(
                        rpy_pallas.mobility_apply_rows, r=r,
                        row_start=s0, row_len=blk, a=a, eta=eta,
                        wall=wall))(F)
                    err = max(err, float(jnp.max(jnp.abs(
                        u1[s0:s0 + blk] - ur))))
                    scale = max(scale, float(jnp.max(jnp.abs(ur))))
                rec["rel_err_vs_exact_streamed"] = err / scale
                rec["streamed_rows"] = [blk, nblk]
            print(json.dumps(rec), flush=True)
            time.sleep(5)


if __name__ == "__main__":
    main()
