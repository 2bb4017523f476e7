"""1M-blob far-field operator probe with raised scoped-vmem limit.

The near-sweep kernel holds the packed P array as an unblocked VMEM
operand (64 MB at 1M blobs) — over the default 16 MB scoped-vmem
budget.  This probe raises the budget via per-compile DebugOptions
(forwarded by the remote-compile helper) to measure whether the
VMEM-resident layout works at 1M at all, and at what speed, before
committing to an HBM-streamed kernel variant.

Usage: python scripts/tpu_1m_probe.py [wall] [gx gy gz]
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

    wall = len(sys.argv) > 1 and sys.argv[1] == "wall"
    a, eta = 0.243553, 1.0
    n = 1048576
    REPS = 10
    rng = np.random.default_rng(0)
    if wall:
        side = 12.0 * np.sqrt(n / 10240.0)
        pos = rng.uniform([-side, -side, 1.0], [side, side, 40.0], (n, 3))
        # gz=4 (not 5): the wall lattice scales as gz²·2gx·(gy+1)·B² and
        # the 1M apply sits within ~1.5 GiB of the 16 GiB HBM edge
        grid, p = (14, 14, 4), 4
        if len(sys.argv) > 4:
            grid = tuple(int(v) for v in sys.argv[2:5])
    else:
        pos = rng.uniform(0, 64.9, (n, 3)) * a / 0.243553
        grid, p = None, 4
    r = jnp.asarray(pos, jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    out = {"n_blobs": n, "wall": wall, "grid": grid, "p": p}

    # Split the lattice builds (N-independent, ~GBs of slab/FFT temps
    # each) and the blob tier (N-dependent) into separate XLA programs:
    # one monolithic 1M-blob wall prepare transiently exceeded 16 GiB
    # HBM at runtime, and free+wall lattices in ONE program still did
    # (XLA schedules their multi-GB pipelines concurrently).
    t0 = time.perf_counter()
    if wall:
        from rigid_body_light_tpu.ops import rpy

        gridt, _ = farfield._resolve(n, wall, grid, p, None, False)
        x = r * (1.0 / a)
        lo, h = jax.jit(functools.partial(
            farfield._grid_geometry, grid=gridt))(x)
        kf = jax.jit(functools.partial(
            farfield._far_kernel_hat, grid=gridt, p=p,
            dtype=jnp.float32))(h)
        _sync(kf[0])
        kw = jax.jit(functools.partial(
            farfield._wall_kernel_hat, grid=gridt, p=p, dtype=jnp.float32,
            h_floor=rpy.WALL_H_FLOOR))(lo[2], h)
        _sync(kw[0])
        geo = farfield.FarGeo(lo=lo, h=h, khat_free=kf, khat_wall=kw)
    else:
        geo = jax.jit(functools.partial(
            farfield.prepare_geometry, a=a, eta=eta, wall=wall, grid=grid,
            p=p))(r)
        _sync(geo.khat_free[0])
    out["geometry_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
    t0 = time.perf_counter()
    # geo rides as a jit ARGUMENT — closing over it bakes ~4.5 GB of
    # lattice constants into the program (the remote-compile tunnel
    # rejects >~100 MB payloads)
    ctx = jax.jit(functools.partial(
        farfield.prepare, a=a, eta=eta, wall=wall, grid=grid,
        p=p))(r, geo=geo)
    _sync(ctx.W3)
    out["prepare_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    def _renorm(u):
        return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

    def ff_chain(F, ctx):
        def body(_, v):
            return _renorm(farfield.mobility_apply(
                v, r, a=a, eta=eta, wall=wall, grid=grid, p=p, ctx=ctx))
        return jax.lax.fori_loop(0, REPS, body, F)

    t0 = time.perf_counter()
    compiled = (jax.jit(ff_chain).lower(F, ctx).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": 102400}))
    out["compile_s"] = round(time.perf_counter() - t0, 0)
    t0 = time.perf_counter()
    u = compiled(F, ctx)
    s = _sync(u)
    out["first_run_s"] = round(time.perf_counter() - t0, 1)
    out["finite"] = bool(np.isfinite(s))
    print(json.dumps(out), flush=True)
    t0 = time.perf_counter()
    _sync(compiled(F, ctx))
    out["farfield_ms"] = round((time.perf_counter() - t0) / REPS * 1e3, 2)
    print(json.dumps(out), flush=True)

    # accuracy: streamed row-block compare vs the exact pair kernel
    jax.clear_caches()
    u1 = jax.jit(functools.partial(
        farfield.mobility_apply, r=r, a=a, eta=eta, wall=wall,
        grid=grid, p=p)).lower(F, ctx=ctx).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": 102400}
        )(F, ctx=ctx)
    blk, nblk = 8192, 2
    err = scale = 0.0
    for s0 in [int(s) for s in np.linspace(0, n - blk, nblk).round()]:
        ur = jax.jit(functools.partial(
            rpy_pallas.mobility_apply_rows, r=r, row_start=s0, row_len=blk,
            a=a, eta=eta, wall=wall))(F)
        err = max(err, float(jnp.max(jnp.abs(u1[s0:s0 + blk] - ur))))
        scale = max(scale, float(jnp.max(jnp.abs(ur))))
    out["rel_err_vs_exact_streamed"] = err / scale
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
