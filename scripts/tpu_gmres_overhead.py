"""Decompose the per-iteration cost of the GMRES solve at the settled
10,272-blob workload: raw matvec chain vs PC chain vs full gmres with the
real operator vs full gmres with a FREE operator (pure solver machinery).

The settled-state profile shows ~105 ms for a cold solve at ~22-28 iters
(~4 ms/iter) while the Pallas matvec is 2.27 ms — if ~1.5-2 ms/iter is
Givens/cond/basis machinery, fixing the solver implementation is worth as
much as any preconditioner improvement.  Run as a background job.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPS = 10


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.ops import gmres as gmres_mod
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.ops import saddle as saddle_mod
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    params, cfgb = load_structure("shell_N_642")
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, gmres_tol=1e-4, gmres_restart=60,
        gmres_maxiter=60, matvec_row_tile=512, pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state, _, _, _ = ckpt.load_checkpoint("/tmp/settled_642.npz",
                                          dtype=jnp.float32)
    ops = saddle_mod.geometry_ops(geom, state)
    B = state.X.shape[0]
    n = B * params["N"]
    sz = 3 * n + 6 * B
    mob = saddle_mod.mobility_apply_fn(cfg)
    pc = saddle_mod.build_pc(ops, cfg)
    pos = ops.flat_positions

    def timeit(label, fn, probe, per=1):
        t0 = time.perf_counter()
        _sync(fn(probe))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(fn(probe))
        dt = (time.perf_counter() - t0) / per
        print(f"{label:22s}: {dt*1e3:8.3f} ms/unit (compile {comp:.0f} s)",
              flush=True)
        return dt

    # raw matvec chain
    @jax.jit
    def mv_chain(x):
        def body(_, v):
            return mob(v, pos)
        return jax.lax.fori_loop(0, REPS, body, x)

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((n, 3)),
                     jnp.float32)
    t_mv = timeit("matvec", mv_chain, x0, per=REPS)

    # full saddle matvec + PC (one GMRES iteration's operator work)
    def op_full(x):
        lam = x[:3 * n].reshape(-1, 3)
        U = x[3 * n:].reshape(-1, 6)
        s, f = saddle_mod.apply_saddle(lam, U, ops, cfg, mob)
        lam2, U2 = saddle_mod.apply_pc(pc, s, f, ops, cfg)
        return jnp.concatenate([lam2.reshape(-1), U2.reshape(-1)])

    @jax.jit
    def op_chain(x):
        def body(_, v):
            return op_full(v)
        return jax.lax.fori_loop(0, REPS, body, x)

    xf = jnp.asarray(np.random.default_rng(1).standard_normal(sz), jnp.float32)
    t_op = timeit("saddle+pc operator", op_chain, xf, per=REPS)

    # full gmres, real operator, fixed 40 iters (tol tiny so no early exit)
    @jax.jit
    def gm_real(b):
        r = gmres_mod.gmres(op_full, b, tol=1e-12, restart=40, max_restarts=1)
        return r.x + r.iters
    t_gm = timeit("gmres(real,40it)", gm_real, xf, per=40)

    # full gmres, FREE operator (machinery only), fixed 40 iters
    c = jnp.float32(0.5)

    @jax.jit
    def gm_free(b):
        r = gmres_mod.gmres(lambda v: c * v + 0.1 * b, b, tol=1e-12,
                            restart=40, max_restarts=1)
        return r.x + r.iters
    t_free = timeit("gmres(free,40it)", gm_free, xf, per=40)

    print(f"\nper-iteration: operator {t_op*1e3:.2f} ms, "
          f"gmres-with-real {t_gm*1e3:.2f} ms, "
          f"machinery-only {t_free*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
