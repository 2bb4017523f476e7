"""BASELINE.json configs 1-4 benchmark (config 5 is bench.py's headline).

Runs on the real TPU chip (do NOT pin cpu).  Each config prints one JSON
line; timings are host-transfer synced (block_until_ready does not block
through this environment's TPU tunnel).  ~30-60 min total including remote
compiles.  Usage:  python scripts/bench_configs.py [1 2 3 4]
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


def _time(fn, *args, reps=10):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps, out


def config_1():
    """Single shell_N_12 sphere, free space, deterministic mobility solve."""
    import jax, jax.numpy as jnp
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.ops import kinematics as kin, saddle as sad, solvers
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dt=1.0, dtype=jnp.float32,
                           gmres_tol=1e-6, gmres_restart=30, gmres_maxiter=60)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], dtype=jnp.float32)
    ops = sad.geometry_ops(geom, state)
    F = jnp.zeros((1, 6), jnp.float32).at[0, 2].set(-1.0)
    slip = jnp.zeros((params["N"], 3), jnp.float32)

    @jax.jit
    def solve(ops, slip, F):
        r = solvers.solve_saddle(ops, cfg, slip, F)
        return r.U, r.residual, r.iters

    dt_s, (U, res, iters) = _time(lambda: solve(ops, slip, F), reps=20)
    mu = -float(U[0, 2])
    mu_err = abs(mu - 1 / (6 * np.pi)) * 6 * np.pi
    print(json.dumps({
        "config": 1, "workload": "shell_N_12 free-space deterministic solve",
        "solve_ms": round(dt_s * 1e3, 3), "gmres_iters": int(iters),
        "residual": float(res), "mobility_rel_err_vs_6pi_eta_Rh": round(mu_err, 5),
    }), flush=True)


def config_2():
    """Single shell_N_42 sphere near the wall, wall-corrected solve."""
    import jax, jax.numpy as jnp
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.ops import kinematics as kin, saddle as sad, solvers
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_42")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state([[0.0, 0.0, 2.0]], [[1.0, 0, 0, 0]], dtype=jnp.float32)
    F = jnp.zeros((1, 6), jnp.float32).at[0, 2].set(-1.0)
    slip = jnp.zeros((params["N"], 3), jnp.float32)
    out = {"config": 2, "workload": "shell_N_42 near-wall deterministic solve"}
    for wall in (False, True):
        cfg = SimulationConfig(a=params["sep"] / 2, dt=1.0, wall=wall,
                               dtype=jnp.float32, gmres_tol=1e-6,
                               gmres_restart=30, gmres_maxiter=60)
        ops = sad.geometry_ops(geom, state)

        @jax.jit
        def solve(ops, slip, F, cfg=cfg):
            r = solvers.solve_saddle(ops, cfg, slip, F)
            return r.U, r.residual, r.iters

        dt_s, (U, res, iters) = _time(lambda: solve(ops, slip, F), reps=20)
        tag = "wall" if wall else "free"
        out[f"solve_ms_{tag}"] = round(dt_s * 1e3, 3)
        out[f"gmres_iters_{tag}"] = int(iters)
        out[f"mu_zz_{tag}"] = round(-float(U[0, 2]), 6)
    out["wall_overhead_x"] = round(out["solve_ms_wall"] / out["solve_ms_free"], 2)
    out["hindrance_mu_wall_over_free"] = round(out["mu_zz_wall"] / out["mu_zz_free"], 4)
    print(json.dumps(out), flush=True)


def config_3():
    """Single shell_N_162 sphere, fluctuating BD free diffusion."""
    import jax, jax.numpy as jnp
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_162")
    kBT, dt = 0.5, 0.02
    # a batch of independent walkers shares the pair sweep; diffusion
    # statistics come from the ensemble (walkers 40 radii apart: coupling
    # a/r ~ 2.5e-2 per pair, negligible at this tolerance)
    B = 32
    cfg = SimulationConfig(a=params["sep"] / 2, dt=dt, kBT=kBT,
                           dtype=jnp.float32, lanczos_iters=8,
                           gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=40)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(
        np.array([[40.0 * (i % 8), 40.0 * (i // 8), 0.0] for i in range(B)]),
        np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)

    n_steps = 800
    runner = jax.jit(functools.partial(run_bd, geom, cfg, n_steps=n_steps,
                                       save_every=1))
    s, traj = runner(state, jax.random.key(0))
    _sync(s.X)
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _sync(s.X)
    wall_s = time.perf_counter() - t0
    X = np.asarray(traj["X"])  # (T, B, 3)
    # time-averaged MSD over all origins, short lags only (t << T): the
    # long-lag single-origin fit has O(sqrt(t_max/T / B)) ~ 20% statistical
    # error no matter the walker count; time-origin averaging at lags
    # <= T/10 brings it to a few percent
    lags = np.arange(1, 81)
    msd = np.array([((X[l:] - X[:-l]) ** 2).sum(-1).mean() for l in lags])
    D_fit = np.polyfit(lags * dt, msd, 1)[0] / 6.0
    D_theory = kBT / (6 * np.pi * 1.0)  # Rh = 1
    print(json.dumps({
        "config": 3, "workload": "shell_N_162 single-sphere fluctuating BD (x32 walkers)",
        "steps_per_sec": round(n_steps / wall_s, 2),
        "diffusion_rel_err": round(abs(D_fit - D_theory) / D_theory, 4),
        "max_residual": float(np.asarray(traj["residual"]).max()),
    }), flush=True)


def config_4():
    """100 shell_N_42 spheres (4200 blobs) above a wall: det + Brownian."""
    import jax, jax.numpy as jnp
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import run_bd, deterministic_step
    from rigid_body_light_tpu.ops import kinematics as kin, saddle as sad
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_42")
    B = 100
    xs = np.array([[3.0 * (i % 10), 3.0 * (i // 10), 2.0 + 0.3 * (i % 4)]
                   for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True, dtype=jnp.float32,
        lanczos_iters=8, gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    # PC build time (amortized by pc_refresh in the scan)
    @jax.jit
    def build(state):
        return sad.build_pc(sad.geometry_ops(geom, state), cfg)

    import jax as _jax

    def _pc_leaf(pc):
        return _jax.tree.leaves(pc)[0]

    pc = build(state); _sync(_pc_leaf(pc))
    t0 = time.perf_counter()
    for _ in range(5):
        pc = build(state)
    _sync(_pc_leaf(pc))
    pc_ms = (time.perf_counter() - t0) / 5 * 1e3

    # deterministic step
    det = jax.jit(functools.partial(deterministic_step, geom, cfg))
    s, aux = det(state, F); _sync(s.X)
    t0 = time.perf_counter()
    for _ in range(5):
        s, aux = det(s, F)
    _sync(s.X)
    det_sps = 5 / (time.perf_counter() - t0)

    # Brownian scan
    n_rep = 8
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_rep, force_fn=lambda s, i: F,
        save_every=n_rep))
    s, traj = runner(state, jax.random.key(0)); _sync(s.X)
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1)); _sync(s.X)
    bd_sps = n_rep / (time.perf_counter() - t0)
    print(json.dumps({
        "config": 4, "workload": "100x shell_N_42 (4200 blobs) wall suspension",
        "deterministic_steps_per_sec": round(det_sps, 3),
        "bd_steps_per_sec": round(bd_sps, 3),
        "pc_build_ms": round(pc_ms, 2),
        "max_residual": float(np.asarray(traj["residual"]).max()),
    }), flush=True)


if __name__ == "__main__":
    which = [int(x) for x in sys.argv[1:]] or [1, 2, 3, 4]
    t_start = time.perf_counter()
    for c in which:
        print(f"--- config {c} ---", flush=True)
        {1: config_1, 2: config_2, 3: config_3, 4: config_4}[c]()
    print(f"total wall {time.perf_counter() - t_start:.0f}s", flush=True)
