"""Diagnose the settled-benchmark discrepancy (round-5 verdict #1).

BENCH_r04.json recorded settled_steps_per_s = 1.4657 (682 ms/step) from
bench.py's settled segment while scripts/tpu_settled_variants.py measured
8.5-8.6 steps/s (116 ms/step) at the SAME config.  The differences between
the two harnesses:

  1. process shape: bench.py compiles TWO distinct full-step jits
     (dispersed block_free, then settled RAS) in one process; the variants
     harness runs one per process (its own header warns the axon tunnel
     degrades on multiple compile RPCs from one client);
  2. step count per invocation: 20 vs 100;
  3. the timed invocation's input: checkpoint+20-steps state vs the raw
     checkpoint state.

Modes (one per process, matching the one-compile-per-process rule):

  settledfirst  — ONLY the settled runner (n=20), warmup + 4 timed
                  invocations.  If this shows ~8.6 steps/s, the two-compile
                  process shape is the culprit; if ~1.5, the overhead is
                  per-invocation at n=20.
  benchlike     — replicate bench.py exactly (dispersed first), then time
                  4 consecutive settled invocations individually.

Usage: python scripts/tpu_settled_diag.py {settledfirst|benchlike} [n_set=20]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "settledfirst"
    n_set = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, forces, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    params, cfgb = load_structure("shell_N_642")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )

    if mode == "benchlike":
        B = 16
        xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                       for i in range(B)])
        qs = np.tile([1.0, 0, 0, 0], (B, 1))
        state = make_state(xs, qs, dtype=jnp.float32)
        F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

        def force_fn(s, i):
            return F

        n_rep = 8
        runner = jax.jit(functools.partial(
            run_bd, geom, cfg, n_steps=n_rep, force_fn=force_fn,
            save_every=n_rep))
        t0 = time.perf_counter()
        s, traj = runner(state, jax.random.key(0))
        _ = float(jnp.sum(s.X))
        print(json.dumps({"ev": "dispersed_compile_s",
                          "t": round(time.perf_counter() - t0, 1)}),
              flush=True)
        t0 = time.perf_counter()
        s, traj = runner(s, jax.random.key(1))
        _ = float(jnp.sum(s.X))
        dt = (time.perf_counter() - t0) / n_rep
        print(json.dumps({"ev": "dispersed_steps_per_s",
                          "v": round(1.0 / dt, 3)}), flush=True)

    settled_cfg = cfg.replace(gmres_restart=60, pc_mode="ras",
                              pc_halo=8.0, pc_halo_max=64,
                              lanczos_max_iters=14, lanczos_err_tol=1e-3)
    s_state, s_key, _, _ = ckpt.load_checkpoint(
        "scripts/data/settled_642.npz", dtype=jnp.float32)
    settled_force = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    settled_runner = jax.jit(functools.partial(
        run_bd, geom, settled_cfg, n_steps=n_set, force_fn=settled_force,
        save_every=n_set))
    t0 = time.perf_counter()
    s2, straj = settled_runner(s_state, s_key)
    _ = float(jnp.sum(s2.X))
    print(json.dumps({"ev": "settled_compile_s",
                      "t": round(time.perf_counter() - t0, 1)}), flush=True)
    key = s_key
    for k in range(4):
        key = jax.random.split(key)[0]
        t0 = time.perf_counter()
        s2, straj = settled_runner(s2, key)
        _ = float(jnp.sum(s2.X))
        wall = time.perf_counter() - t0
        it = np.asarray(straj["iters"])
        res = np.asarray(straj["residual"])
        print(json.dumps({
            "ev": f"settled_invoke_{k}", "wall_s": round(wall, 3),
            "steps_per_s": round(n_set / wall, 3),
            "mean_iters": round(float(it.mean()), 2),
            "max_residual": float(res.max()),
        }), flush=True)


if __name__ == "__main__":
    main()
