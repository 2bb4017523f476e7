"""Stability soak of the shipped bench configuration: 500 steps at the
headline workload (16 x shell_N_642 wall suspension, block_free PC,
preconditioned lanczos 8), checking that the speed survives sustained
stepping — residuals stay converged, no step rejections, bodies stay
above the wall, quaternions stay unit.

Run as a background job (~10 min incl. compile).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, forces, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=60, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    # gravity + wall repulsion so the suspension reaches a sustained
    # near-wall steady state instead of sedimenting out of the window
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    chunk = 100
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=chunk, force_fn=force_fn, save_every=1))

    key = jax.random.key(0)
    t0 = time.perf_counter()
    state, traj = runner(state, key)
    _ = float(jnp.sum(state.X))
    print(f"compile+first chunk {time.perf_counter()-t0:.0f} s", flush=True)

    res_all, it_all, zmin_all = [], [], []
    t0 = time.perf_counter()
    n_chunks = 5
    for c in range(n_chunks):
        key, sub = jax.random.split(key)
        state, traj = runner(state, sub)
        res_all.append(np.asarray(traj["residual"]))
        it_all.append(np.asarray(traj["iters"]))
        zmin_all.append(float(np.asarray(traj["X"])[:, :, 2].min()))
    _ = float(jnp.sum(state.X))
    dt = (time.perf_counter() - t0) / (n_chunks * chunk)
    res = np.concatenate(res_all)
    iters = np.concatenate(it_all)
    qn = np.linalg.norm(np.asarray(state.Q), axis=-1)
    print(json.dumps({
        "metric": "500-step soak @ 10,272 blobs (shipped config)",
        "steps_per_s": round(1.0 / dt, 3),
        "max_residual": float(res.max()),
        "rejected_steps": int((res > cfg.max_step_residual).sum()),
        "mean_iters": round(float(iters.mean()), 2),
        "max_iters": int(iters.max()),
        "min_body_z": round(min(zmin_all), 3),
        "max_quat_norm_err": float(np.abs(qn - 1).max()),
        "finite": bool(np.isfinite(np.asarray(state.X)).all()),
    }), flush=True)


if __name__ == "__main__":
    main()
