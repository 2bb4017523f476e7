"""Run the headline soak to steady state on the TPU and checkpoint the
settled configuration (X, Q, key) for offline PC/solver studies.

The synthetic jittered-lattice 'settled' configs underestimate the real
settled layer's near-contact coupling; this captures the exact state the
round-2 soak measured at 9.13 steps/s / 16 mean GMRES iters.

Usage: python scripts/tpu_soak_checkpoint.py [n_steps=500] [out.npz]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/settled_642.npz"
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, forces, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    chunk = 100
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=chunk, force_fn=force_fn, save_every=chunk))
    key = jax.random.key(0)
    t0 = time.perf_counter()
    iters_tail = []
    for c in range(n_steps // chunk):
        key, sub = jax.random.split(key)
        state, traj = runner(state, sub)
        it = np.asarray(traj["iters"])
        iters_tail.append(it)
        print(f"chunk {c}: {time.perf_counter()-t0:.0f}s elapsed, "
              f"iters last={int(it[-1])}", flush=True)
    ckpt.save_checkpoint(out_path, state, key, step=n_steps)
    print(json.dumps({
        "saved": out_path, "steps": n_steps,
        "z_range": [float(np.asarray(state.X)[:, 2].min()),
                    float(np.asarray(state.X)[:, 2].max())],
        "final_chunk_mean_iters": float(np.concatenate(iters_tail[-1:]).mean()),
    }), flush=True)


if __name__ == "__main__":
    main()
