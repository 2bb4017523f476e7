"""Solver-config sweep on the headline workload (bench.py's 16x shell_N_642
wall suspension): measure steps/s for candidate shipped configs.

Round-2 step profile (scripts/tpu_step_profile.py) found the block-PC
build dominates the amortized step (238 ms per build / pc_refresh=4
= 59 ms of a ~270 ms step), ahead of noise (56 ms) and the cold GMRES
solve (54 ms).  Candidates attack that:

  base          shipped config (block PC, pc_refresh=4, lanczos 10)
  refresh8      lag the block PC twice as long
  block_free    rotation-equivariant body-frame PC — ZERO build cost,
                but free-space blocks (no wall) may cost iterations
  lanczos8      noise at 8 preconditioned iterations (equilibrium-validated
                separately before shipping)

Each variant reports steps/s + mean executed GMRES iterations (from the
new traj["iters"]).  One process, sequential compiles; run in background.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_REP = 8


def measure(name, cfg_kwargs, bodies=16):
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = bodies
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    base = dict(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=10, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, block_diag_pc=True, pc_refresh=4,
    )
    base.update(cfg_kwargs)
    cfg = SimulationConfig(**base)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=N_REP, force_fn=lambda s, i: F,
        save_every=1,
    ))
    t0 = time.perf_counter()
    s, traj = runner(state, jax.random.key(0))
    _ = float(jnp.sum(s.X))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _ = float(jnp.sum(s.X))
    dt = (time.perf_counter() - t0) / N_REP
    print(json.dumps({
        "variant": name, "n_blobs": B * params["N"],
        "steps_per_s": round(1.0 / dt, 3),
        "ms_per_step": round(dt * 1e3, 1),
        "mean_iters": round(float(np.asarray(traj["iters"]).mean()), 1),
        "max_residual": float(np.asarray(traj["residual"]).max()),
        "finite": bool(jnp.isfinite(s.X).all()),
        "compile_s": round(compile_s),
    }), flush=True)


VARIANTS = {
    "base": {},
    "shipped41k": {"pc_mode": "block_free", "pc_refresh": 1,
                   "lanczos_iters": 6, "_bodies": 64},
    "block_free": {"pc_mode": "block_free", "pc_refresh": 1},
    "refresh8": {"pc_refresh": 8},
    "lanczos8": {"lanczos_iters": 8},
    "blockfree_lz8": {"pc_mode": "block_free", "pc_refresh": 1,
                      "lanczos_iters": 8},
    "blockfree_lz6": {"pc_mode": "block_free", "pc_refresh": 1,
                      "lanczos_iters": 6},
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        kw = dict(VARIANTS[n])
        bodies = kw.pop("_bodies", 16)
        measure(n, kw, bodies=bodies)
