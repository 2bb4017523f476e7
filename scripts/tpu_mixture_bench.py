"""Mixture scale bench: a two-species suspension at the headline blob count
vs the equal-blob single-species workload, same harness, same chip.

VERDICT round-1 item 6's bar: mixture step cost within ~1.2x of an
equal-blob single-species step.  Workloads:

  single   16 x shell_N_642                    = 10,272 blobs (bench.py config 5)
  mixture  12 x shell_N_642 + 16 x shell_N_162 = 10,296 blobs

The small species' reference geometry is scaled by sep_642/sep_162 so both
species share one blob radius a = sep_642/2 (uniform-a RPY, as the
reference assumes) with contiguous blob coverage — i.e. radius-1 spheres
mixed with radius-~0.5 spheres, the physically sensible mixture.

Both run the shipped solver config (preconditioned Lanczos 10, lagged
block PC, GMRES tol 1e-4) through their production scan drivers
(run_bd / run_bd_multi).  Remote compiles are slow; run as a background
job (~25 min).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_REP = 8


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure, multi
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    p642, cfg642 = load_structure("shell_N_642")
    p162, cfg162 = load_structure("shell_N_162")
    scale = p642["sep"] / p162["sep"]
    cfg162s = np.asarray(cfg162) * scale  # small sphere, same blob radius

    cfg = SimulationConfig(
        a=p642["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=8, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )

    # --- single species: 16 x 642 (identical to bench.py) ---
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(16)])
    geom = kin.make_ref_geometry(cfg642, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (16, 1)), dtype=jnp.float32)
    F1 = jnp.zeros((16, 6), jnp.float32).at[:, 2].set(-1.0)
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=N_REP,
        force_fn=lambda s, i: F1, save_every=1,
    ))
    t0 = time.perf_counter()
    s, traj = runner(state, jax.random.key(0))
    _sync(s.X)
    print(f"single: compile+warm {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _sync(s.X)
    dt_single = (time.perf_counter() - t0) / N_REP
    res_s = float(jnp.max(jnp.asarray(traj["residual"])))
    print(f"single-species step: {dt_single*1e3:.1f} ms "
          f"({1/dt_single:.3f} steps/s), residual {res_s:.2e}, "
          f"iters {np.asarray(traj['iters']).tolist()}", flush=True)

    # --- mixture: 12 x 642 + 16 x 162-scaled ---
    mgeom = multi.MultiGeometry.create([cfg642, cfg162s], dtype=jnp.float32)
    xb = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(12)])
    # small spheres sit in the lattice gaps *above* the big ones: blob
    # heights stay > 3a above the wall (placing them at z=1.4 put blobs at
    # 0.9 and cost ~2x GMRES iterations on wall ill-conditioning)
    xsm = np.array([[1.25 + 2.5 * (i % 4), 1.25 + 2.5 * (i // 4),
                     3.6 + 0.2 * (i % 3)] for i in range(16)])
    st_b = make_state(xb, np.tile([1.0, 0, 0, 0], (12, 1)), dtype=jnp.float32)
    st_s = make_state(xsm, np.tile([1.0, 0, 0, 0], (16, 1)), dtype=jnp.float32)
    Fb = jnp.zeros((12, 6), jnp.float32).at[:, 2].set(-1.0)
    Fs = jnp.zeros((16, 6), jnp.float32).at[:, 2].set(-scale**3)

    mrunner = jax.jit(functools.partial(
        multi.run_bd_multi, mgeom, cfg, n_steps=N_REP,
        force_fn=lambda ss, i: (Fb, Fs), save_every=1,
    ))
    t0 = time.perf_counter()
    fin, mtraj = mrunner((st_b, st_s), key=jax.random.key(0))
    _sync(fin[0].X)
    print(f"mixture: compile+warm {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    fin, mtraj = mrunner(fin, key=jax.random.key(1))
    _sync(fin[0].X)
    dt_mix = (time.perf_counter() - t0) / N_REP
    res_m = float(jnp.max(jnp.asarray(mtraj["residual"])))
    print("mixture per-step residuals:",
          [f"{float(r):.1e}" for r in np.asarray(mtraj["residual"])],
          "iters:", np.asarray(mtraj["iters"]).tolist(), flush=True)
    finite = all(bool(jnp.isfinite(s.X).all()) for s in fin)
    n_mix = 12 * 642 + 16 * len(cfg162s)
    print(json.dumps({
        "metric": f"mixture BD step @ {n_mix} blobs (12x642 + 16x162-scaled, wall)"
                  " vs single-species equal-blob step",
        "mixture_ms": round(dt_mix * 1e3, 1),
        "single_ms": round(dt_single * 1e3, 1),
        "ratio": round(dt_mix / dt_single, 3),
        "mixture_residual": res_m, "finite": finite,
    }), flush=True)


if __name__ == "__main__":
    main()
