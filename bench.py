#!/usr/bin/env python
"""Headline benchmark: fluctuating BD steps/sec at 10k blobs on one TPU chip.

Workload = BASELINE.json config 5: a 16-body suspension of shell_N_642
spheres (10,272 blobs) sedimenting above a no-slip wall, full stochastic
step (2× Lanczos M^{1/2}W, RFD drift, predictor half-kick, preconditioned
GMRES saddle solve, quaternion commit), float32.

TWO regimes, one JSON line: the dispersed-lattice headline (the historical
artifact metric) plus the DEEP-SETTLED continuation from the committed
real checkpoint (``scripts/data/settled_642.npz`` — 500 soak steps under
gravity + wall repulsion; two-layer pile at z ∈ [1.5, 3.4]).  The settled
regime is the honest steady-state number for dense near-wall suspensions
(round-3 verdict) and is reported as the ``settled_steps_per_s`` key.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline compares against the measured CPU-reference cost model
(BENCH_NOTES.md): the reference's per-step work at this size — dense RPY
assembly per operator application + O(N³) Cholesky per noise draw
(``c_rigid_obj.cpp:413-459,661-675``) — measured with vectorized numpy
float32 on one core of this machine (generous to the reference, whose
scalar C++ loops are slower than BLAS): 8553 s/step → 1.17e-4 steps/s.
"""

import functools
import json
import time

import numpy as np

CPU_REFERENCE_STEPS_PER_SEC = 1.17e-4  # measured: see BENCH_NOTES.md


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)] for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    # solver settings tuned on this workload (BENCH_NOTES.md round-2 sweep,
    # scripts/tpu_bench_variants.py): the rotation-equivariant block_free PC
    # is built ONCE per trajectory (body-frame constants) and is never
    # stale, so it both costs nothing per step and converges in ~7 GMRES
    # iterations where the lagged wall-corrected block PC needed ~25 (the
    # lag, not the wall terms, dominated the iteration count; true-residual
    # parity between the two PCs verified in tests).  Preconditioned Lanczos
    # noise at 6 iterations is equilibrium-validated (VALIDATION.md) and
    # measured 5.2e-4 from a converged draw at this exact workload
    # (scripts/tpu_noise_accuracy.py).
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    n_blobs = B * params["N"]

    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    def force_fn(s, i):
        return F

    n_rep = 8
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_rep, force_fn=force_fn, save_every=n_rep
    ))

    # warmup / compile
    s, traj = runner(state, jax.random.key(0))
    _ = float(jnp.sum(s.X))  # host sync (block_until_ready is unreliable here)

    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _ = float(jnp.sum(s.X))
    dt = (time.perf_counter() - t0) / n_rep

    assert bool(jnp.isfinite(s.X).all()), "trajectory diverged"
    assert float(jnp.max(jnp.asarray(traj["residual"]))) < 10 * cfg.gmres_tol, "solver not converging"
    steps_per_sec = 1.0 / dt

    # ---- deep-settled continuation (same physics, the committed real
    # checkpoint, the production force field of the soak): the regime
    # where the RAS halo-coupling PC earns its keep
    from rigid_body_light_tpu import forces
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    # halo 8 beats 4 (9.2 vs 10.2 mean iters); adaptive noise is ~free at
    # restart 60 (tpu_settled_variants round-4 A/B)
    settled_cfg = cfg.replace(gmres_restart=60, pc_mode="ras",
                              pc_halo=8.0, pc_halo_max=64,
                              lanczos_max_iters=14, lanczos_err_tol=1e-3)
    s_state, s_key, _, _ = ckpt.load_checkpoint(
        "scripts/data/settled_642.npz", dtype=jnp.float32)
    settled_force = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    n_set = 20
    settled_runner = jax.jit(functools.partial(
        run_bd, geom, settled_cfg, n_steps=n_set, force_fn=settled_force,
        save_every=n_set))
    s2, straj = settled_runner(s_state, s_key)
    _ = float(jnp.sum(s2.X))
    t0 = time.perf_counter()
    s2, straj = settled_runner(s2, jax.random.split(s_key)[0])
    _ = float(jnp.sum(s2.X))
    settled_sps = n_set / (time.perf_counter() - t0)
    assert bool(jnp.isfinite(s2.X).all()), "settled trajectory diverged"
    settled_iters = float(np.asarray(straj["iters"]).mean())
    assert float(np.asarray(straj["residual"]).max()) < 10 * cfg.gmres_tol
    print(json.dumps({
        "metric": f"fluctuating BD steps/sec @ {n_blobs} blobs (16x shell_N_642, wall)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / CPU_REFERENCE_STEPS_PER_SEC, 1),
        # the deep-settled continuation (real checkpoint, RAS PC) — the
        # steady-state number for dense near-wall suspensions
        "settled_steps_per_s": round(settled_sps, 4),
        "settled_mean_iters": round(settled_iters, 1),
        "settled_pc": settled_cfg.pc_mode,
        # exact solver config measured — the artifact is self-describing
        "config": {
            "dtype": "float32",
            "lanczos_iters": cfg.lanczos_iters,
            "lanczos_precond": cfg.lanczos_precond,
            "split_rand": cfg.split_rand,
            "drift_mode": cfg.drift_mode,
            "pc": cfg.pc_mode or ("block" if cfg.block_diag_pc else "diag"),
            "pc_refresh": cfg.pc_refresh,
            "gmres_tol": cfg.gmres_tol,
            "use_pallas": cfg.use_pallas,
        },
    }))


if __name__ == "__main__":
    main()
