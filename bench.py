#!/usr/bin/env python
"""Headline benchmark — THREE regimes, one JSON line.

1. ``value``: fluctuating BD steps/sec at 10,272 blobs (dispersed lattice,
   16× shell_N_642 over a wall) — the historical artifact metric.
2. ``settled_steps_per_s``: the DEEP-SETTLED continuation from the
   committed real checkpoint (``scripts/data/settled_642.npz`` — 500 soak
   steps under gravity + wall repulsion; two-layer pile at z ∈ [1.5, 3.4]),
   RAS halo-coupling PC — the honest steady-state number for dense
   near-wall suspensions.
3. ``farfield_102k_steps_per_s``: the full fluctuating BD step at 102,480
   blobs (40× shell_N_2562, wall) on the O(N) far-field backend with the
   Pallas neighbor-tile near sweep — the at-scale number, past the
   reference's O(N²) wall (``c_rigid_obj.cpp:413-459``).

Harness shape (round-5 diagnosis, ``scripts/tpu_settled_diag.py``): the
axon tunnel intermittently stalls a single execute RPC for minutes after
a process issues MORE than one full-step compile (measured: an identical
20-step invocation took 2.0 s, 772.8 s, 2.2 s back-to-back in a
two-compile process, while a one-compile process ran 2.0-2.2 s four times
straight — the r04 artifact's settled 1.47 steps/s was exactly such a
stall, not compute).  So each regime runs in its OWN subprocess (one
compile per process) and reports the BEST of 3 timed invocations; all 3
are recorded for honesty.

vs_baseline compares against the measured CPU-reference cost model
(BENCH_NOTES.md): the reference's per-step work at this size — dense RPY
assembly per operator application + O(N³) Cholesky per noise draw
(``c_rigid_obj.cpp:413-459,661-675``) — measured with vectorized numpy
float32 on one core of this machine (generous to the reference, whose
scalar C++ loops are slower than BLAS): 8553 s/step → 1.17e-4 steps/s.
The model has ~1.6× uncertainty (the 768-blob measured step ran 1.6×
slower than the model predicts — see BENCH_NOTES "End-to-end anchor"),
so quote the multiplier's order of magnitude, not its digits.
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

CPU_REFERENCE_STEPS_PER_SEC = 1.17e-4  # measured: see BENCH_NOTES.md
_TIMED_REPS = 3
_SEGMENTS = ("dispersed", "settled", "farfield102k")
_TIMEOUTS = {"dispersed": 1800, "settled": 1800, "farfield102k": 3000}


def _timed_invocations(runner, state, key, n_steps):
    """Warm runner: chain 3 timed invocations (state threads through) and
    return (best steps/s, all steps/s, last traj)."""
    import jax
    import jax.numpy as jnp

    rates, traj = [], None
    for _ in range(_TIMED_REPS):
        key = jax.random.split(key)[0]
        t0 = time.perf_counter()
        state, traj = runner(state, key)
        _ = float(jnp.sum(state.X))  # host sync (block_until_ready is
        # unreliable through the tunnel)
        rates.append(n_steps / (time.perf_counter() - t0))
        assert bool(jnp.isfinite(state.X).all()), "trajectory diverged"
    return max(rates), [round(v, 4) for v in rates], traj


def seg_dispersed():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    # solver settings tuned on this workload (BENCH_NOTES.md round-2 sweep,
    # scripts/tpu_bench_variants.py): the rotation-equivariant block_free PC
    # is built ONCE per trajectory (body-frame constants) and is never
    # stale, so it both costs nothing per step and converges in ~7 GMRES
    # iterations where the lagged wall-corrected block PC needed ~25.
    # Preconditioned Lanczos noise at 6 iterations is equilibrium-validated
    # (VALIDATION.md; 5.2e-4 from a converged draw at this exact workload).
    cfg = _base_cfg(params, jnp)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    n_rep = 8
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_rep, force_fn=lambda s, i: F,
        save_every=n_rep))
    state, traj = runner(state, jax.random.key(0))  # compile + warm
    _ = float(jnp.sum(state.X))
    best, rates, traj = _timed_invocations(
        runner, state, jax.random.key(1), n_rep)
    assert float(jnp.max(jnp.asarray(traj["residual"]))) < 10 * cfg.gmres_tol
    return {
        "steps_per_s": round(best, 4), "all_steps_per_s": rates,
        "n_blobs": B * params["N"],
        "config": {
            "dtype": "float32",
            "lanczos_iters": cfg.lanczos_iters,
            "lanczos_precond": cfg.lanczos_precond,
            "split_rand": cfg.split_rand,
            "drift_mode": cfg.drift_mode,
            "pc": cfg.pc_mode,
            "pc_refresh": cfg.pc_refresh,
            "gmres_tol": cfg.gmres_tol,
            "use_pallas": cfg.use_pallas,
        },
    }


def _base_cfg(params, jnp):
    from rigid_body_light_tpu import SimulationConfig

    return SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=20, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )


def seg_settled():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import forces, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    params, cfgb = load_structure("shell_N_642")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    # halo 8 beats 4 (9.2 vs 10.2 mean iters); adaptive noise is ~free at
    # restart 60 (tpu_settled_variants round-4 A/B).  gmres_tol 3e-4
    # (round 5): the step's accuracy floor is the Lanczos noise
    # truncation (measured noise_err ≈ 8.5e-4 at the adaptive cap), so a
    # 1e-4 solve polishes past what the noise can honor — 3e-4 stays
    # below the noise floor, cuts mean iters 9.2 → 8.0 (+0.4 steps/s,
    # r5_tol3e4 A/B) and is equilibrium-validated unbiased
    # (tpu_equilibrium_check @ 3e-4 RAS: z bias −0.013 ± 0.023).
    cfg = _base_cfg(params, jnp).replace(
        gmres_restart=60, pc_mode="ras", pc_halo=8.0, pc_halo_max=64,
        lanczos_max_iters=14, lanczos_err_tol=1e-3, gmres_tol=3e-4)
    state, key, _, _ = ckpt.load_checkpoint(
        "scripts/data/settled_642.npz", dtype=jnp.float32)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    n_set = 20
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_set, force_fn=force_fn,
        save_every=1))
    state, traj = runner(state, key)  # compile + warm
    _ = float(jnp.sum(state.X))
    best, rates, traj = _timed_invocations(runner, state, key, n_set)
    iters = float(np.asarray(traj["iters"]).mean())
    assert float(np.asarray(traj["residual"]).max()) < 10 * cfg.gmres_tol
    return {
        "steps_per_s": round(best, 4), "all_steps_per_s": rates,
        "mean_iters": round(iters, 1), "pc": cfg.pc_mode,
    }


def seg_farfield102k():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_2562")
    B = 40
    side = int(np.ceil(np.sqrt(B)))
    xs = np.array([[2.6 * (i % side), 2.6 * (i // side), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    # the production at-scale configuration (tpu_scale_demo.py ffstep):
    # O(N) proxy-grid far field, anisotropic (12,12,3) grid over the flat
    # slab, p=4, Pallas neighbor-tile near sweep
    cfg = _base_cfg(params, jnp).replace(
        dt=0.005, gmres_restart=30, gmres_maxiter=90,
        farfield_grid=(12, 12, 3), farfield_p=4)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    n_rep = 2
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_rep, force_fn=lambda s, i: F,
        save_every=n_rep))
    state, traj = runner(state, jax.random.key(0))  # compile + warm
    _ = float(jnp.sum(state.X))
    best, rates, traj = _timed_invocations(
        runner, state, jax.random.key(1), n_rep)
    res = float(jnp.max(jnp.asarray(traj["residual"])))
    return {
        "steps_per_s": round(best, 4), "all_steps_per_s": rates,
        "n_blobs": B * params["N"], "residual": res,
        "grid": [12, 12, 3], "p": 4,
    }


def _run_segment(name: str):
    """Run one segment in a fresh subprocess (one compile per process —
    see module docstring); returns its parsed JSON record or None."""
    for attempt in range(2):
        if attempt:
            time.sleep(60)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=_TIMEOUTS[name],
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] segment {name} timed out", file=sys.stderr)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            return json.loads(lines[-1])
        print(f"[bench] segment {name} failed (rc={proc.returncode}):\n"
              f"{proc.stderr[-2000:]}", file=sys.stderr)
    return None


def main():
    out = {}
    for i, seg in enumerate(_SEGMENTS):
        if i:
            time.sleep(35)  # tunnel teardown races a fresh client
        out[seg] = _run_segment(seg)
    d = out.get("dispersed") or {}
    s = out.get("settled") or {}
    f = out.get("farfield102k") or {}
    line = {
        "metric": "fluctuating BD steps/sec @ 10272 blobs "
                  "(16x shell_N_642, wall)",
        "value": d.get("steps_per_s"),
        "unit": "steps/s",
        "vs_baseline": (round(d["steps_per_s"] / CPU_REFERENCE_STEPS_PER_SEC,
                              1) if d.get("steps_per_s") else None),
        # vs_baseline divides by a COST MODEL of the single-core CPU
        # reference (BENCH_NOTES "End-to-end anchor"): the 768-blob
        # measured step overpredicts that model by 1.6x, so the
        # multiplier carries ~1.6x uncertainty either way
        "vs_baseline_note": "cost-model denominator, ~1.6x uncertainty "
                            "(BENCH_NOTES end-to-end anchor)",
        # the deep-settled continuation (real checkpoint, RAS PC) — the
        # steady-state number for dense near-wall suspensions
        "settled_steps_per_s": s.get("steps_per_s"),
        "settled_mean_iters": s.get("mean_iters"),
        "settled_pc": s.get("pc"),
        # the at-scale number: 102,480-blob wall BD on the O(N) far field
        "farfield_102k_steps_per_s": f.get("steps_per_s"),
        "farfield_102k_residual": f.get("residual"),
        "timing": "one compile per subprocess; best of 3 timed "
                  "invocations per segment (the axon tunnel stalls single "
                  "RPCs for minutes after multi-compile processes — "
                  "BENCH_NOTES round 5); all timings in segment_timings",
        "segment_timings": {k: (v or {}).get("all_steps_per_s")
                            for k, v in out.items()},
        "config": d.get("config"),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        rec = {"dispersed": seg_dispersed, "settled": seg_settled,
               "farfield102k": seg_farfield102k}[sys.argv[1]]()
        print(json.dumps(rec))
    else:
        main()
