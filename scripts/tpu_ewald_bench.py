"""Triply-periodic Ewald vs minimum-image: TPU cost crossover note.

Measures on the real chip, at bench-like densities in a cubic box:
  - Ewald mobility matvec (real sweep + wave matmuls) per N
  - minimum-image Pallas matvec (the approximation it replaces) per N
  - a full fluctuating BD step through the Ewald operator at 10k blobs

This is the verdict-requested crossover measurement: what exact
periodicity costs relative to the (non-SPD at high density) minimum-image
shortcut.  Run as a background job; serialize with other TPU work.
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

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import (ewald, ewald_pallas,
                                          kinematics as kin, rpy_pallas)
    from rigid_body_light_tpu.state import make_state

    a, eta = 0.243553, 1.0
    REPS = 20
    rng = np.random.default_rng(0)

    for n, L in ((10240, 14.0), (40960, 22.0)):
        r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
        F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        params = ewald.make_params((L, L, L), a, eta, tol=1e-4)

        @jax.jit
        def ew_chain(F):
            def body(_, v):
                return ewald.mobility_apply(v, r, params)
            return jax.lax.fori_loop(0, REPS, body, F)

        @jax.jit
        def ewk_chain(F):
            def body(_, v):
                return ewald_pallas.mobility_apply(v, r, params)
            return jax.lax.fori_loop(0, REPS, body, F)

        @jax.jit
        def mi_chain(F):
            def body(_, v):
                return rpy_pallas.mobility_apply(v, r, a=a, eta=eta,
                                                 wall=False, box=(L, L))
            return jax.lax.fori_loop(0, REPS, body, F)

        out = {"n_blobs": n, "box": L, "k_vectors": int(len(params.kvecs)),
               "xi": round(params.xi, 3)}
        for label, chain in (("ewald_ms", ew_chain),
                             ("ewald_pallas_ms", ewk_chain),
                             ("minimage_ms", mi_chain)):
            t0 = time.perf_counter()
            _sync(chain(F))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            _sync(chain(F))
            out[label] = round((time.perf_counter() - t0) / REPS * 1e3, 2)
            out[label + "_compile_s"] = round(comp, 0)
        out["ewald_over_minimage"] = round(out["ewald_ms"] / out["minimage_ms"], 2)
        out["pallas_speedup"] = round(out["ewald_ms"] / out["ewald_pallas_ms"], 2)
        print(json.dumps(out), flush=True)
        time.sleep(10)

    # full periodic fluctuating BD step at the headline blob count
    params_s, cfgb = load_structure("shell_N_642")
    B = 16
    L = 14.0
    xs = np.array([[3.2 * (i % 4) + 0.5, 3.2 * (i // 4) + 0.5,
                    3.0 + 2.5 * (i % 3)] for i in range(B)])
    cfg = SimulationConfig(
        a=params_s["sep"] / 2, dt=0.01, kBT=1.0, box=(L, L, L),
        dtype=jnp.float32, lanczos_iters=6, gmres_tol=1e-4,
        gmres_restart=60, gmres_maxiter=60, pc_mode="block_free",
        ewald_tol=1e-4,
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    n_steps = 20
    runner = jax.jit(functools.partial(run_bd, geom, cfg, n_steps=n_steps))
    t0 = time.perf_counter()
    s, traj = runner(state, jax.random.key(0))
    _sync(s.X)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _sync(s.X)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "workload": "16 x shell_N_642 = 10,272 blobs, triply-periodic Ewald BD",
        "steps_per_s": round(n_steps / wall, 2),
        "mean_iters": round(float(np.asarray(traj["iters"]).mean()), 1),
        "max_residual": float(np.asarray(traj["residual"]).max()),
        "mean_noise_err": float(np.asarray(traj["noise_err"]).mean()),
        "compile_s": round(comp, 0),
    }), flush=True)


if __name__ == "__main__":
    main()
