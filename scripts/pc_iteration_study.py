"""PC-quality study: GMRES iterations per stochastic step, per pc_mode,
on dispersed vs settled dense near-wall suspensions.

Iteration counts are hardware-independent, so this runs on CPU (fast at
shell_N_42/162) and predicts the TPU soak behavior: the round-2 soak showed
the block_free PC degrading from 7 iters (dispersed) to 16 mean / 33 max
once the suspension settles into a dense layer at z ~ 1.4 — inter-body
near-field coupling that every body-diagonal PC misses.  The ``coupled``
PC adds a far-field grand body mobility to the U-update to close that gap.

Usage:  python scripts/pc_iteration_study.py [shell_N_42] [n_steps]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rigid_body_light_tpu import SimulationConfig, forces, load_structure  # noqa: E402
from rigid_body_light_tpu.dynamics import stochastic_step  # noqa: E402
from rigid_body_light_tpu.ops import kinematics as kin  # noqa: E402
from rigid_body_light_tpu.ops import saddle as sad  # noqa: E402
from rigid_body_light_tpu.state import make_state  # noqa: E402

MODES = ("block_free", "diag")


def make_states(shell, rng):
    """(dispersed, settled) 16-body configurations mirroring the soak."""
    B = 16
    # dispersed: the soak's initial lattice
    xs_d = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                     for i in range(B)])
    # settled: the soak's measured steady state — dense layer at z ~ 1.4
    xs_s = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 1.4] for i in range(B)])
    xs_s[:, 0:2] += 0.2 * rng.standard_normal((B, 2))
    xs_s[:, 2] += 0.08 * rng.standard_normal(B)
    qs = rng.standard_normal((B, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return xs_d, xs_s, qs


def run_mode(geom, cfg, state, force_fn, key, n_steps):
    step = jax.jit(functools.partial(stochastic_step, geom, cfg))
    pc_mode = cfg.pc_mode
    pc = (
        sad.build_pc(sad.geometry_ops(geom, state), cfg)
        if pc_mode == "block_free" else None
    )
    iters, res = [], []
    x0 = None
    s = state
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        force = force_fn(s, i)
        s, aux = step(s, sub, force, x0=x0, pc=pc)
        iters.append(int(aux.iters))
        res.append(float(aux.residual))
        x0 = (aux.lam, aux.U)
    return iters, res


def main():
    shell = sys.argv[1] if len(sys.argv) > 1 else "shell_N_42"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    params, cfgb = load_structure(shell)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    xs_d, xs_s, qs = make_states(shell, rng)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    base = dict(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True, dtype=jnp.float32,
        lanczos_iters=6, lanczos_precond=True, gmres_tol=1e-4,
        gmres_restart=20, gmres_maxiter=60, use_pallas=False,
    )
    for label, xs in (("dispersed", xs_d), ("settled", xs_s)):
        state = make_state(xs, qs, dtype=jnp.float32)
        for mode in MODES:
            cfg = SimulationConfig(**dict(base, pc_mode=mode))
            t0 = time.perf_counter()
            iters, res = run_mode(geom, cfg, state, force_fn,
                                  jax.random.key(3), n_steps)
            print(json.dumps({
                "config": label, "shell": shell, "pc": mode,
                "iters": iters, "mean_iters": round(float(np.mean(iters)), 1),
                "max_iters": int(np.max(iters)),
                "max_residual": float(np.max(res)),
                "wall_s": round(time.perf_counter() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
