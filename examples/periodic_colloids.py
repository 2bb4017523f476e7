"""Triply-periodic colloidal suspension with polydisperse species.

Demonstrates two round-3 capabilities together:
- a fully periodic box (``SimulationConfig.box = (Lx, Ly, Lz)``) routing
  every mobility product through the exact positively-split-Ewald RPY
  operator (``ops/ewald.py`` — SPD, Hasimoto-validated), and
- a two-species mixture whose second species carries its OWN blob radius
  (``MultiGeometry.radii`` → polydisperse RPY in the coupled sweep).

A small dense suspension of large spheres and small tracers diffuses at
equilibrium; the script prints the measured long-time diffusion of each
species against the Stokes-Einstein value with the Hasimoto finite-size
correction.

Run: python examples/periodic_colloids.py   (~2 min on CPU)
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the f64 request below is real

from rigid_body_light_tpu import SimulationConfig, load_structure, multi
from rigid_body_light_tpu.state import make_state

L = 12.0
KBT = 0.5


def main():
    p_big, cfg_big = load_structure("shell_N_42")
    p_small, cfg_small = load_structure("shell_N_12")
    a = p_big["sep"] / 2
    a_small = 0.6 * a

    cfg = SimulationConfig(
        a=a, eta=1.0, dt=0.02, kBT=KBT, box=(L, L, L), dtype=jnp.float64,
        lanczos_iters=10, gmres_tol=1e-6, pc_mode="block_free",
        use_pallas=False,
    )
    mgeom = multi.MultiGeometry.create(
        [cfg_big, cfg_small * 0.5], dtype=jnp.float64, radii=[None, a_small])

    # placement must avoid overlap: an interpenetrating configuration has
    # finite-but-unphysical mobilities and the walkers fly (measured: the
    # small species' MSD came out 11x the solve prediction from exactly
    # this bug in an earlier draft)
    X_big = np.array([[3.0, 3.0, 3.0], [9.0, 9.0, 9.0]])
    X_small = np.array([[3.0, 9.0, 3.0], [9.0, 3.0, 9.0], [6.0, 6.0, 0.5]])
    states = (
        make_state(X_big, np.tile([1.0, 0, 0, 0], (2, 1)), dtype=jnp.float64),
        make_state(X_small, np.tile([1.0, 0, 0, 0], (3, 1)),
                   dtype=jnp.float64),
    )

    # predicted D from the deterministic periodic mobility solve (exact,
    # body shape + finite-size effects included) — not a sphere estimate
    forces = tuple(jnp.zeros((st.X.shape[0], 6), jnp.float64)
                   .at[:, 2].set(-1.0) for st in states)
    res = multi.solve_saddle_multi(mgeom, cfg, states, None, forces)
    D_pred = [KBT * float(-U[0, 2]) for U in res.Us]

    # excluded volume: soft Yukawa repulsion across ALL body pairs (both
    # species) — without it diffusing colloids interpenetrate and ride
    # unphysical overlapped mobilities (measured: MSD-D inflated ~8x)
    rads = jnp.asarray([1.0, 1.0, 0.55, 0.55, 0.55])

    def force_fn(ss, i):
        X = jnp.concatenate([ss[0].X, ss[1].X], axis=0)
        d = X[:, None, :] - X[None, :, :]
        d = d - jnp.asarray([L, L, L]) * jnp.round(d / jnp.asarray([L, L, L]))
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))
        sigma = rads[:, None] + rads[None, :]
        mask = 1.0 - jnp.eye(X.shape[0])
        mag = 20.0 * jnp.exp(-(r - sigma) / 0.2) / r
        f = jnp.sum((mag * mask)[:, :, None] * d, axis=1)
        z = jnp.zeros((X.shape[0], 3), jnp.float64)
        ft = jnp.concatenate([f, z], axis=1)
        return (ft[:2], ft[2:])

    n_steps = 600
    runner = jax.jit(functools.partial(
        multi.run_bd_multi, mgeom, cfg, n_steps=n_steps, force_fn=force_fn,
        save_every=2))
    _, traj = runner(states, key=jax.random.key(1))

    for s, name in enumerate(("shell_N_42 (big)",
                              "half-scale shell_N_12, small blobs")):
        X = np.asarray(traj["X"][s])
        lags = np.arange(1, 40)
        msd = np.array([((X[l:] - X[:-l]) ** 2).sum(-1).mean()
                        for l in lags])
        D = np.polyfit(lags * 2 * cfg.dt, msd, 1)[0] / 6.0
        print(f"species {s} [{name}]: D = {D:.4f}  "
              f"(kBT x solved periodic mobility = {D_pred[s]:.4f})")
    print("max residual:", float(np.asarray(traj['residual']).max()))


if __name__ == "__main__":
    main()
