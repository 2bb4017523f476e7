"""High-statistics Gibbs-Boltzmann equilibrium validation on TPU.

Wall-confined spheres under gravity + exponential repulsion at kBT — the
sharpest end-to-end test of the stochastic drift terms (VALIDATION.md).
Runs ~25 min on one chip (compile included). Usage:

    python scripts/tpu_equilibrium_check.py [midpoint_slip|em_exact] [lanczos_iters] [pc_mode]
"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from rigid_body_light_tpu import SimulationConfig, load_structure, forces
from rigid_body_light_tpu.dynamics import run_bd
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.state import make_state


def main(mode="midpoint_slip", lanczos_iters=10, pc_mode=None, box=None,
         n_chunks=20, gmres_tol=1e-5):
    params, cfgb = load_structure("shell_N_12")
    kBT, mg, k_wall, lam_wall = 0.3, 1.0, 4.0, 0.3
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -mg, 0, 0, 0])),
        forces.wall_repulsion(strength=k_wall, debye_length=lam_wall, radius=1.0),
    )
    B = 64
    if box == "box":
        # pseudo-periodic variant: walkers 5 radii apart in a (40, 40) box —
        # real minimum-image coupling (a/r ~ 0.2 to several neighbors), so
        # this tests fluctuation-dissipation consistency of the wrapped
        # mobility, the sharpest check the box feature can get
        box = (40.0, 40.0)
        spacing = 5.0
    elif isinstance(box, (tuple, list)):
        box = tuple(float(b) for b in box)
        spacing = min(box) / 8.0
    elif box is None or box in ("", "none", "None"):
        box = None
        spacing = 20.0
    else:
        raise ValueError(f"box must be None, 'box', or an (Lx, Ly) pair; got {box!r}")
    state = make_state(
        np.array([[spacing * (i % 8), spacing * (i // 8), 1.6]
                  for i in range(B)]),
        np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32,
    )
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=kBT, wall=True, dtype=jnp.float32,
        lanczos_iters=int(lanczos_iters), lanczos_precond=True, drift_mode=mode,
        gmres_tol=float(gmres_tol), gmres_restart=25, gmres_maxiter=75,
        pc_mode=pc_mode, box=box,
    )
    # domain starts at the lowest accessible body-center height (blob shell
    # radius ~0.79 for shell_N_12, below-wall moves rejected), not at z=1 —
    # the Boltzmann weight at z=1 is still ~20% of peak
    zg = np.linspace(0.75, 4.5, 2000)
    Uz = mg * zg + k_wall * lam_wall * np.exp(-(zg - 1.0) / lam_wall)
    p = np.exp(-Uz / kBT)
    p /= np.trapezoid(p, zg)
    z_theory = float(np.trapezoid(zg * p, zg))

    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=1000, force_fn=force_fn, save_every=20))
    key = jax.random.key(99)
    zs = []
    t0 = time.perf_counter()
    for c in range(n_chunks):
        key, sub = jax.random.split(key)
        state, traj = runner(state, sub)
        zs.append(np.asarray(traj["X"])[:, :, 2])
    z = np.concatenate(zs[n_chunks // 4:], axis=0)
    se = z.mean(axis=0).std() / np.sqrt(B)
    print(f"{mode} (lanczos {int(lanczos_iters)}, pc {pc_mode or 'diag'}, "
          f"box {box}, tol {cfg.gmres_tol:g}): "
          f"mean z = {z.mean():.4f} ± {se:.4f} "
          f"(theory {z_theory:.4f}, bias {z.mean() - z_theory:+.4f}); "
          f"zmax {np.concatenate(zs).max():.2f}, "
          f"wall {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 5:
        kw["gmres_tol"] = float(sys.argv[5])
    main(*(sys.argv[1:5] or ["midpoint_slip"]), **kw)
