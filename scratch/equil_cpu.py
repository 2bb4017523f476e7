"""CPU reproduction of the equilibrium-bias workload (VALIDATION.md item).

Same physics as scripts/tpu_equilibrium_check.py but sized for CPU: B
independent walkers (20-radii grid spacing), shell_N_12, f32 default.
Usage: python scratch/equil_cpu.py <variant> [B] [n_chunks]
variants: plain | precond | precond25 | precond_f64 | precond_nosplit
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from rigid_body_light_tpu import SimulationConfig, load_structure, forces
from rigid_body_light_tpu.dynamics import run_bd
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.state import make_state

variant = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 20

params, cfgb = load_structure("shell_N_12")
kBT, mg, k_wall, lam_wall = 0.3, 1.0, 4.0, 0.3
dtype = jnp.float64 if variant == "precond_f64" else jnp.float32
geom = kin.make_ref_geometry(cfgb, dtype=dtype)
force_fn = forces.sum_forces(
    forces.gravity(np.array([0, 0, -mg, 0, 0, 0])),
    forces.wall_repulsion(strength=k_wall, debye_length=lam_wall, radius=1.0),
)
side = int(np.ceil(np.sqrt(B)))
state = make_state(
    np.array([[20.0 * (i % side), 20.0 * (i // side), 1.6] for i in range(B)]),
    np.tile([1.0, 0, 0, 0], (B, 1)), dtype=dtype,
)
kw = dict(a=params["sep"] / 2, dt=0.01, kBT=kBT, wall=True, dtype=dtype,
          gmres_tol=1e-5, gmres_restart=25, gmres_maxiter=75)
if variant == "plain":
    cfg = SimulationConfig(lanczos_iters=30, **kw)
elif variant in ("precond", "precond_f64"):
    cfg = SimulationConfig(lanczos_iters=10, lanczos_precond=True, **kw)
elif variant == "precond25":
    cfg = SimulationConfig(lanczos_iters=25, lanczos_precond=True, **kw)
elif variant == "precond_nosplit":
    cfg = SimulationConfig(lanczos_iters=10, lanczos_precond=True,
                           split_rand=False, **kw)
else:
    raise SystemExit(f"unknown variant {variant}")

zg = np.linspace(0.75, 4.5, 2000)
Uz = mg * zg + k_wall * lam_wall * np.exp(-(zg - 1.0) / lam_wall)
p = np.exp(-Uz / kBT); p /= np.trapezoid(p, zg)
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
    zc = zs[-1]
    print(f"  chunk {c}: mean z {zc.mean():.4f}  max z {zc.max():.2f}  "
          f"maxres {np.asarray(traj['residual']).max():.2e}", flush=True)
z = np.concatenate(zs[n_chunks // 4:], axis=0)
se = z.mean(axis=0).std() / np.sqrt(B)
print(f"RESULT {variant} B={B}: mean z = {z.mean():.4f} ± {se:.4f} "
      f"(theory {z_theory:.4f}, bias {z.mean() - z_theory:+.4f}); "
      f"zmax {np.concatenate(zs).max():.2f}, wall {time.perf_counter()-t0:.0f}s")
