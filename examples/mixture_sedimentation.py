"""Multi-species example: a large sphere sediments through passive tracers.

Demonstrates the mixture stack (``rigid_body_light_tpu.multi``): a shell_N_162
sphere driven downward past four passive shell_N_12 tracers; the tracers are
entrained by the large body's flow field (cross-species hydrodynamics through
the coupled blob-level mobility).

Run: python examples/mixture_sedimentation.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu import SimulationConfig, load_structure, multi
from rigid_body_light_tpu.state import make_state


def main():
    _, cfg12 = load_structure("shell_N_12")
    p162, cfg162 = load_structure("shell_N_162")
    dtype = jnp.float32
    mgeom = multi.MultiGeometry.create([cfg12, cfg162], dtype=dtype)

    # tracers in a ring at z=0; big sphere above
    tracers = make_state(
        np.array([[2.5, 0, 0], [-2.5, 0, 0], [0, 2.5, 0], [0, -2.5, 0]]),
        np.tile([1.0, 0, 0, 0], (4, 1)), dtype=dtype,
    )
    big = make_state(np.array([[0.0, 0.0, 4.0]]), np.array([[1.0, 0, 0, 0]]),
                     dtype=dtype)
    states = (tracers, big)

    cfg = SimulationConfig(a=p162["sep"] / 2, dt=0.1, kBT=0.0, dtype=dtype,
                           gmres_tol=1e-5, gmres_maxiter=80)
    F_tr = jnp.zeros((4, 6), dtype)
    F_big = jnp.zeros((1, 6), dtype).at[0, 2].set(-5.0)

    step = jax.jit(lambda st, k: multi.stochastic_step_multi(
        mgeom, cfg, st, k, (F_tr, F_big)))

    key = jax.random.key(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        states, res = step(states, sub)

    tr_z = np.asarray(states[0].X)[:, 2]
    big_z = float(states[1].X[0, 2])
    print(f"big sphere z: 4.0 -> {big_z:.2f}")
    print(f"tracer z (started at 0): {np.round(tr_z, 3)} — entrained downward")
    assert big_z < 4.0 and np.all(tr_z < 0), "expected entrainment"


if __name__ == "__main__":
    main()
