"""Direct accuracy of the preconditioned Lanczos noise at the bench
workload: relative L2 distance of the m-iteration draw from a
converged (m=24) draw with identical keys — the spectral-truncation
error the iteration budget actually buys.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.ops import kinematics as kin, lanczos
    from rigid_body_light_tpu.ops import saddle as sad
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    cfg = SimulationConfig(a=params["sep"] / 2, wall=True, dtype=jnp.float32)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    ops = sad.geometry_ops(geom, state)
    mob2 = sad.mobility_apply_multi_fn(cfg)
    pos = ops.flat_positions
    k1, k2 = jax.random.key(5), jax.random.key(6)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def draw(iters):
        npc = lanczos.make_noise_preconditioner(
            geom.ref_cfg, cfg.a, cfg.eta, jnp.float32)
        m1, m2 = lanczos.m_half_w_precond(
            mob2, pos, ops.rot, npc[0], npc[1], (k1, k2),
            iters=iters, multi=True)
        return m1, m2

    t0 = time.perf_counter()
    ref1, ref2 = draw(24)
    rn = float(jnp.linalg.norm(ref1))
    print(f"compile+ref {time.perf_counter()-t0:.0f} s", flush=True)
    for m in (6, 8, 10):
        a1, a2 = draw(m)
        e1 = float(jnp.linalg.norm(a1 - ref1)) / rn
        e2 = float(jnp.linalg.norm(a2 - ref2)) / float(jnp.linalg.norm(ref2))
        print(f"iters {m:2d}: rel err vs m=24 draw = {e1:.2e} / {e2:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
