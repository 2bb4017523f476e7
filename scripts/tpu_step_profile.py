"""Where does the BD step's wall time go?  Per-component timing on the TPU
at the exact bench.py configuration (16×shell_N_642 = 10,272 blobs, wall).

Each component is timed with the dispatch-free chained-jit harness (see
tpu_kernel_roofline.py): REPS invocations chained by data/key dependency
inside one jit, one host sync.  Components:

  noise    fused 2-RHS preconditioned Lanczos M^{1/2}W (10 iters)
  rfd      kBT·M_RFD drift (2 displaced matvecs + kinematics)
  gmres    preconditioned saddle solve (lagged block PC, cold start)
  pcbuild  block preconditioner build (amortized /pc_refresh in the scan)
  commit   half-kick + geometry rebuild + quaternion commit
  step     the full stochastic_step for reference

Run as a background job; ~6 compiles through the tunnel.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPS = 10


def _sync(x):
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        x = jax.random.key_data(x)
    return float(jnp.sum(x))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import stepper
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.ops import lanczos, rfd
    from rigid_body_light_tpu.ops import saddle as saddle_mod
    from rigid_body_light_tpu.ops import solvers
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_642")
    B = 16
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    restart = 20
    if "--settled" in sys.argv:
        restart = 60
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=True,
        gmres_tol=1e-4, gmres_restart=restart, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="block_free",
    )
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    if "--settled" in sys.argv:
        # profile at the REAL settled soak state (dense near-wall layer,
        # 22-24 GMRES iters) instead of the dispersed lattice
        from rigid_body_light_tpu.utils import checkpoint as ckpt

        state, _, _, _ = ckpt.load_checkpoint("/tmp/settled_642.npz",
                                              dtype=jnp.float32)
        print("profiling at settled checkpoint (restart=60)", flush=True)
    ops = saddle_mod.geometry_ops(geom, state)
    n = B * params["N"]
    force = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    mob = saddle_mod.mobility_apply_fn(cfg)
    mob2 = saddle_mod.mobility_apply_multi_fn(cfg)
    noise_pc = lanczos.make_noise_preconditioner(
        geom.ref_cfg, cfg.a, cfg.eta, jnp.float32)
    pc = saddle_mod.build_pc(ops, cfg)
    pos = ops.flat_positions

    def timeit(label, chain_fn, probe):
        t0 = time.perf_counter()
        out = chain_fn(probe)
        _sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = chain_fn(probe)
        _sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:8s}: {dt*1e3:8.2f} ms   (compile {compile_s:.0f} s)",
              flush=True)
        return dt

    # --- noise: fused 2-RHS preconditioned Lanczos ---
    @jax.jit
    def noise_chain(key):
        def body(_, k):
            k1, k2, k3 = jax.random.split(k, 3)
            m1, m2 = lanczos.m_half_w_precond(
                mob2, pos, ops.rot, noise_pc[0], noise_pc[1], (k1, k2),
                iters=cfg.lanczos_iters, multi=True)
            return jax.random.fold_in(k3, jnp.int32(jnp.sum(m1 + m2) != 0))
        return jax.lax.fori_loop(0, REPS, body, key)

    t_noise = timeit("noise", noise_chain, jax.random.key(0))

    # --- rfd drift ---
    @jax.jit
    def rfd_chain(key):
        def body(_, k):
            d = rfd.m_rfd(geom, state, ops, cfg, k, mob)
            return jax.random.fold_in(k, jnp.int32(jnp.sum(d) != 0))
        return jax.lax.fori_loop(0, REPS, body, key)

    t_rfd = timeit("rfd", rfd_chain, jax.random.key(1))

    # --- gmres saddle solve (cold start each rep, tiny RHS perturbation) ---
    slip0 = jnp.zeros((n, 3), jnp.float32)

    @jax.jit
    def gmres_chain(seed):
        def body(i, s):
            slip = slip0.at[0, 0].set(s * 1e-6)
            res = solvers.solve_saddle(ops, cfg, slip, force,
                                       mob_apply=mob, pc=pc)
            return res.residual + jnp.float32(i)
        return jax.lax.fori_loop(0, REPS, body, seed)

    t_gmres = timeit("gmres", gmres_chain, jnp.float32(0))

    # --- pc build ---
    @jax.jit
    def pc_chain(seed):
        def body(i, s):
            p = saddle_mod.build_pc(ops, cfg)
            return s + jax.tree.leaves(p)[0].ravel()[0] * 0 + jnp.float32(i)
        return jax.lax.fori_loop(0, REPS, body, seed)

    t_pc = timeit("pcbuild", pc_chain, jnp.float32(0))

    # --- commit (half-kick path: Kinv product + quaternion + geometry) ---
    @jax.jit
    def commit_chain(key):
        def body(_, st):
            u = jax.random.normal(key, (B, 6), jnp.float32) * 1e-6
            st2 = stepper._commit(geom, cfg, st, u)
            o = saddle_mod.geometry_ops(geom, st2)
            return st2._replace(X=st2.X + 0 * o.offsets[:, 0])
        return jax.lax.fori_loop(0, REPS, body, state)

    t_commit = timeit("commit", commit_chain, jax.random.key(2))

    # --- full step ---
    @jax.jit
    def step_chain(key):
        def body(_, carry):
            st, k = carry
            k1, k2 = jax.random.split(k)
            st2, aux = stepper.stochastic_step(
                geom, cfg, st, k1, force, pc=pc, noise_pc=noise_pc)
            return (st2, k2)
        return jax.lax.fori_loop(0, REPS, body, (state, key))[0].X

    t_step = timeit("step", step_chain, jax.random.key(3))

    # block_free PC: built once per trajectory, so per-step share ~ 0
    acc = t_noise + t_rfd + t_gmres + t_commit
    print(f"\nsum of parts (static PC excluded): {acc*1e3:.1f} ms "
          f"vs full step {t_step*1e3:.1f} ms "
          f"(unaccounted {max(t_step-acc,0)*1e3:.1f} ms)")
    print(f"shares: noise {t_noise/t_step:4.0%}  rfd {t_rfd/t_step:4.0%}  "
          f"gmres {t_gmres/t_step:4.0%}  commit {t_commit/t_step:4.0%}")


if __name__ == "__main__":
    main()
