"""Where does the RAS PC's per-step overhead go? (settled checkpoint, TPU)

The settled A/B measured ras_h4 at 10.2 mean iters (from 22.4) but only
8.09 steps/s (from 6.96) — the iteration win implies ~95-100 ms/step, so
~25 ms/step of RAS build/apply overhead.  This times the build and its
micro-components on-chip so the optimization is aimed, not guessed.

Run as a background job; serialize with other TPU work.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.ops import saddle as sad
    from rigid_body_light_tpu.ops import solvers
    from rigid_body_light_tpu.utils import checkpoint as ckpt

    params, cfgb = load_structure("shell_N_642")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state, key, _, _ = ckpt.load_checkpoint(
        "scripts/data/settled_642.npz", dtype=jnp.float32)
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True, dtype=jnp.float32,
        lanczos_iters=6, gmres_tol=1e-4, gmres_restart=60, gmres_maxiter=60,
        matvec_row_tile=512, pc_mode="ras", pc_halo=4.0, pc_halo_max=64,
    )
    ops = sad.geometry_ops(geom, state)
    B, n, _ = ops.offsets.shape
    N = B * n
    H = cfg.pc_halo_max
    print(json.dumps({"B": B, "n": n, "H": H}), flush=True)

    def sync(x):
        return float(jnp.sum(jnp.abs(jax.tree.leaves(x)[0])))

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / reps * 1e3

    static_pc = sad.build_pc(ops, cfg)

    # full build (what every solve pays)
    build = jax.jit(lambda o: sad.build_pc_ras(o, cfg, static_pc=static_pc))
    t_build = timeit(build, ops)
    print(json.dumps({"component": "build_pc_ras_full", "ms": round(t_build, 2)}),
          flush=True)

    pc = build(ops)

    # per-application cost: RAS vs block_free, 50 chained applies
    rng = np.random.default_rng(0)
    slip = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 6)), jnp.float32)

    def chain_apply(pc_in):
        @jax.jit
        def run(s, f):
            def body(_, carry):
                s1, f1 = carry
                lam, U = sad.apply_pc(pc_in, s1, f1, ops, cfg)
                lam = lam / (1.0 + jnp.max(jnp.abs(lam)))
                return lam, U / (1.0 + jnp.max(jnp.abs(U)))
            return jax.lax.fori_loop(0, 50, body, (s, f))
        return run

    t_ras_apply = timeit(chain_apply(pc), slip, F) / 50
    t_bf_apply = timeit(chain_apply(static_pc), slip, F) / 50
    print(json.dumps({"apply_pc_ras_ms_per_apply": round(t_ras_apply, 3),
                      "apply_pc_bf_ms_per_apply": round(t_bf_apply, 3)}),
          flush=True)

    # ---- micro-components of the build, on representative shapes
    minv_ref = static_pc.minv_ref
    C = jnp.asarray(rng.standard_normal((B, 3 * n, 3 * H)), jnp.float32)
    S = jnp.asarray(rng.standard_normal((B, 3 * H, 3 * H)), jnp.float32)
    S = S @ jnp.transpose(S, (0, 2, 1)) + 10.0 * jnp.eye(3 * H)

    t_W = timeit(jax.jit(lambda c: jnp.einsum(
        "pq,bqh->bph", minv_ref, c)), C)
    print(json.dumps({"component": "W_matmul(B,3n,3n)x(B,3n,3H)",
                      "ms": round(t_W, 2)}), flush=True)

    t_Sinv = timeit(jax.jit(jnp.linalg.inv), S)
    print(json.dumps({"component": "S_inv batched (B,3H,3H)",
                      "ms": round(t_Sinv, 2)}), flush=True)

    NN = jnp.asarray(rng.standard_normal((6 * B, 6 * B)), jnp.float32)
    NN = NN @ NN.T + 50.0 * jnp.eye(6 * B)
    t_ninv = timeit(jax.jit(jnp.linalg.inv), NN)
    print(json.dumps({"component": "n_full inv (6B,6B)",
                      "ms": round(t_ninv, 2)}), flush=True)

    pos = ops.flat_positions
    X = ops.positions[:, 0, :] - ops.offsets[:, 0, :]

    @jax.jit
    def halo_select(p, x):
        body_of = jnp.repeat(jnp.arange(B), n)
        d_c = jnp.linalg.norm(p[None, :, :] - x[:, None, :], axis=-1)
        d_c = jnp.where(body_of[None, :] == jnp.arange(B)[:, None],
                        jnp.inf, d_c)
        _, cand = jax.lax.top_k(-d_c, 2 * H)
        cand_pos = p[cand.reshape(-1)].reshape(B, 2 * H, 3)
        d_exact = jnp.min(jnp.linalg.norm(
            ops.positions[:, :, None, :] - cand_pos[:, None, :, :], axis=-1),
            axis=1)
        neg_d, sel = jax.lax.top_k(-d_exact, H)
        return jnp.take_along_axis(cand, sel, axis=1), neg_d

    t_sel = timeit(halo_select, pos, X)
    print(json.dumps({"component": "halo_select (top_k etc)",
                      "ms": round(t_sel, 2)}), flush=True)

    from rigid_body_light_tpu.ops import rpy
    hp = jnp.asarray(rng.standard_normal((B, H, 3)), jnp.float32) + 5.0
    t_cross = timeit(jax.jit(lambda rp, h: rpy.cross_mobility_blocks(
        rp, h, cfg.a, cfg.eta, wall=True)), ops.positions, hp)
    print(json.dumps({"component": "cross_blocks C (B,n,H)",
                      "ms": round(t_cross, 2)}), flush=True)

    # Ñ-tier batched apply: (6B, N, 3) RAS apply
    cols = jnp.asarray(rng.standard_normal((6 * B, N, 3)), jnp.float32)
    t_ncols = timeit(jax.jit(lambda c: sad._ras_apply(
        c, minv_ref, ops.rot, pc.halo_idx, pc.halo_w, pc.halo_sinv)), cols)
    print(json.dumps({"component": "N~ batched apply (6B,N,3)",
                      "ms": round(t_ncols, 2)}), flush=True)

    # end-to-end settled solve with prebuilt vs in-solve-built PC
    slip_t = 20.0 * slip
    solve_pre = jax.jit(functools.partial(
        solvers.solve_saddle, cfg=cfg, slip=slip_t, force=F, pc=pc))
    t_solve_pre = timeit(lambda o: solve_pre(o), ops, reps=5)
    solve_full = jax.jit(functools.partial(
        solvers.solve_saddle, cfg=cfg, slip=slip_t, force=F))
    t_solve_full = timeit(lambda o: solve_full(o), ops, reps=5)
    res = solve_full(ops)
    print(json.dumps({
        "solve_prebuilt_pc_ms": round(t_solve_pre, 1),
        "solve_with_build_ms": round(t_solve_full, 1),
        "iters": int(res.iters), "residual": float(res.residual),
    }), flush=True)


if __name__ == "__main__":
    main()
