"""Dense-operator PC design study (CPU, small-but-dense settled suspension).

Builds the exact dense saddle operator for a 16-body settled near-wall
suspension and measures GMRES iterations for a family of preconditioner
designs, including an exact-inverse floor.  This locates WHERE inter-body
coupling must enter the PC:

  bf              block_free (free-space per-body M̃⁻¹, per-body Ñ) — shipped
  coupled_schur   bf λ-block + far-field grand mobility Ñ (round-3 draft)
  wall_block      exact per-body damped-wall blocks, consistent Ñ (the
                  round-2 measured negative result)
  neumann1/2      M̃⁻¹ = truncated Neumann series of the FULL damped mobility
                  around its body-block diagonal, consistent Ñ — coupling in
                  the λ-block
  neumann1_i      neumann1 λ-block with the cheap (inconsistent) block Ñ —
                  how much Ñ-consistency matters
  exact           M̃⁻¹ = M⁻¹ (dense): the achievable floor

Usage: python scripts/pc_dense_study.py [shell_N_162] [--dispersed-too]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from scipy.sparse.linalg import LinearOperator, gmres  # noqa: E402

from rigid_body_light_tpu import SimulationConfig, load_structure  # noqa: E402
from rigid_body_light_tpu.ops import kinematics as kin  # noqa: E402
from rigid_body_light_tpu.ops import rpy, saddle as sad  # noqa: E402
from rigid_body_light_tpu.state import make_state  # noqa: E402

TOL = 1e-4


def dense_setup(shell, settled=True, seed=7):
    params, cfgb = load_structure(shell)
    B = 16
    rng = np.random.default_rng(seed)
    if settled:
        xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 1.4] for i in range(B)])
        xs[:, 0:2] += 0.2 * rng.standard_normal((B, 2))
        xs[:, 2] += 0.08 * rng.standard_normal(B)
    else:
        xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                       for i in range(B)])
    qs = rng.standard_normal((B, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
                           dtype=jnp.float64, use_pallas=False)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(xs, qs, dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    return params, cfg, geom, state, ops


def main():
    shell = sys.argv[1] if len(sys.argv) > 1 else "shell_N_162"
    configs = [("settled", True)]
    if "--dispersed-too" in sys.argv:
        configs.append(("dispersed", False))

    for label, settled in configs:
        params, cfg, geom, state, ops = dense_setup(shell, settled)
        B, n, _ = np.shape(ops.offsets)
        N = B * n
        pos = np.asarray(ops.flat_positions)
        print(f"--- {label}: {B} x {shell} = {N} blobs ---", flush=True)

        t0 = time.time()
        M = np.asarray(rpy.mobility_matrix(pos, cfg.a, cfg.eta, wall=True,
                                           h_floor=cfg.wall_h_floor))
        bdamp = np.repeat(np.asarray(rpy.damping_factors(pos, cfg.a)), 3)
        Md = bdamp[:, None] * M * bdamp[None, :]  # the operator's B·M·B
        print(f"dense M built {time.time()-t0:.0f}s", flush=True)

        # dense K (3N, 6B), block structure
        Kb = np.asarray(sad.body_K_blocks(ops.offsets))  # (B, n, 3, 6)
        K = np.zeros((3 * N, 6 * B))
        for i in range(B):
            K[3 * n * i:3 * n * (i + 1), 6 * i:6 * (i + 1)] = (
                Kb[i].reshape(3 * n, 6))

        # per-body blocks of Md and their inverses
        blocks = [Md[3 * n * i:3 * n * (i + 1), 3 * n * i:3 * n * (i + 1)]
                  for i in range(B)]
        Binv_blocks = [np.linalg.inv(b) for b in blocks]
        Bd = np.zeros_like(Md)
        for i in range(B):
            Bd[3 * n * i:3 * n * (i + 1), 3 * n * i:3 * n * (i + 1)] = blocks[i]
        C = Md - Bd

        def blockdiag_apply(blks, v):
            out = np.empty_like(v)
            for i in range(B):
                out[3 * n * i:3 * n * (i + 1)] = blks[i] @ v[3 * n * i:3 * n * (i + 1)]
            return out

        # block_free factors (free-space, rotation-equivariant)
        rot = np.asarray(ops.rot)
        ref = np.einsum("ji,kj->ki", rot[0], np.asarray(ops.offsets)[0])
        m_ref = np.asarray(rpy.mobility_matrix(jnp.asarray(ref), cfg.a, cfg.eta,
                                               wall=False))
        minv_ref = np.linalg.inv(m_ref)
        R3 = [np.kron(np.eye(n), rot[i]) for i in range(B)]
        bf_blocks = [R3[i] @ minv_ref @ R3[i].T for i in range(B)]

        def consistent_N(minv_apply):
            KtMK = np.column_stack([
                K.T @ minv_apply(K[:, j]) for j in range(6 * B)])
            return np.linalg.inv(KtMK)

        def make_pc(minv_apply, Nmat):
            def pc(x):
                slip, F = x[:3 * N], x[3 * N:]
                ims = minv_apply(slip)
                rhs = -F - K.T @ ims
                U = Nmat @ rhs
                lam = minv_apply(slip + K @ U)
                return np.concatenate([lam, U])
            return pc

        def A_apply(x):
            lam, U = x[:3 * N], x[3 * N:]
            return np.concatenate([Md @ lam - K @ U, K.T @ lam])

        # thermal-like RHS: bi = c2 (M^1/2 W1 - M^1/2 W2), gravity F
        w, V = np.linalg.eigh(Md)
        print(f"eig range [{w.min():.3e}, {w.max():.3e}]", flush=True)
        sq = V @ (np.sqrt(np.clip(w, 0, None))[:, None] * V.T)
        rng = np.random.default_rng(3)
        c2 = np.sqrt(cfg.kBT / cfg.dt)
        bi = c2 * (sq @ rng.standard_normal(3 * N)
                   - sq @ rng.standard_normal(3 * N))
        Fg = np.zeros(6 * B)
        Fg[2::6] = -1.0
        b = np.concatenate([-bi, Fg])

        # PC variants
        variants = {}
        variants["bf"] = make_pc(
            lambda v: blockdiag_apply(bf_blocks, v),
            _block_n(bf_blocks, K, B, n))
        kb_ref = np.asarray(sad.body_K_blocks(
            jnp.asarray(ref)[None])[0]).reshape(3 * n, 6)
        n_ref = np.linalg.inv(kb_ref.T @ minv_ref @ kb_ref)
        n_grand = np.asarray(sad.grand_body_mobility(
            ops, cfg, jnp.asarray(n_ref), include_rot=True))
        variants["coupled_schur"] = make_pc(
            lambda v: blockdiag_apply(bf_blocks, v), n_grand)
        variants["wall_block"] = make_pc(
            lambda v: blockdiag_apply(Binv_blocks, v),
            _block_n(Binv_blocks, K, B, n))

        def neumann(v, order):
            y = blockdiag_apply(Binv_blocks, v)
            out = y.copy()
            for _ in range(order):
                y = -blockdiag_apply(Binv_blocks, C @ y)
                out = out + y
            return out

        t0 = time.time()
        N_n1 = consistent_N(lambda v: neumann(v, 1))
        print(f"consistent N (neumann1) {time.time()-t0:.0f}s", flush=True)
        variants["neumann1"] = make_pc(lambda v: neumann(v, 1), N_n1)
        variants["neumann1_i"] = make_pc(
            lambda v: neumann(v, 1), _block_n(Binv_blocks, K, B, n))
        N_n2 = consistent_N(lambda v: neumann(v, 2))
        variants["neumann2"] = make_pc(lambda v: neumann(v, 2), N_n2)

        t0 = time.time()
        Minv = np.linalg.inv(Md)
        print(f"exact inverse {time.time()-t0:.0f}s", flush=True)
        variants["exact"] = make_pc(
            lambda v: Minv @ v, np.linalg.inv(K.T @ Minv @ K))

        dim = 3 * N + 6 * B
        for name, pc in variants.items():
            Pb = pc(b)
            nb = np.linalg.norm(Pb)
            count = [0]

            def cb(rk):
                count[0] += 1

            PA = LinearOperator((dim, dim), matvec=lambda x: pc(A_apply(x)))
            t0 = time.time()
            x, info = gmres(PA, Pb, rtol=TOL, restart=200, maxiter=2,
                            callback=cb, callback_type="pr_norm")
            r_true = np.linalg.norm(pc(A_apply(x)) - Pb) / nb
            print(json.dumps({
                "config": label, "pc": name, "iters": count[0],
                "residual": float(r_true), "info": int(info),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


def _block_n(minv_blocks, K, B, n):
    """Consistent block-diagonal Ñ for a block-diagonal M̃⁻¹."""
    Nm = np.zeros((6 * B, 6 * B))
    for i in range(B):
        Ki = K[3 * n * i:3 * n * (i + 1), 6 * i:6 * (i + 1)]
        Nm[6 * i:6 * (i + 1), 6 * i:6 * (i + 1)] = np.linalg.inv(
            Ki.T @ minv_blocks[i] @ Ki)
    return Nm


if __name__ == "__main__":
    main()
