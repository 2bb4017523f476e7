"""Near-field coupling PC design study (CPU, dense settled suspension).

Round-3's ``pc_dense_study.py`` proved (a) Ñ/M̃ consistency is load-bearing
and (b) FULL-coupling Neumann-2 reaches 9 iters settled but costs 2 extra
all-pairs sweeps per PC application — a net loss.  The round-4 question:
does coupling restricted to NEAR pairs (cutoff rc) keep the iteration win?
If yes, the production PC can prebuild the (N, nbr, 3, 3) neighbor blocks
once per solve and apply them for ~nothing (O(N·nbr) einsum vs the O(N²)
sweep), making the Neumann orders nearly free per iteration.

Variants measured (settled 16-body layer, thermal-scale RHS, f64):
  bf             shipped block_free (no coupling) — baseline
  nf{o}_rc{r}    M̃⁻¹ = Neumann-{o} around the bf block diagonal with
                 C = off-body-block entries of the damped wall mobility
                 masked to pair distance < r·a; consistent dense Ñ
  nf_exact_rc{r} M̃⁻¹ = exact dense inverse of (D_bf + C_near) — the floor
                 of the near-coupling family at that cutoff
  exact          M̃⁻¹ = M⁻¹: the global floor

Usage: python scripts/pc_nearfield_study.py [shell_N_162] [--dispersed-too]
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

from rigid_body_light_tpu.ops import rpy, saddle as sad  # noqa: E402

from pc_dense_study import dense_setup  # noqa: E402

TOL = 1e-4


def run_config(label, shell, settled):
    params, cfg, geom, state, ops = dense_setup(shell, settled)
    B, n, _ = np.shape(ops.offsets)
    N = B * n
    pos = np.asarray(ops.flat_positions)
    a = cfg.a
    print(f"--- {label}: {B} x {shell} = {N} blobs, a={a:.4f} ---", flush=True)

    M = np.asarray(rpy.mobility_matrix(pos, a, cfg.eta, wall=True,
                                       h_floor=cfg.wall_h_floor))
    bdamp = np.repeat(np.asarray(rpy.damping_factors(pos, a)), 3)
    Md = bdamp[:, None] * M * bdamp[None, :]

    Kb = np.asarray(sad.body_K_blocks(ops.offsets))
    K = np.zeros((3 * N, 6 * B))
    for i in range(B):
        K[3 * n * i:3 * n * (i + 1), 6 * i:6 * (i + 1)] = Kb[i].reshape(3 * n, 6)

    # block_free D (free-space rotation-equivariant per-body blocks)
    rot = np.asarray(ops.rot)
    ref = np.einsum("ji,kj->ki", rot[0], np.asarray(ops.offsets)[0])
    m_ref = np.asarray(rpy.mobility_matrix(jnp.asarray(ref), a, cfg.eta,
                                           wall=False))
    minv_ref = np.linalg.inv(m_ref)
    D = np.zeros_like(Md)
    Dinv = np.zeros_like(Md)
    for i in range(B):
        R3 = np.kron(np.eye(n), rot[i])
        sl = slice(3 * n * i, 3 * n * (i + 1))
        Dinv[sl, sl] = R3 @ minv_ref @ R3.T
        D[sl, sl] = R3 @ m_ref @ R3.T

    # pair distances + same-body mask
    dist = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    body_of = np.repeat(np.arange(B), n)
    off_body = body_of[:, None] != body_of[None, :]
    off3 = np.kron(off_body, np.ones((3, 3), bool))

    def near_C(rc_over_a):
        mask = (dist < rc_over_a * a) & off_body
        cnt = mask.sum(axis=1)
        print(f"  rc={rc_over_a}a: inter-body nbr mean {cnt.mean():.1f} "
              f"max {cnt.max()}", flush=True)
        return Md * np.kron(mask, np.ones((3, 3))) * off3

    def neumann_apply(C, order):
        def f(v):
            y = Dinv @ v
            out = y.copy()
            for _ in range(order):
                y = -(Dinv @ (C @ y))
                out = out + y
            return out
        return f

    def consistent_N(minv_apply):
        KtMK = np.column_stack([K.T @ minv_apply(K[:, j])
                                for j in range(6 * B)])
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

    # thermal-like RHS
    w, V = np.linalg.eigh(Md)
    sq = V @ (np.sqrt(np.clip(w, 0, None))[:, None] * V.T)
    rng = np.random.default_rng(3)
    c2 = np.sqrt(cfg.kBT / cfg.dt)
    bi = c2 * (sq @ rng.standard_normal(3 * N) - sq @ rng.standard_normal(3 * N))
    Fg = np.zeros(6 * B)
    Fg[2::6] = -1.0
    b = np.concatenate([-bi, Fg])

    variants = {}
    variants["bf"] = (lambda v: Dinv @ v,)
    for rc in (2.5, 4.0, 6.0):
        C = near_C(rc)
        for order in (1, 2, 3):
            variants[f"nf{order}_rc{rc}"] = (neumann_apply(C, order),)
        Mne = np.linalg.inv(D + C)
        variants[f"nf_exact_rc{rc}"] = (lambda v, Mne=Mne: Mne @ v,)
    Minv = np.linalg.inv(Md)
    variants["exact"] = (lambda v: Minv @ v,)

    dim = 3 * N + 6 * B
    for name, (minv_apply,) in variants.items():
        t0 = time.time()
        Nmat = consistent_N(minv_apply)
        pc = make_pc(minv_apply, Nmat)
        Pb = pc(b)
        nb = np.linalg.norm(Pb)
        count = [0]

        def cb(rk):
            count[0] += 1

        PA = LinearOperator((dim, dim), matvec=lambda x: pc(A_apply(x)))
        x, info = gmres(PA, Pb, rtol=TOL, restart=200, maxiter=2,
                        callback=cb, callback_type="pr_norm")
        r_true = np.linalg.norm(pc(A_apply(x)) - Pb) / nb
        print(json.dumps({
            "config": label, "pc": name, "iters": count[0],
            "residual": float(r_true), "info": int(info),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


def main():
    shell = sys.argv[1] if len(sys.argv) > 1 else "shell_N_162"
    run_config("settled", shell, True)
    if "--dispersed-too" in sys.argv:
        run_config("dispersed", shell, False)


if __name__ == "__main__":
    main()
