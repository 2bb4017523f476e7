"""Overlapping-cluster (Schwarz) PC design study (CPU, dense settled layer).

``pc_nearfield_study.py`` measured that HARD-TRUNCATED off-diagonal
coupling actively breaks the PC (Neumann-1 at rc=2.5a: 52 iters vs bf 13;
even the exact inverse of the truncated M̃ is 38): a sparsified mobility
is not a mobility — truncation wrecks positive-definiteness.  Two
truncation-safe coupling families measured here:

  ras_body_h{d}   restricted additive Schwarz, one cluster per BODY: the
                  cluster solves the body's blobs + every other-body blob
                  within distance d·a (a PRINCIPAL SUBMATRIX of the damped
                  wall mobility — SPD by construction); only the body's
                  own rows of the local solve are kept (RAS).
  as_body_h{d}    same clusters, plain additive Schwarz (symmetric,
                  overlap double-counted).
  taper{o}_rc{r}  Neumann-{o} with the off-body coupling smoothly tapered
                  to zero over [r/2, r]·a (cosine) instead of cut.
  bf / exact      baseline + global floor.

All variants use the CONSISTENT dense Ñ (Kᵀ M̃⁻¹ K)⁻¹ — round 3 proved
consistency is load-bearing.

Usage: python scripts/pc_schwarz_study.py [shell_N_162] [--dispersed-too]
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

    dist = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    body_of = np.repeat(np.arange(B), n)
    off_body = body_of[:, None] != body_of[None, :]

    def expand3(idx):
        return (3 * idx[:, None] + np.arange(3)[None, :]).ravel()

    def make_schwarz(halo_over_a, restricted):
        """Per-body clusters: body blobs + other-body blobs within halo."""
        sizes = []
        sols = []  # list of (cluster_dofs, own_rows_within_cluster, inv)
        for i in range(B):
            own = np.where(body_of == i)[0]
            mind = dist[own][:, :].min(axis=0)
            halo = np.where((mind < halo_over_a * a) & (body_of != i))[0]
            cl = np.concatenate([own, halo])
            sizes.append(len(cl))
            dofs = expand3(cl)
            Mi = Md[np.ix_(dofs, dofs)]
            inv = np.linalg.inv(Mi)
            own_rows = np.arange(3 * len(own))
            sols.append((dofs, own_rows, inv))
        print(f"  halo={halo_over_a}a: cluster sizes min {min(sizes)} "
              f"mean {np.mean(sizes):.0f} max {max(sizes)}", flush=True)

        def apply(v):
            out = np.zeros_like(v)
            for dofs, own_rows, inv in sols:
                y = inv @ v[dofs]
                if restricted:
                    out[dofs[own_rows]] += y[own_rows]
                else:
                    out[dofs] += y
            return out
        return apply

    def make_taper_C(rc_over_a):
        rc = rc_over_a * a
        r0 = 0.5 * rc
        w = np.clip((dist - r0) / (rc - r0), 0.0, 1.0)
        taper = 0.5 * (1.0 + np.cos(np.pi * w))  # 1 inside r0, 0 past rc
        mask = taper * off_body
        cnt = ((mask > 0).sum(axis=1))
        print(f"  taper rc={rc_over_a}a: nbr mean {cnt.mean():.1f} "
              f"max {cnt.max()}", flush=True)
        return Md * np.kron(mask, np.ones((3, 3)))

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

    w, V = np.linalg.eigh(Md)
    sq = V @ (np.sqrt(np.clip(w, 0, None))[:, None] * V.T)
    rng = np.random.default_rng(3)
    c2 = np.sqrt(cfg.kBT / cfg.dt)
    bi = c2 * (sq @ rng.standard_normal(3 * N) - sq @ rng.standard_normal(3 * N))
    Fg = np.zeros(6 * B)
    Fg[2::6] = -1.0
    b = np.concatenate([-bi, Fg])

    def make_ras_wb(halo_over_a, cap=None):
        """Production-shaped RAS: per-body Woodbury around the STATIC
        free-space body core A (the bf block — zero build cost in
        production), exact wall-damped coupling C and halo block D from
        Md, Schur solve, restricted output (own rows only).  cap: keep at
        most this many halo blobs (closest first) — the production PC
        uses a fixed-width halo."""
        sizes = []
        data = []
        for i in range(B):
            own = np.where(body_of == i)[0]
            mind = dist[own][:, :].min(axis=0)
            cand = np.where((mind < halo_over_a * a) & (body_of != i))[0]
            if cap is not None and len(cand) > cap:
                cand = cand[np.argsort(mind[cand])[:cap]]
            sizes.append(len(cand))
            own_d = expand3(own)
            halo_d = expand3(cand)
            A = D[np.ix_(own_d, own_d)]  # free-space bf block
            Ainv = Dinv[np.ix_(own_d, own_d)]
            C = Md[np.ix_(own_d, halo_d)]
            Dh = Md[np.ix_(halo_d, halo_d)]
            W = Ainv @ C
            S = Dh - C.T @ W
            Sinv = np.linalg.inv(S) if len(halo_d) else S
            data.append((own_d, halo_d, Ainv, W, Sinv))
        print(f"  ras_wb halo={halo_over_a}a cap={cap}: halo sizes min "
              f"{min(sizes)} mean {np.mean(sizes):.0f} max {max(sizes)}",
              flush=True)

        def apply(v):
            out = np.zeros_like(v)
            for own_d, halo_d, Ainv, W, Sinv in data:
                v1 = v[own_d]
                if len(halo_d):
                    t = v[halo_d] - W.T @ v1
                    y2 = Sinv @ t
                    out[own_d] = Ainv @ v1 - W @ y2
                else:
                    out[own_d] = Ainv @ v1
            return out
        return apply

    variants = {}
    variants["bf"] = lambda v: Dinv @ v
    for d in (2.0, 4.0, 8.0):
        variants[f"ras_body_h{d}"] = make_schwarz(d, restricted=True)
    variants["as_body_h4.0"] = make_schwarz(4.0, restricted=False)
    for d in (2.0, 4.0, 8.0):
        variants[f"ras_wb_h{d}"] = make_ras_wb(d)
    variants["ras_wb_h4.0_cap16"] = make_ras_wb(4.0, cap=16)
    variants["ras_wb_h8.0_cap32"] = make_ras_wb(8.0, cap=32)
    for rc in (8.0, 16.0):
        C = make_taper_C(rc)
        for order in (1, 2):
            variants[f"taper{order}_rc{rc}"] = neumann_apply(C, order)
    Minv = np.linalg.inv(Md)
    variants["exact"] = lambda v: Minv @ v

    dim = 3 * N + 6 * B
    for name, minv_apply in variants.items():
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
