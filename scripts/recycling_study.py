"""Krylov subspace recycling study on the REAL settled checkpoint (CPU).

The settled-state profile shows GMRES at 86% of the step with 22-24
iterations, and the dense PC study shows every affordable stationary PC is
a dead end (extra-sweep cost kills the iteration win; exact floor 2).  The
remaining lever with NO extra sweeps per iteration: deflate the persistent
slow modes of the preconditioned operator using information from previous
solves (the configuration moves little per step; the operator's bad modes
— near-contact body clusters — persist).

Measures GMRES iterations on a sequence of thermal solves at the settled
10,272-blob state for:
  base          warm start from previous solution only (shipped behavior)
  proj          + stale-projection initial guess: x0 += V y* minimizing
                ‖r0 − [V_{m+1}H̄]y‖ with (V, H̄) from the PREVIOUS solve
  deflate-k     + harmonic-Ritz recycling: k smallest harmonic Ritz vectors
                of the previous solve deflated GCRO-style (stale C_r = A U_r
                approximated by V_{m+1}H̄Z — exact as dt→0)

Sequence realism: each "step" draws a FRESH thermal RHS (the hard part —
the noise is new every step) at (a) a frozen configuration (recycling's
best case) and (b) configurations advanced by actual BD commits.

Run time: ~20-30 min on 1 CPU core (each 10k-blob matvec ~1-2 s).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from rigid_body_light_tpu import SimulationConfig, forces, load_structure  # noqa: E402
from rigid_body_light_tpu.dynamics import stepper  # noqa: E402
from rigid_body_light_tpu.ops import kinematics as kin  # noqa: E402
from rigid_body_light_tpu.ops import lanczos, rfd  # noqa: E402
from rigid_body_light_tpu.ops import saddle as sad  # noqa: E402
from rigid_body_light_tpu.utils import checkpoint as ckpt  # noqa: E402

TOL = 1e-4
MAXIT = 60


def gmres_np(matvec, b, x0, tol, maxit, Uc=None, Cc=None):
    """Plain numpy GMRES (no restart) with optional GCRO deflation.

    Uc, Cc: recycle space and its (stale) image A·Uc, both (k, n).  GCRO:
    orthonormalize C = range(Ccᵀ), correct x0 by Û Cᵀr0, keep Arnoldi
    residuals C-orthogonal (recording B = CᵀAV), and fold the C-components
    back into the solution as −Û B y.  Returns (x, iters, V, H).
    """
    n = b.shape[0]
    x = x0.copy()
    r = b - matvec(x)
    C = Uhat = None
    if Uc is not None:
        Cq, R = np.linalg.qr(Cc.T)          # Cc.T = Cq R, Cq (n, k)
        C = Cq
        Uhat = np.linalg.solve(R.T, Uc).T    # (n, k): A Uhat ≈ C
        cr = C.T @ r
        x = x + Uhat @ cr
        r = r - C @ cr
    beta = np.linalg.norm(r)
    bnorm = max(np.linalg.norm(b), 1e-30)
    if beta / bnorm < tol:
        return x, 0, None, None
    V = np.zeros((maxit + 1, n), dtype=b.dtype)
    H = np.zeros((maxit + 1, maxit), dtype=b.dtype)
    Bmat = np.zeros((0 if C is None else C.shape[1], maxit), dtype=b.dtype)
    V[0] = r / beta
    for j in range(maxit):
        w = matvec(V[j])
        if C is not None:
            bj = C.T @ w
            w = w - C @ bj
            Bmat[:, j] = bj
        h = V[: j + 1] @ w
        w = w - h @ V[: j + 1]
        h2 = V[: j + 1] @ w
        w = w - h2 @ V[: j + 1]
        H[: j + 1, j] = h + h2
        H[j + 1, j] = np.linalg.norm(w)
        V[j + 1] = w / max(H[j + 1, j], 1e-30)
        e1 = np.zeros(j + 2)
        e1[0] = beta
        y, res, *_ = np.linalg.lstsq(H[: j + 2, : j + 1], e1, rcond=None)
        rnorm = np.linalg.norm(H[: j + 2, : j + 1] @ y - e1)
        if rnorm / bnorm < tol:
            x_out = x + y @ V[: j + 1]
            if C is not None:
                x_out = x_out - Uhat @ (Bmat[:, : j + 1] @ y)
            return x_out, j + 1, V[: j + 2], H[: j + 2, : j + 1]
    y, *_ = np.linalg.lstsq(H, np.r_[beta, np.zeros(maxit)], rcond=None)
    x_out = x + y @ V[:maxit]
    if C is not None:
        x_out = x_out - Uhat @ (Bmat @ y)
    return x_out, maxit, V, H


def harmonic_ritz(V, H, k):
    """k smallest harmonic Ritz vectors from an Arnoldi factorization."""
    m = H.shape[1]
    Hm = H[:m, :]
    # harmonic Ritz: solve (Hm + h^2 Hm^{-T} e_m e_m^T) z = theta z
    f = np.linalg.solve(Hm.T, np.eye(m)[:, -1]) * H[m, m - 1] ** 2
    Hh = Hm + np.outer(f, np.eye(m)[-1])
    w, Z = np.linalg.eig(Hh)
    order = np.argsort(np.abs(w))[:k]
    Zk = np.real(Z[:, order])
    U = Zk.T @ V[:m]          # (k, n)
    C = (H @ Zk).T @ V        # (k, n) = A U (exact at build time)
    return U, C


def main():
    params, cfgb = load_structure("shell_N_642")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state, key, _, _ = ckpt.load_checkpoint("/tmp/settled_642.npz",
                                            dtype=jnp.float32)
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True, dtype=jnp.float32,
        lanczos_iters=6, gmres_tol=TOL, gmres_restart=60, gmres_maxiter=60,
        use_pallas=False, pc_mode="block_free",
    )
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=4.0, debye_length=0.3, radius=1.0),
    )
    B = state.X.shape[0]
    n = B * params["N"]
    nb = 3 * n

    mob = sad.mobility_apply_fn(cfg)
    noise_pc = lanczos.make_noise_preconditioner(geom.ref_cfg, cfg.a, cfg.eta,
                                                 jnp.float32)
    mob2 = sad.mobility_apply_multi_fn(cfg)

    @jax.jit
    def rhs_for(Xq, key):
        """Thermal RHS (preconditioned) + ops at the given state/key —
        mirrors stochastic_step's corrector solve inputs."""
        st = Xq
        ops = sad.geometry_ops(geom, st)
        k1, k2, k3 = jax.random.split(key, 3)
        m1, m2 = lanczos.m_half_w_precond(
            mob2, ops.flat_positions, ops.rot, noise_pc[0], noise_pc[1],
            (k1, k2), iters=6, multi=True)
        c1 = 2.0 * jnp.sqrt(jnp.float32(cfg.kBT / cfg.dt))
        c2 = jnp.sqrt(jnp.float32(cfg.kBT / cfg.dt))
        bi = c2 * (m1 - m2)
        drift = jnp.float32(cfg.kBT) * rfd.m_rfd(geom, st, ops, cfg, k3, mob)
        slip_eff = -(drift + bi)
        force = force_fn(st, 0)
        return slip_eff, force

    @jax.jit
    def commit(st, key, force):
        s2, aux = stepper.stochastic_step(geom, cfg, st, key, force)
        return s2

    pc_holder = {}

    def make_matvec(st):
        ops = sad.geometry_ops(geom, st)
        pc = sad.build_pc(ops, cfg)

        @jax.jit
        def mv(xf):
            lam = xf[:nb].reshape(-1, 3)
            U = xf[nb:].reshape(-1, 6)
            s, f = sad.apply_saddle(lam, U, ops, cfg, mob)
            lam2, U2 = sad.apply_pc(pc, s, f, ops, cfg)
            return jnp.concatenate([lam2.reshape(-1), U2.reshape(-1)])

        @jax.jit
        def pcb(slip, force):
            lam2, U2 = sad.apply_pc(pc, slip, force, ops, cfg)
            return jnp.concatenate([lam2.reshape(-1), U2.reshape(-1)])

        return (lambda v: np.asarray(mv(jnp.asarray(v, jnp.float32)))), pcb

    n_steps = 4
    for mode in ("frozen", "advance"):
        print(f"--- config sequence: {mode} ---", flush=True)
        variants = {"base": None, "proj": "proj", "deflate16": 16,
                    "deflate32": 32}
        for name, kind in variants.items():
            st = state
            kk = jax.random.key(11)
            x_prev = np.zeros(nb + 6 * B, np.float32)
            Vp = Hp = None
            Uc = Cc = None
            iters_seq = []
            t0 = time.time()
            for step_i in range(n_steps):
                kk, k_rhs, k_step = jax.random.split(kk, 3)
                matvec, pcb = make_matvec(st)
                slip_eff, force = rhs_for(st, k_rhs)
                b = np.asarray(pcb(slip_eff, force))
                if kind == "proj" and Vp is not None:
                    r0 = b - matvec(x_prev)
                    AV = Hp.T @ Vp[: Hp.shape[0]]       # stale A·V approx
                    y, *_ = np.linalg.lstsq(AV.T, r0, rcond=None)
                    x_prev = x_prev + y @ Vp[: Hp.shape[1]]
                if isinstance(kind, int) and Vp is not None:
                    Uc, Cc = harmonic_ritz(Vp, Hp, min(kind, Hp.shape[1] - 1))
                x, it, Vp_n, Hp_n = gmres_np(
                    matvec, b, x_prev, TOL, MAXIT,
                    Uc=Uc if isinstance(kind, int) else None,
                    Cc=Cc if isinstance(kind, int) else None)
                if Vp_n is not None:
                    Vp, Hp = Vp_n, Hp_n
                iters_seq.append(it)
                x_prev = x
                if mode == "advance":
                    st = commit(st, k_step, force)
            print(json.dumps({
                "mode": mode, "variant": name, "iters": iters_seq,
                "mean_after_first": round(float(np.mean(iters_seq[1:])), 1),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
