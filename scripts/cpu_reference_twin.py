"""End-to-end CPU twin of the reference's fluctuating BD step, measured.

Anchors the BENCH_NOTES per-primitive cost model with a *measured full
step* in the reference's own architecture (`c_rigid_obj.cpp` + the scipy
GMRES driver its environment.yml implies):

  - `apply_M` re-assembles the dense 3N×3N RPY matrix on every call
    (`c_rigid_obj.cpp:641-659` → `rotne_prager_tensor` `:413-459`),
  - noise = dense Cholesky of B·M·B per draw (`M_half_W`, `:661-675`),
  - RFD drift = two displaced `apply_M` calls (`M_RFD`, `:769-796`),
  - saddle solve = scipy GMRES over [[M, -K], [Kᵀ, 0]] with the cached
    block-diagonal preconditioner (`apply_PC`, `:589-616`),
  - commit = axis-angle quaternion update (`update_X_Q`, `:691-710`).

The assembly here is *vectorized numpy + BLAS* — deliberately generous to
the reference, whose scalar single-threaded C++ pair loop is slower.

Usage:
    python scripts/cpu_reference_twin.py          # 64 bodies x shell_N_12 = 768 blobs
    python scripts/cpu_reference_twin.py --small  # quick parity-only run
"""

import sys
import time

import numpy as np
from scipy.sparse.linalg import LinearOperator, gmres

sys.path.insert(0, ".")

from rigid_body_light_tpu.structures import load_structure  # noqa: E402

H_FLOOR = 0.75  # matches rpy.WALL_H_FLOOR (bodies here never get near it)


# ---------------------------------------------------------------------------
# vectorized dense RPY assembly (the twin of rotne_prager_tensor)
# ---------------------------------------------------------------------------

def rpy_matrix_vec(r, a=1.0, eta=1.0, wall=False, dtype=np.float32):
    """Dense 3N×3N RPY mobility, vectorized; same math as tests/oracle.py
    (which is the dumb loop transcription of `c_rigid_obj.cpp:413-459`)."""
    r = np.asarray(r, dtype).reshape(-1, 3)
    n = len(r)
    inv_a = dtype(1.0 / a)
    d = (r[:, None, :] - r[None, :, :]) * inv_a          # (n, n, 3)
    rr2 = np.einsum("ijk,ijk->ij", d, d)
    np.fill_diagonal(rr2, 1.0)                           # self overwritten below
    rr = np.sqrt(rr2)
    far = rr >= 2.0
    c1 = np.where(far, (1.0 + 2.0 / (3.0 * rr2)) / rr,
                  (4.0 / 3.0) * (1.0 - 0.28125 * rr))
    c2 = np.where(far, (1.0 - 2.0 / rr2) / (rr2 * rr),
                  (4.0 / 3.0) * 0.09375 / rr)
    I3 = np.eye(3, dtype=dtype)
    M = (c1[..., None, None] * I3
         + c2[..., None, None] * d[..., :, None] * d[..., None, :])
    idx = np.arange(n)
    M[idx, idx] = (4.0 / 3.0) * I3

    if wall:
        h = np.maximum(r[:, 2] * inv_a, dtype(H_FLOOR))  # floored heights
        hi = h[:, None]                                  # receiver (row)
        hj = h[None, :]                                  # source (column)
        Rim = d.copy()
        Rim[..., 2] = hi + hj
        R2 = np.einsum("ijk,ijk->ij", Rim, Rim)
        invR = 1.0 / np.sqrt(R2)
        e = Rim * invR[..., None]
        ez = e[..., 2]
        ez2 = ez * ez
        invR3 = invR ** 3
        invR5 = invR ** 5
        h_hat = hj / (hi + hj)
        hh = h_hat * (1.0 - h_hat)
        f1 = -(3.0 * (1.0 + 2.0 * hh * ez2) * invR
               + 2.0 * (1.0 - 3.0 * ez2) * invR3
               - 2.0 * (1.0 - 5.0 * ez2) * invR5) / 3.0
        f2 = -(3.0 * (1.0 - 6.0 * hh * ez2) * invR
               - 6.0 * (1.0 - 5.0 * ez2) * invR3
               + 10.0 * (1.0 - 7.0 * ez2) * invR5) / 3.0
        f3 = ez * (3.0 * h_hat * (1.0 - 6.0 * (1.0 - h_hat) * ez2) * invR
                   - 6.0 * (1.0 - 5.0 * ez2) * invR3
                   + 10.0 * (2.0 - 7.0 * ez2) * invR5) * (2.0 / 3.0)
        f4 = ez * (3.0 * h_hat * invR - 10.0 * invR5) * (2.0 / 3.0)
        f5 = -(3.0 * h_hat ** 2 * ez2 * invR + 3.0 * ez2 * invR3
               + (2.0 - 15.0 * ez2) * invR5) * (4.0 / 3.0)
        zh = np.zeros_like(e)
        zh[..., 2] = 1.0
        Mw = (f1[..., None, None] * I3
              + f2[..., None, None] * e[..., :, None] * e[..., None, :]
              + f3[..., None, None] * e[..., :, None] * zh[..., None, :]
              + f4[..., None, None] * zh[..., :, None] * e[..., None, :]
              + f5[..., None, None] * zh[..., :, None] * zh[..., None, :])
        # self term is a different (diagonal) correction
        iz = 1.0 / h
        iz3, iz5 = iz ** 3, iz ** 5
        par = -(9.0 * iz - 2.0 * iz3 + iz5) / 12.0
        perp = -(9.0 * iz - 4.0 * iz3 + iz5) / 6.0
        Mw[idx, idx] = 0.0
        Mw[idx, idx, 0, 0] = par
        Mw[idx, idx, 1, 1] = par
        Mw[idx, idx, 2, 2] = perp
        M += Mw

    M = M.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)
    return M * dtype(1.0 / (8.0 * np.pi * eta * a))


def damping(r, a=1.0):
    r = np.asarray(r).reshape(-1, 3)
    return np.repeat(np.minimum(r[:, 2] / a, 1.0), 3)


# ---------------------------------------------------------------------------
# the reference step architecture
# ---------------------------------------------------------------------------

class RefTwin:
    """Reference driver twin: state (X, Q), dense-per-call operators."""

    def __init__(self, ref_cfg, X, Q, a, eta, dt, kBT):
        self.ref_cfg = ref_cfg - ref_cfg.mean(axis=0)    # removeMean (C6)
        self.X, self.Q = X.copy(), Q.copy()
        self.a, self.eta, self.dt, self.kBT = a, eta, dt, kBT
        self.B, self.nb = len(X), len(ref_cfg)
        self.counts = {"asm": 0, "chol": 0, "mv": 0}
        self.rng = np.random.default_rng(7)

    # --- kinematics (sparse in the reference; dense-small here) ---
    def _rot(self, q):
        w, x, y, z = q / np.linalg.norm(q)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def blob_positions(self, X=None, Q=None):
        X = self.X if X is None else X
        Q = self.Q if Q is None else Q
        out = np.empty((self.B, self.nb, 3))
        for b in range(self.B):
            out[b] = self.ref_cfg @ self._rot(Q[b]).T + X[b]
        return out.reshape(-1, 3)

    def K_mats(self, X=None, Q=None):
        """Dense K (3·B·nb, 6·B) + pseudo-inverse, reference triplet layout."""
        X = self.X if X is None else X
        Q = self.Q if Q is None else Q
        r = self.blob_positions(X, Q).reshape(self.B, self.nb, 3)
        off = r - X[:, None, :]
        K = np.zeros((3 * self.B * self.nb, 6 * self.B))
        for b in range(self.B):
            for k in range(self.nb):
                row = 3 * (b * self.nb + k)
                K[row:row + 3, 6 * b:6 * b + 3] = np.eye(3)
                rx, ry, rz = off[b, k]
                K[row:row + 3, 6 * b + 3:6 * b + 6] = [
                    [0, rz, -ry], [-rz, 0, rx], [ry, -rx, 0]]
        Kinv = np.linalg.solve(K.T @ K, K.T)
        return K, Kinv

    # --- dense-per-call operators ---
    def assemble(self, r):
        self.counts["asm"] += 1
        return rpy_matrix_vec(r, self.a, self.eta, wall=True)

    def apply_M(self, F, r):
        M = self.assemble(r)
        b = damping(r, self.a)
        self.counts["mv"] += 1
        return b * (M @ (b * F.astype(M.dtype)))

    def m_half_w(self, r):
        """M^{1/2}W via dense Cholesky of B·M·B (`c_rigid_obj.cpp:661-675`);
        float32 like the reference's default build (pyproject.toml:14-15)."""
        M = self.assemble(r)
        b = damping(r, self.a).astype(M.dtype)
        BMB = b[:, None] * M * b[None, :]
        self.counts["chol"] += 1
        L = np.linalg.cholesky(BMB + 1e-5 * np.eye(len(BMB), dtype=M.dtype))
        self.counts["mv"] += 1
        return L @ self.rng.standard_normal(len(BMB)).astype(M.dtype)

    def m_rfd(self, Kinv):
        """kBT·(1/δ)[M(r₊)−M(r₋)]W drift (`M_RFD`, `:769-796`)."""
        delta = 1e-3
        W = self.rng.standard_normal(3 * self.B * self.nb)
        U = (Kinv @ W).reshape(self.B, 6)
        Xp, Qp = self.update_X_Q(U * (delta / 2))
        Xm, Qm = self.update_X_Q(-U * (delta / 2))
        rp = self.blob_positions(Xp, Qp)
        rm = self.blob_positions(Xm, Qm)
        return (self.apply_M(W, rp) - self.apply_M(W, rm)) / delta

    def update_X_Q(self, U):
        """Axis-angle quaternion step (`update_X_Q`, `:691-710`)."""
        X = self.X + U[:, :3]
        Q = np.empty_like(self.Q)
        for b in range(self.B):
            om = U[b, 3:]
            th = np.linalg.norm(om)
            if th < 1e-14:
                qr = np.array([1.0, 0, 0, 0])
            else:
                ax = om / th
                qr = np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * ax])
            w1, v1 = qr[0], qr[1:]
            w2, v2 = self.Q[b, 0], self.Q[b, 1:]
            q = np.concatenate([[w1 * w2 - v1 @ v2],
                                w1 * v2 + w2 * v1 + np.cross(v1, v2)])
            Q[b] = q / np.linalg.norm(q)
        return X, Q

    def build_pc(self, r, K):
        """Cached block-diag PC (`apply_PC` lazy build, `:589-596`)."""
        n3 = 3 * self.nb
        invM = np.zeros((3 * self.B * self.nb, 3 * self.B * self.nb))
        rB = r.reshape(self.B, self.nb, 3)
        for b in range(self.B):
            Mb = rpy_matrix_vec(rB[b], self.a, self.eta, wall=True,
                                dtype=np.float64)
            invM[b * n3:(b + 1) * n3, b * n3:(b + 1) * n3] = np.linalg.inv(Mb)
        Ninv = K.T @ invM @ K                      # block 6×6 per body
        facs = [np.linalg.inv(Ninv[6 * b:6 * b + 6, 6 * b:6 * b + 6])
                for b in range(self.B)]
        return invM, facs

    def apply_pc(self, x, invM, facs, K):
        slip, F = x[:3 * self.B * self.nb], x[3 * self.B * self.nb:]
        rhs = -F - K.T @ (invM @ slip)
        U = np.concatenate([facs[b] @ rhs[6 * b:6 * b + 6]
                            for b in range(self.B)])
        lam = invM @ (slip + K @ U)
        return np.concatenate([lam, U])

    # --- one full fluctuating step (RHS_and_Midpoint + GMRES + commit) ---
    def step(self, force):
        n_lam = 3 * self.B * self.nb
        K, Kinv = self.K_mats()
        r = self.blob_positions()

        # stochastic RHS (`RHS_and_Midpoint`, :917-976; split_rand branch)
        c1 = 2.0 * np.sqrt(self.kBT / self.dt)
        c2 = np.sqrt(self.kBT / self.dt)
        Mh1 = self.m_half_w(r)
        Mh2 = self.m_half_w(r)
        drift = self.kBT * self.m_rfd(Kinv)
        # predictor half-kick of the configuration
        U_half = (Kinv @ (c1 * Mh1)).reshape(self.B, 6) * (self.dt / 2)
        Xh, Qh = self.update_X_Q(U_half)
        r_half = self.blob_positions(Xh, Qh)
        K_h, _ = self.K_mats(Xh, Qh)
        slip = c1 * Mh1 * 0.5 + c2 * Mh2 - drift   # noise slip − RFD drift
        rhs = np.concatenate([slip, -force.ravel()])

        # saddle solve at the half-step configuration, scipy GMRES around
        # dense-per-iteration apply_M — the reference driver loop
        invM, facs = self.build_pc(r_half, K_h)

        def saddle(x):
            lam, U = x[:n_lam], x[n_lam:]
            return np.concatenate([
                self.apply_M(lam, r_half) - K_h @ U, K_h.T @ lam])

        A = LinearOperator((len(rhs), len(rhs)), matvec=saddle)
        PC = LinearOperator((len(rhs), len(rhs)),
                            matvec=lambda x: self.apply_pc(x, invM, facs, K_h))
        sol, info = gmres(A, rhs, M=PC, rtol=1e-4, restart=40, maxiter=3)
        U = sol[n_lam:].reshape(self.B, 6)

        # commit (`evolve_X_Q`, :865-878)
        self.X, self.Q = self.update_X_Q(U * self.dt)
        return U, info


# ---------------------------------------------------------------------------

def parity_check():
    """Vectorized assembly must match the loop oracle bit-for-bit in f64."""
    sys.path.insert(0, "tests")
    import oracle

    rng = np.random.default_rng(3)
    r = rng.uniform([0, 0, 1.0], [8, 8, 6], (36, 3))
    for wall in (False, True):
        Mv = rpy_matrix_vec(r, a=0.9, eta=1.1, wall=wall, dtype=np.float64)
        Mo = oracle.rpy_matrix(r, a=0.9, eta=1.1, wall=wall, h_floor=H_FLOOR)
        err = np.abs(Mv - Mo).max() / np.abs(Mo).max()
        print(f"  assembly parity vs oracle (wall={wall}): {err:.2e}")
        assert err < 1e-13, "vectorized assembly disagrees with oracle"


def main(small=False):
    print("== parity: vectorized twin assembly vs loop oracle ==")
    parity_check()

    params, ref_cfg = load_structure("shell_N_12")
    B = 8 if small else 64
    rng = np.random.default_rng(0)
    side = int(np.ceil(np.sqrt(B)))
    X = np.array([[3.0 * (i % side), 3.0 * (i // side),
                   2.0 + 0.3 * rng.uniform()] for i in range(B)])
    Q = np.tile([1.0, 0, 0, 0], (B, 1))
    a = params["sep"] / 2
    tw = RefTwin(ref_cfg, X, Q, a=a, eta=1.0, dt=0.01, kBT=1.0)
    n = B * params["N"]
    print(f"\n== end-to-end reference-twin step: {B} bodies x shell_N_12 "
          f"= {n} blobs, wall, float32 assembly ==")

    # primitive timings at this size
    r = tw.blob_positions()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        M = rpy_matrix_vec(r, a, 1.0, wall=True)
    t_asm = (time.perf_counter() - t0) / reps
    b = damping(r, a)
    BMB = (b[:, None] * M * b[None, :]).astype(np.float64)
    t0 = time.perf_counter()
    np.linalg.cholesky(BMB + 1e-10 * np.eye(len(BMB)))
    t_chol = time.perf_counter() - t0
    F = rng.standard_normal(3 * n).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(10):
        M @ F
    t_mv = (time.perf_counter() - t0) / 10
    print(f"  primitives: assembly {t_asm*1e3:.1f} ms | "
          f"chol {t_chol*1e3:.1f} ms | matvec {t_mv*1e3:.2f} ms")

    force = np.zeros((B, 6))
    force[:, 2] = -1.0

    t0 = time.perf_counter()
    U, info = tw.step(force)
    t_step = time.perf_counter() - t0
    c = tw.counts
    print(f"  full step: {t_step:.2f} s  (assemblies={c['asm']}, "
          f"cholesky={c['chol']}, matvecs={c['mv']}, gmres info={info})")
    print(f"  mean body dU_z = {U[:, 2].mean():+.4f} (sedimenting)")

    # model reconstruction from measured primitives at this size — this is
    # the anchor: does primitive-sum predict the measured end-to-end step?
    model_here = c["asm"] * t_asm + c["chol"] * t_chol + c["mv"] * t_mv
    print(f"  per-primitive model at this size: {model_here:.2f} s "
          f"(measured/model = {t_step/model_here:.2f})")
    print("  -> the cost-model composition (sum of dense assemblies + "
          "Cholesky + matvecs) accounts for the measured end-to-end step.")


def full_size_primitives():
    """Re-measure the BENCH_NOTES cost-model primitives directly at the
    headline size (10,240 blobs / 30,720 dofs), one rep each."""
    print("== cost-model primitives at 10,240 blobs (float32, 1 rep) ==")
    rng = np.random.default_rng(0)
    n = 10240
    r = rng.uniform([0, 0, 1.0], [110, 110, 40], (n, 3))
    t0 = time.perf_counter()
    M = rpy_matrix_vec(r, 1.0, 1.0, wall=True)
    t_asm = time.perf_counter() - t0
    print(f"  dense wall RPY assembly: {t_asm:.1f} s "
          f"(BENCH_NOTES model: 175.9 s)", flush=True)
    F = rng.standard_normal(3 * n).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        M @ F
    t_mv = (time.perf_counter() - t0) / 5
    print(f"  dense matvec: {t_mv:.2f} s (model: 0.45 s)", flush=True)
    M += np.float32(1e-4) * np.eye(3 * n, dtype=np.float32)
    t0 = time.perf_counter()
    np.linalg.cholesky(M)
    t_chol = time.perf_counter() - t0
    print(f"  dense Cholesky {3*n}^3/3: {t_chol:.1f} s (model: 397.0 s)",
          flush=True)
    step = 2 * (t_asm + t_chol + t_mv) + (2 * t_asm + 2 * t_mv) \
        + 40 * (t_asm + t_mv)
    print(f"  model step at 10,240 blobs from these primitives: {step:.0f} s "
          f"({1.0/step:.2e} steps/s; BENCH_NOTES: 8553 s, 1.17e-4 steps/s)")


if __name__ == "__main__":
    if "--full-size" in sys.argv:
        full_size_primitives()
    else:
        main(small="--small" in sys.argv)
