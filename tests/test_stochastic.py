"""Stochastic layer: Lanczos square root vs dense sqrtm, the covariance
identity, and RFD drift vs an explicit dense finite difference."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

import oracle
import utils
from rigid_body_light_tpu import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.ops import rfd
from rigid_body_light_tpu.ops import rpy
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.state import make_state


def _dense_m(wall=False, n_bodies=2, seed=0):
    X, Q = utils.create_random_positions(n_bodies, wall_PC=wall, seed=seed)
    _, cfgb = utils.load_config(utils.struct_shell_12)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(X, Q, dtype=jnp.float64)
    pos = np.asarray(kin.blob_positions(geom, state.X, state.Q)).reshape(-1, 3)
    M = oracle.rpy_matrix(pos, 1.0, 1.0, wall)
    if wall:
        b = oracle.damping(pos)
        M = np.diag(b) @ M @ np.diag(b)
    return M, pos, geom, state


@pytest.mark.medium
def test_lanczos_sqrt_vs_scipy_sqrtm():
    M, pos, _, _ = _dense_m(wall=True)
    sqrtM = scipy.linalg.sqrtm(M).real
    rng = np.random.default_rng(1)
    w = rng.standard_normal(M.shape[0])

    def mv(v):
        return jnp.asarray(M) @ v

    # full iteration count → essentially exact.  Note: at the reference's
    # test parameters (a=1, overlapping blobs) the damped wall mobility is
    # slightly indefinite; scipy's principal sqrtm().real and our negative-
    # eigenvalue clamp agree on projecting the negative mode out (the
    # reference's dense LLT would silently produce garbage there).
    y_full = np.asarray(lanczos.sqrt_matvec(mv, jnp.asarray(w), iters=M.shape[0]))
    assert np.allclose(y_full, sqrtM @ w, atol=1e-8)
    # modest iteration count → small relative error (Krylov convergence)
    y_50 = np.asarray(lanczos.sqrt_matvec(mv, jnp.asarray(w), iters=50))
    rel = np.linalg.norm(y_50 - sqrtM @ w) / np.linalg.norm(sqrtM @ w)
    assert rel < 1e-9


def test_lanczos_energy_identity():
    """‖M^{1/2}w‖² = wᵀMw holds exactly for the Lanczos approximation's
    target; check it to high accuracy at convergence."""
    M, _, _, _ = _dense_m(wall=False, seed=3)
    rng = np.random.default_rng(2)
    w = rng.standard_normal(M.shape[0])

    def mv(v):
        return jnp.asarray(M) @ v

    y = np.asarray(lanczos.sqrt_matvec(mv, jnp.asarray(w), iters=40))
    assert abs(y @ y - w @ M @ w) / abs(w @ M @ w) < 1e-6


def test_m_half_w_matches_operator():
    """m_half_w with the real mobility operator: verify against dense sqrtm
    applied to the same Gaussian draw."""
    M, pos, _, _ = _dense_m(wall=True, seed=4)
    cfg = SimulationConfig(a=1.0, eta=1.0, wall=True, dtype=jnp.float64)
    mob = sad.mobility_apply_fn(cfg)
    key = jax.random.key(7)
    out = np.asarray(lanczos.m_half_w(mob, jnp.asarray(pos), key, iters=M.shape[0])).ravel()
    w = np.asarray(jax.random.normal(key, (M.shape[0],), dtype=jnp.float64))
    sqrtM = scipy.linalg.sqrtm(M).real
    assert np.allclose(out, sqrtM @ w, atol=1e-7)


def test_m_rfd_vs_dense_finite_difference():
    """m_rfd must equal the explicit dense (M(q⁺) − M(q⁻))W/δ with the same
    key-derived W and the same displaced configurations."""
    _, pos, geom, state = _dense_m(wall=False, seed=5)
    cfg = SimulationConfig(a=1.0, eta=1.0, dtype=jnp.float64, rfd_delta=1e-4)
    ops = sad.geometry_ops(geom, state)
    key = jax.random.key(11)
    out = np.asarray(rfd.m_rfd(geom, state, ops, cfg, key))

    B, n, _ = ops.offsets.shape
    w = np.asarray(jax.random.normal(key, (B, n, 3), dtype=jnp.float64))
    u = np.asarray(kin.Kinv_dot(jnp.asarray(w), ops.offsets, ops.ktkinv))
    delta = cfg.rfd_delta
    Xp, Qp = kin.update_X_Q(state.X, state.Q, jnp.asarray(delta / 2 * u))
    Xm, Qm = kin.update_X_Q(state.X, state.Q, jnp.asarray(-delta / 2 * u))
    rp = np.asarray(kin.blob_positions(geom, Xp, Qp)).reshape(-1, 3)
    rm = np.asarray(kin.blob_positions(geom, Xm, Qm)).reshape(-1, 3)
    Mp = oracle.rpy_matrix(rp, 1.0, 1.0, False)
    Mm = oracle.rpy_matrix(rm, 1.0, 1.0, False)
    ref = ((Mp - Mm) @ w.ravel() / delta).reshape(-1, 3)
    assert np.allclose(out, ref, atol=1e-8)


@pytest.mark.medium
def test_m_half_w_covariance_statistical():
    """⟨(M^{1/2}W)(M^{1/2}W)ᵀ⟩ → M (reference Test_Mhalf, c_rigid_obj.cpp:895)
    — trace-level statistical check with a modest sample count."""
    M, pos, _, _ = _dense_m(wall=False, seed=6)
    cfg = SimulationConfig(a=1.0, eta=1.0, dtype=jnp.float64)
    mob = sad.mobility_apply_fn(cfg)
    n_samp = 400
    keys = jax.random.split(jax.random.key(3), n_samp)

    def one(k):
        y = lanczos.m_half_w(mob, jnp.asarray(pos), k, iters=30).ravel()
        return y @ y

    traces = np.asarray(jax.vmap(one)(keys))
    # E[yᵀy] = tr(M); sample mean within 5 standard errors
    est = traces.mean()
    se = traces.std() / np.sqrt(n_samp)
    assert abs(est - np.trace(M)) < 5 * se + 1e-9


@pytest.mark.medium
def test_preconditioned_noise_exact_factor():
    """Preconditioned sampling M^{1/2}W = C^{1/2}·G^{1/2}·W must (a) use a
    valid factor (X·Xᵀ = M) and (b) reproduce the dense truth at full
    iteration count; the fused 2-RHS path must equal two singles."""
    import scipy.linalg as sla
    from rigid_body_light_tpu import SimulationConfig, load_structure

    params, cfgb = load_structure("shell_N_12")
    a = params["sep"] / 2
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    X, Q = utils.create_random_positions(3, wall_PC=True, seed=5)
    state = make_state(X, Q, dtype=jnp.float64)
    cfg = SimulationConfig(a=a, eta=1.3, wall=True, dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    pos = ops.flat_positions
    mob = sad.mobility_apply_fn(cfg)
    L, L_inv = lanczos.make_noise_preconditioner(geom.ref_cfg, a, 1.3, jnp.float64)

    M = oracle.rpy_matrix(np.asarray(pos), a, 1.3, True)
    b = oracle.damping(np.asarray(pos), a)
    M = np.diag(b) @ M @ np.diag(b)
    R = np.asarray(ops.rot)
    C12 = sla.block_diag(*[np.kron(np.eye(12), R[i]) @ np.asarray(L) for i in range(3)])
    G = np.linalg.solve(C12, np.linalg.solve(C12, M.T).T)
    Xf = C12 @ sla.sqrtm(G).real
    assert np.abs(Xf @ Xf.T - M).max() < 1e-12  # valid factor of M

    key = jax.random.key(42)
    w = np.asarray(jax.random.normal(key, (108,), dtype=jnp.float64))
    truth = C12 @ (sla.sqrtm(G).real @ w)
    y = np.asarray(lanczos.m_half_w_precond(mob, pos, ops.rot, L, L_inv, key, iters=108)).ravel()
    assert np.abs(y - truth).max() < 1e-10

    mob2 = sad.mobility_apply_multi_fn(cfg)
    k1, k2 = jax.random.key(1), jax.random.key(2)
    p1, p2 = lanczos.m_half_w_precond(mob2, pos, ops.rot, L, L_inv, (k1, k2), iters=20, multi=True)
    s1 = lanczos.m_half_w_precond(mob, pos, ops.rot, L, L_inv, k1, iters=20)
    s2 = lanczos.m_half_w_precond(mob, pos, ops.rot, L, L_inv, k2, iters=20)
    assert float(jnp.abs(p1 - s1).max()) < 1e-12
    assert float(jnp.abs(p2 - s2).max()) < 1e-12
