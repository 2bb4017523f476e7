"""Kinematic operator parity: rotations vs scipy, K/Kᵀ vs dense oracle K."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

import oracle
import utils
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import quaternion as quat


def _random_bodies(B=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((B, 3)) * 3
    Q = rng.standard_normal((B, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    return X, Q


def test_rotation_matrix_vs_scipy():
    _, Q = _random_bodies(16, 1)
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(Q, jnp.float64)))
    Rref = Rotation.from_quat(Q, scalar_first=True).as_matrix()
    assert np.abs(R - Rref).max() < 1e-14


def test_rotvec_exponential_vs_scipy():
    rng = np.random.default_rng(2)
    om = rng.standard_normal((20, 3)) * 2
    om[0] = 0.0
    om[1] = 1e-9
    q = np.asarray(quat.from_rotation_vector(jnp.asarray(om, jnp.float64)))
    qref = Rotation.from_rotvec(om).as_quat(scalar_first=True)
    # sign convention: both represent the same rotation
    sign = np.sign(np.sum(q * qref, axis=1, keepdims=True))
    assert np.abs(q - sign * qref).max() < 1e-12


def test_blob_positions_vs_scipy():
    _, cfg = utils.load_config(utils.struct_shell_12)
    geom = kin.make_ref_geometry(cfg, dtype=jnp.float64)
    X, Q = _random_bodies(5, 3)
    pos = np.asarray(kin.blob_positions(geom, jnp.asarray(X), jnp.asarray(Q)))
    cfg_c = cfg - cfg.mean(axis=0)
    for i in range(5):
        ref = Rotation.from_quat(Q[i], scalar_first=True).apply(cfg_c) + X[i]
        assert np.allclose(pos[i], ref, atol=1e-13)


def test_K_and_KT_vs_dense_oracle():
    _, cfg = utils.load_config(utils.struct_shell_12)
    geom = kin.make_ref_geometry(cfg, dtype=jnp.float64)
    X, Q = _random_bodies(3, 4)
    off = kin.blob_offsets(geom, jnp.asarray(Q))
    Kd = oracle.dense_K(np.asarray(off))
    rng = np.random.default_rng(5)
    U = rng.standard_normal((3, 6))
    lam = rng.standard_normal((3, 12, 3))
    KU = np.asarray(kin.K_dot(jnp.asarray(U), off)).ravel()
    assert np.allclose(KU, Kd @ U.ravel(), atol=1e-13)
    KTl = np.asarray(kin.KT_dot(jnp.asarray(lam), off)).ravel()
    assert np.allclose(KTl, Kd.T @ lam.ravel(), atol=1e-13)


def test_ktk_inv_closed_form():
    _, cfg = utils.load_config(utils.struct_shell_12)
    geom = kin.make_ref_geometry(cfg, dtype=jnp.float64)
    X, Q = _random_bodies(3, 6)
    off = kin.blob_offsets(geom, jnp.asarray(Q))
    Kd = oracle.dense_K(np.asarray(off))
    ktki = np.asarray(kin.ktk_inv(geom, jnp.asarray(Q)))
    dense = np.linalg.inv(Kd.T @ Kd)
    for b in range(3):
        assert np.allclose(ktki[b], dense[6 * b : 6 * b + 6, 6 * b : 6 * b + 6], atol=1e-10)


def test_kinv_pseudoinverse():
    _, cfg = utils.load_config(utils.struct_shell_12)
    geom = kin.make_ref_geometry(cfg, dtype=jnp.float64)
    X, Q = _random_bodies(2, 7)
    off = kin.blob_offsets(geom, jnp.asarray(Q))
    ktki = kin.ktk_inv(geom, jnp.asarray(Q))
    rng = np.random.default_rng(8)
    U = jnp.asarray(rng.standard_normal((2, 6)))
    # K⁺ K = I on body space
    U_rec = kin.Kinv_dot(kin.K_dot(U, off), off, ktki)
    assert np.allclose(np.asarray(U_rec), np.asarray(U), atol=1e-12)
    # K⁺ᵀ is the adjoint of K⁺: <K⁺V, W> == <V, K⁺ᵀW>
    V = jnp.asarray(rng.standard_normal((2, 12, 3)))
    W = jnp.asarray(rng.standard_normal((2, 6)))
    lhs = np.sum(np.asarray(kin.Kinv_dot(V, off, ktki)) * np.asarray(W))
    rhs = np.sum(np.asarray(V) * np.asarray(kin.KinvT_dot(W, off, ktki)))
    assert abs(lhs - rhs) < 1e-11


def test_update_X_Q_vs_scipy():
    X, Q = _random_bodies(4, 9)
    rng = np.random.default_rng(10)
    dU = rng.standard_normal((4, 6)) * 0.3
    Xn, Qn = kin.update_X_Q(jnp.asarray(X), jnp.asarray(Q), jnp.asarray(dU))
    assert np.allclose(np.asarray(Xn), X + dU[:, :3], atol=1e-13)
    for b in range(4):
        r_new = Rotation.from_rotvec(dU[b, 3:]) * Rotation.from_quat(Q[b], scalar_first=True)
        qref = r_new.as_quat(scalar_first=True)
        qn = np.asarray(Qn[b])
        sign = np.sign(np.dot(qn, qref))
        assert np.allclose(qn, sign * qref, atol=1e-12)
