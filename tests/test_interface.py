"""Port of the reference's interface contract (reference
``tests/test_interface.py``): constructor/flag combos, validation errors,
config round-trip, blob positions, K/Kᵀ matvecs, PC, apply_M (incl. extra
free blobs), apply_saddle, evolve."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import utils
from rigid_body_light_tpu import RigidBody


def test_create():
    a = eta = 1.0
    _, config = utils.load_config(utils.struct_shell_12)
    N = 10
    X = np.random.randn(N, 3)
    Q = np.random.randn(N, 4)
    RigidBody(config, X, Q, a, eta, dt=0.01)
    RigidBody(config, X, Q, a, eta, dt=0.01, wall_PC=True)
    RigidBody(config, X, Q, a, eta, dt=0.01, block_PC=True)
    with pytest.raises(RuntimeError):
        RigidBody(config.flatten()[:-1], X, Q, a, eta, dt=0.01)


def test_config():
    n = 10
    X_0 = np.random.rand(n, 3)
    Q_0 = np.random.rand(n, 4)
    cb = utils.create_solver(X=X_0, Q=Q_0)
    cb.set_config(X_0, Q_0)
    Q_0 = Rotation.from_quat(Q_0).as_quat()
    X, Q = cb.get_config()
    assert np.allclose(X, X_0, atol=1e-6)
    assert np.allclose(Q, Q_0, atol=1e-6)


def test_bad_config():
    n = 10
    X_0 = np.random.rand(n, 3)
    Q_0 = np.random.rand(n, 4)
    cb = utils.create_solver(X=X_0, Q=Q_0)
    with pytest.raises(RuntimeError):
        cb.set_config(X_0, Q_0[: n - 1])
    with pytest.raises(RuntimeError):
        cb.set_config(X_0[: n - 1], Q_0)


def test_blob_positions():
    N = 5
    X, Q = utils.create_random_positions(N)
    _, config = utils.load_config(utils.struct_shell_12)
    blobs_per_body = config.shape[0]
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    N_blobs = N * blobs_per_body
    pos = cb.get_blob_positions()
    assert pos.shape == (N_blobs, 3)
    ref_pos = np.zeros((N_blobs, 3))
    cfg_c = config - config.mean(axis=0)
    for i in range(N):
        r_i = Rotation.from_quat(Q[i, :], scalar_first=True)
        pos_i = r_i.apply(cfg_c) + X[i, :]
        ref_pos[i * blobs_per_body : (i + 1) * blobs_per_body, :] = pos_i
    assert np.allclose(pos, ref_pos, atol=1e-5)


def test_K_dot():
    N_rigid = 3
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    blobs_per_body = config.shape[0]
    with pytest.raises(RuntimeError):
        cb.K_dot(np.random.randn(6 * N_rigid - 3))
    result = cb.K_dot(np.random.randn(6 * N_rigid))
    assert result.shape == (N_rigid * blobs_per_body, 3)
    assert np.linalg.norm(result) > 0.0


def test_KT_dot():
    N_rigid = 3
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    blobs_per_body = config.shape[0]
    with pytest.raises(RuntimeError):
        cb.KT_dot(np.random.randn(3 * blobs_per_body * N_rigid - 5))
    result = cb.KT_dot(np.random.randn(3 * blobs_per_body * N_rigid))
    assert result.shape == (2 * N_rigid, 3)
    assert np.linalg.norm(result) > 0.0


def test_get_K_Kinv():
    N_rigid = 3
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    K = cb.get_K()
    K_inv = cb.get_Kinv()
    assert np.sum(np.abs(K)) > 0.0
    assert np.sum(np.abs(K_inv)) > 0.0
    # K⁺·K = I_6B
    prod = (K_inv @ K).toarray()
    assert np.allclose(prod, np.eye(6 * N_rigid), atol=1e-4)


@pytest.mark.parametrize(
    ("block_PC", "wall_PC"),
    ((False, False), (True, False), (False, True), (True, True)),
)
def test_apply_PC(block_PC, wall_PC):
    N_rigid = 3
    X, Q = utils.create_random_positions(N_rigid, wall_PC=wall_PC)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(
        rigid_config=config, X=X, Q=Q, block_PC=block_PC, wall_PC=wall_PC
    )
    blobs_per_body = config.shape[0]
    size = 3 * blobs_per_body * N_rigid + 6 * N_rigid
    b = np.random.randn(size)
    PC = cb.apply_PC(b)
    assert PC.shape == (size,)
    assert np.linalg.norm(PC) > 0.0
    with pytest.raises(RuntimeError):
        cb.apply_PC(np.random.randn(size - 4))


def test_apply_M():
    N_rigid = 2
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    blobs_per_body = config.shape[0]
    F = np.random.randn(3 * blobs_per_body * N_rigid)
    pos = cb.get_blob_positions()
    with pytest.raises(RuntimeError):
        cb.apply_M(F[:-4], pos)
    with pytest.raises(RuntimeError):
        cb.apply_M(F, pos[:-3])
    with pytest.raises(RuntimeError):
        cb.apply_M(F[:-1], pos[:-1])
    result = cb.apply_M(F, pos)
    assert result.shape == (3 * blobs_per_body * N_rigid,)
    assert np.linalg.norm(result) > 0.0
    # extra free blobs beyond the rigid ones
    F = np.concatenate((F, np.random.randn(3)))
    pos = np.concatenate((pos, np.random.uniform(1.0, 5.0, (1, 3))))
    result_long = cb.apply_M(F, pos)
    assert result_long.shape == (3 * blobs_per_body * N_rigid + 3,)
    assert np.linalg.norm(result_long) > 0.0


def test_apply_saddle():
    N_rigid = 2
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    blobs_per_body = config.shape[0]
    size = 3 * blobs_per_body * N_rigid + 6 * N_rigid
    x = np.random.randn(size)
    out = cb.apply_saddle(x)
    assert out.shape == (size,)
    assert np.linalg.norm(out) > 0.0
    with pytest.raises(RuntimeError):
        cb.apply_saddle(np.random.randn(size - 2))


def test_evolve_rigid_bodies():
    N_rigid = 3
    X, Q = utils.create_random_positions(N_rigid)
    _, config = utils.load_config(utils.struct_shell_12)
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    U = np.random.randn(6 * N_rigid)
    cb.evolve_rigid_bodies(U)
    X_new, Q_new = cb.get_config()
    assert np.linalg.norm(X_new - X) > 0.0
    assert np.linalg.norm(Q_new - Q) > 0.0
    # evolve must not mutate the caller's U (the reference scales it in
    # place, c_rigid_obj.cpp:869 — a defect we do not reproduce)
    assert np.isfinite(U).all()


def test_evolve_matches_update_formula():
    N_rigid = 2
    X, Q = utils.create_random_positions(N_rigid, seed=11)
    _, config = utils.load_config(utils.struct_shell_12)
    dt = 0.125
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q)
    cb.config = cb.config.replace(dt=dt)
    U = np.random.default_rng(12).standard_normal(6 * N_rigid)
    cb.evolve_rigid_bodies(U)
    X_new, Q_new = cb.get_config()
    assert np.allclose(X_new, X + dt * U.reshape(-1, 6)[:, :3], atol=1e-6)
    for b in range(N_rigid):
        om = dt * U.reshape(-1, 6)[b, 3:]
        r_new = Rotation.from_rotvec(om) * Rotation.from_quat(Q[b], scalar_first=True)
        qref = r_new.as_quat(scalar_first=True)
        qn = Q_new[b]
        sign = np.sign(np.dot(qn, qref))
        assert np.allclose(qn, sign * qref, atol=1e-5)


def test_reference_import_alias():
    """Reference drivers do `from Rigid import RigidBody` — must work here."""
    from Rigid import RigidBody as AliasRB
    from rigid_body_light_tpu import RigidBody as OurRB

    assert AliasRB is OurRB


def test_api_stepping_methods():
    """The class-level stepping surface: deterministic, stochastic, run."""
    import jax

    _, config = utils.load_config(utils.struct_shell_12)
    X = np.array([[0.0, 0.0, 0.0]])
    Q = np.array([[1.0, 0.0, 0.0, 0.0]])
    cb = utils.create_solver(rigid_config=config, X=X, Q=Q, kBT=0.5)
    cb.config = cb.config.replace(dt=0.05, lanczos_iters=10)
    F = np.zeros((1, 6)); F[0, 2] = -1.0
    U = cb.deterministic_step(F)
    assert U.shape == (1, 6) and U[0, 2] < 0
    X1, _ = cb.get_config()
    assert X1[0, 2] < 0
    U2 = cb.stochastic_step(F, key=jax.random.key(3))
    assert np.isfinite(U2).all()
    traj = cb.run(5, jax.random.key(4))
    assert traj["X"].shape == (5, 1, 3)
    assert np.isfinite(traj["X"]).all()
