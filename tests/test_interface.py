"""Public-API contract (behavioral spec: reference ``tests/test_interface.py``).

Covers construction and flag combinations, the shape/size RuntimeError
contract, config round-trips, blob kinematics against an independent
rotation reference, K/Kᵀ and their sparse exports, the preconditioner and
saddle operators, apply_M with extra free blobs, and timestep commits —
everything a reference driver touches.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import utils
from rigid_body_light_tpu import RigidBody

SHELL = utils.load_config(utils.struct_shell_12)[1]
BLOBS_PER_BODY = SHELL.shape[0]


def _random_system(n_bodies, wall_PC=False, seed=0, **solver_kw):
    """Solver + its (X, Q) over well-separated random placements."""
    X, Q = utils.create_random_positions(n_bodies, wall_PC=wall_PC, seed=seed)
    solver = utils.create_solver(
        X=X, Q=Q, rigid_config=SHELL, wall_PC=wall_PC, **solver_kw
    )
    return solver, X, Q


# ------------------------------------------------------------- construction


def test_constructor_and_flag_combinations():
    X = np.random.randn(10, 3)
    Q = np.random.randn(10, 4)
    for flags in ({}, {"wall_PC": True}, {"block_PC": True}):
        RigidBody(SHELL, X, Q, 1.0, 1.0, dt=0.01, **flags)


def test_constructor_rejects_non_3n_blob_config():
    X = np.random.randn(10, 3)
    Q = np.random.randn(10, 4)
    truncated = SHELL.flatten()[:-1]  # length not divisible by 3
    with pytest.raises(RuntimeError):
        RigidBody(truncated, X, Q, 1.0, 1.0, dt=0.01)


# ------------------------------------------------------------------- config


def test_config_roundtrip_normalizes_quaternions():
    rng = np.random.default_rng(3)
    X_in = rng.random((10, 3))
    Q_in = rng.random((10, 4))
    solver = utils.create_solver(X=X_in, Q=Q_in)
    solver.set_config(X_in, Q_in)
    X_out, Q_out = solver.get_config()
    assert np.allclose(X_out, X_in, atol=1e-6)
    # get_config returns unit quaternions — compare against independently
    # normalized inputs (scipy normalizes on construction)
    Q_unit = Rotation.from_quat(Q_in).as_quat()
    assert np.allclose(Q_out, Q_unit, atol=1e-6)


def test_set_config_rejects_mismatched_body_counts():
    rng = np.random.default_rng(4)
    X = rng.random((10, 3))
    Q = rng.random((10, 4))
    solver = utils.create_solver(X=X, Q=Q)
    for bad_X, bad_Q in ((X, Q[:9]), (X[:9], Q)):
        with pytest.raises(RuntimeError):
            solver.set_config(bad_X, bad_Q)


# --------------------------------------------------------------- kinematics


def test_blob_positions_match_independent_rotation():
    n_bodies = 5
    solver, X, Q = _random_system(n_bodies, seed=10)
    pos = solver.get_blob_positions()
    assert pos.shape == (n_bodies * BLOBS_PER_BODY, 3)
    centered = SHELL - SHELL.mean(axis=0)
    expected = np.concatenate([
        Rotation.from_quat(Q[b], scalar_first=True).apply(centered) + X[b]
        for b in range(n_bodies)
    ])
    assert np.allclose(pos, expected, atol=1e-5)  # f32 default precision


@pytest.mark.parametrize(
    ("method", "in_size", "out_rows"),
    [
        ("K_dot", lambda s: 6 * s.N_bodies, lambda s: s.total_blobs),
        ("KT_dot", lambda s: 3 * s.total_blobs, lambda s: 2 * s.N_bodies),
    ],
)
def test_kinematic_matvec_shapes_and_size_errors(method, in_size, out_rows):
    solver, _, _ = _random_system(3, seed=11)
    rng = np.random.default_rng(12)
    good = rng.standard_normal(in_size(solver))
    out = getattr(solver, method)(good)
    assert out.shape == (out_rows(solver), 3)
    assert np.linalg.norm(out) > 0.0
    with pytest.raises(RuntimeError):
        getattr(solver, method)(good[:-3])


def test_sparse_K_export_and_pseudoinverse_identity():
    solver, _, _ = _random_system(3, seed=13)
    K = solver.get_K()
    K_pinv = solver.get_Kinv()
    assert abs(K).sum() > 0.0
    assert abs(K_pinv).sum() > 0.0
    identity = (K_pinv @ K).toarray()
    assert np.allclose(identity, np.eye(6 * solver.N_bodies), atol=1e-4)


# ---------------------------------------------------------------- operators


@pytest.mark.parametrize("wall_PC", [False, True])
@pytest.mark.parametrize("block_PC", [False, True])
def test_apply_PC_all_flag_combos(block_PC, wall_PC):
    solver, _, _ = _random_system(3, wall_PC=wall_PC, seed=14, block_PC=block_PC)
    n_sys = 3 * solver.total_blobs + 6 * solver.N_bodies
    rng = np.random.default_rng(15)
    out = solver.apply_PC(rng.standard_normal(n_sys))
    assert out.shape == (n_sys,)
    assert np.linalg.norm(out) > 0.0
    with pytest.raises(RuntimeError):
        solver.apply_PC(rng.standard_normal(n_sys - 4))


def test_apply_M_contract_and_free_blobs():
    solver, _, _ = _random_system(2, seed=16)
    rng = np.random.default_rng(17)
    F = rng.standard_normal(3 * solver.total_blobs)
    pos = solver.get_blob_positions()
    # every size mismatch must raise
    for bad_F, bad_pos in ((F[:-4], pos), (F, pos[:-3]), (F[:-1], pos.ravel()[:-1])):
        with pytest.raises(RuntimeError):
            solver.apply_M(bad_F, bad_pos)
    out = solver.apply_M(F, pos)
    assert out.shape == F.shape
    assert np.linalg.norm(out) > 0.0
    # positions/forces may include blobs beyond the rigid bodies (reference
    # tests/test_interface.py:171-177): one extra free blob
    F_ext = np.concatenate([F, rng.standard_normal(3)])
    pos_ext = np.concatenate([pos, rng.uniform(11.0, 15.0, (1, 3))])
    out_ext = solver.apply_M(F_ext, pos_ext)
    assert out_ext.shape == (F.size + 3,)
    assert np.linalg.norm(out_ext) > 0.0


def test_apply_saddle_shape_and_size_error():
    solver, _, _ = _random_system(2, seed=18)
    n_sys = 3 * solver.total_blobs + 6 * solver.N_bodies
    rng = np.random.default_rng(19)
    out = solver.apply_saddle(rng.standard_normal(n_sys))
    assert out.shape == (n_sys,)
    assert np.linalg.norm(out) > 0.0
    with pytest.raises(RuntimeError):
        solver.apply_saddle(rng.standard_normal(n_sys - 2))


# ----------------------------------------------------------------- stepping


def test_evolve_moves_state_without_mutating_input():
    solver, X, Q = _random_system(3, seed=20)
    U = np.random.default_rng(21).standard_normal(6 * 3)
    U_before = U.copy()
    solver.evolve_rigid_bodies(U)
    X_new, Q_new = solver.get_config()
    assert np.linalg.norm(X_new - X) > 0.0
    assert np.linalg.norm(Q_new - Q) > 0.0
    # the reference scales the caller's U in place (c_rigid_obj.cpp:869) —
    # a defect this API does not reproduce
    assert np.array_equal(U, U_before)


def test_evolve_matches_axis_angle_update():
    dt = 0.125
    solver, X, Q = _random_system(2, seed=22)
    solver.config = solver.config.replace(dt=dt)
    U = np.random.default_rng(23).standard_normal(6 * 2)
    solver.evolve_rigid_bodies(U)
    X_new, Q_new = solver.get_config()
    V = U.reshape(-1, 6)
    assert np.allclose(X_new, X + dt * V[:, :3], atol=1e-6)
    for b in range(2):
        step_rot = Rotation.from_rotvec(dt * V[b, 3:])
        expected = (
            step_rot * Rotation.from_quat(Q[b], scalar_first=True)
        ).as_quat(scalar_first=True)
        got = Q_new[b]
        # q and −q are the same rotation
        flip = np.sign(got @ expected)
        assert np.allclose(got, flip * expected, atol=1e-5)


@pytest.mark.medium
def test_stepping_methods_drive_the_system():
    """deterministic_step / stochastic_step / run on the class surface."""
    import jax

    solver = utils.create_solver(
        X=np.array([[0.0, 0.0, 0.0]]),
        Q=np.array([[1.0, 0.0, 0.0, 0.0]]),
        rigid_config=SHELL,
        kBT=0.5,
    )
    solver.config = solver.config.replace(dt=0.05, lanczos_iters=10)
    gravity = np.zeros((1, 6))
    gravity[0, 2] = -1.0
    U = solver.deterministic_step(gravity)
    assert U.shape == (1, 6)
    assert U[0, 2] < 0  # falls under gravity
    assert solver.get_config()[0][0, 2] < 0
    U_sto = solver.stochastic_step(gravity, key=jax.random.key(3))
    assert np.isfinite(U_sto).all()
    traj = solver.run(5, jax.random.key(4))
    assert traj["X"].shape == (5, 1, 3)
    assert np.isfinite(traj["X"]).all()


def test_reference_import_alias():
    """Reference drivers do ``from Rigid import RigidBody`` — kept working."""
    from Rigid import RigidBody as alias

    assert alias is RigidBody
