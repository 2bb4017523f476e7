"""Parity of the RPY mobility (dense + matrix-free) against the numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from rigid_body_light_tpu.ops import rpy


@pytest.fixture
def cloud():
    rng = np.random.default_rng(42)
    # mix of near-field (r<2a) and far-field pairs, all above the wall
    r = rng.uniform([-4, -4, 0.6], [4, 4, 7], (25, 3))
    F = rng.standard_normal((25, 3))
    return r, F


@pytest.mark.parametrize("wall", [False, True])
def test_dense_matrix_parity(cloud, wall):
    r, _ = cloud
    a, eta = 0.9, 1.3
    Mref = oracle.rpy_matrix(r, a, eta, wall)
    M = np.asarray(rpy.mobility_matrix(jnp.asarray(r, jnp.float64), a, eta, wall))
    assert np.abs(M - Mref).max() < 1e-13
    # SPD at these separations
    ev = np.linalg.eigvalsh(M)
    assert ev.min() > 0


@pytest.mark.parametrize("wall", [False, True])
@pytest.mark.parametrize("row_tile", [7, 512])
def test_matvec_parity(cloud, wall, row_tile):
    r, F = cloud
    a, eta = 0.9, 1.3
    Uref = oracle.apply_M(F, r, a, eta, wall)
    U = np.asarray(
        rpy.mobility_apply(
            jnp.asarray(F, jnp.float64), jnp.asarray(r, jnp.float64),
            a, eta, wall, row_tile=row_tile,
        )
    ).ravel()
    assert np.abs(U - Uref).max() < 1e-12


def test_matvec_float32(cloud):
    r, F = cloud
    Uref = oracle.apply_M(F, r, 1.0, 1.0, True)
    U = np.asarray(
        rpy.mobility_apply(jnp.asarray(F, jnp.float32), jnp.asarray(r, jnp.float32), 1.0, 1.0, True)
    ).ravel()
    assert np.abs(U - Uref).max() < 1e-4 * max(1.0, np.abs(Uref).max())


def test_near_field_branch():
    # two overlapping blobs (r < 2a): regularized RPY branch
    r = np.array([[0.0, 0.0, 5.0], [0.5, 0.0, 5.0]])
    F = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    Uref = oracle.apply_M(F, r, 1.0, 1.0, False)
    U = np.asarray(rpy.mobility_apply(jnp.asarray(F, jnp.float64), jnp.asarray(r, jnp.float64))).ravel()
    assert np.allclose(U, Uref, atol=1e-14)


def test_self_blocks_and_damping():
    rng = np.random.default_rng(3)
    r = rng.uniform([-2, -2, 0.2], [2, 2, 3], (9, 3))
    blocks = np.asarray(rpy.self_mobility_blocks(jnp.asarray(r, jnp.float64), 1.0, 1.0, True))
    Mref = oracle.rpy_matrix(r, 1.0, 1.0, True)
    for i in range(9):
        assert np.allclose(blocks[i], Mref[3 * i : 3 * i + 3, 3 * i : 3 * i + 3], atol=1e-14)
    b = np.asarray(rpy.damping_factors(jnp.asarray(r, jnp.float64), 1.0))
    assert np.allclose(np.repeat(b, 3), oracle.damping(r, 1.0))


def test_wall_block_operator_symmetry(cloud):
    # the wall-corrected mobility is symmetric: M = Mᵀ
    r, _ = cloud
    M = np.asarray(rpy.mobility_matrix(jnp.asarray(r, jnp.float64), 1.0, 1.0, True))
    assert np.abs(M - M.T).max() < 1e-13
