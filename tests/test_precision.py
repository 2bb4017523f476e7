"""Precision contract (behavioral spec: reference ``tests/test_precision.py``).

Whatever compute precision the solver runs at, both float32 and float64
*inputs* must be accepted by the kinematic matvecs and the preconditioner —
plus the runtime-dtype extension: precision here is a constructor argument,
not the reference's compile-time ``DOUBLE_PRECISION`` build flag
(``eigen_defines.h:17-37``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import utils

INPUT_DTYPES = [np.float32, np.float64]
FLAG_GRID = [(b, w) for b in (False, True) for w in (False, True)]


@pytest.fixture(params=INPUT_DTYPES, ids=["f32-in", "f64-in"])
def in_dtype(request):
    return request.param


def test_kinematic_matvecs_accept_either_input_dtype(in_dtype):
    n_bodies = 5
    X, Q = utils.create_random_positions(n_bodies, seed=5)
    solver = utils.create_solver(X.astype(in_dtype), Q.astype(in_dtype))
    solver.set_config(X.astype(in_dtype), Q.astype(in_dtype))

    rng = np.random.default_rng(6)
    body_vec = rng.standard_normal(6 * n_bodies).astype(in_dtype)
    blob_vec = rng.standard_normal(3 * solver.total_blobs).astype(in_dtype)
    assert np.linalg.norm(solver.K_dot(body_vec)) > 0.0
    assert np.linalg.norm(solver.KT_dot(blob_vec)) > 0.0


@pytest.mark.parametrize(("block_PC", "wall_PC"), FLAG_GRID)
def test_preconditioner_accepts_either_input_dtype(in_dtype, block_PC, wall_PC):
    n_bodies = 3
    X, Q = utils.create_random_positions(n_bodies, wall_PC=wall_PC, seed=7)
    solver = utils.create_solver(
        X.astype(in_dtype), Q.astype(in_dtype),
        block_PC=block_PC, wall_PC=wall_PC,
    )
    b = np.random.default_rng(8).standard_normal(
        3 * solver.total_blobs + 6 * n_bodies
    ).astype(in_dtype)
    assert np.linalg.norm(solver.apply_PC(b)) > 0.0


@pytest.mark.parametrize("compute_dtype", [jnp.float32, jnp.float64])
def test_runtime_compute_precision(compute_dtype):
    """dtype= selects the on-device precision at runtime; outputs follow it."""
    X, Q = utils.create_random_positions(2, seed=1)
    solver = utils.create_solver(X, Q, dtype=compute_dtype)
    expect = "double" if compute_dtype == jnp.float64 else "single"
    assert solver.precision == expect
    pos = solver.get_blob_positions()
    out = solver.apply_M(np.random.default_rng(2).standard_normal(pos.size), pos)
    assert out.dtype == (np.float64 if compute_dtype == jnp.float64 else np.float32)
