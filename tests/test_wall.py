"""Wall error contract (behavioral spec: reference ``tests/test_wall.py``).

Every mobility-touching operator must return finite, nonzero output for a
body hovering above the wall, and raise ``RuntimeError`` the moment any blob
center sits below z = 0 — the Swan–Brady correction is undefined there (the
reference throws from ``mobilityUFSingleWallCorrection``,
``c_rigid_obj.cpp:95-97``).
"""

import numpy as np
import pytest

import utils

OPERATORS = ["apply_PC", "apply_saddle", "apply_M"]


def _solver_at_height(z):
    solver = utils.create_solver(
        X=np.array([[0.0, 0.0, z]]),
        Q=np.array([[1.0, 0.0, 0.0, 0.0]]),
        wall_PC=True,
    )
    rng = np.random.default_rng(42)
    sys_vec = rng.standard_normal(3 * solver.total_blobs + 6 * solver.N_bodies)
    return solver, sys_vec


def _invoke(solver, op, sys_vec):
    if op == "apply_M":
        lam = sys_vec[: 3 * solver.total_blobs]
        return solver.apply_M(lam, solver.get_blob_positions())
    return getattr(solver, op)(sys_vec)


@pytest.mark.parametrize("op", OPERATORS)
def test_operator_finite_above_wall(op):
    solver, vec = _solver_at_height(z=1.0)
    out = _invoke(solver, op, vec)
    assert np.isfinite(out).all()
    assert np.linalg.norm(out) > 0.0


@pytest.mark.parametrize("op", OPERATORS)
def test_operator_raises_below_wall(op):
    # center at z = 0 → the lower hemisphere's blobs are below the wall
    solver, vec = _solver_at_height(z=0.0)
    with pytest.raises(RuntimeError, match="below the wall"):
        _invoke(solver, op, vec)
