"""Unit tests for the in-repo restarted GMRES (Givens-rotation cycles with
in-cycle convergence skipping and exact iteration accounting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.ops import gmres as gm


def _spd_system(n, dtype, seed=0, cond=None):
    rng = np.random.default_rng(seed)
    if cond is None:
        A = rng.standard_normal((n, n))
        A = A @ A.T / n + 2.0 * np.eye(n)
    else:
        d = np.logspace(0, np.log10(cond), n)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = Q @ np.diag(d) @ Q.T
    b = rng.standard_normal(n)
    return jnp.asarray(A, dtype), jnp.asarray(b, dtype)


@pytest.mark.parametrize(
    ("dtype", "tol"), [(jnp.float64, 1e-10), (jnp.float32, 1e-5)]
)
def test_solves_to_tolerance_with_exact_iters(dtype, tol):
    A, b = _spd_system(120, dtype)
    res = jax.jit(lambda b: gm.gmres(lambda x: A @ x, b, tol=tol, restart=40))(b)
    x_direct = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    assert float(res.residual) < 5 * tol
    err = np.abs(np.asarray(res.x, np.float64) - x_direct).max()
    assert err / np.abs(x_direct).max() < 50 * tol
    # exact accounting: an easy SPD system converges mid-cycle, so the count
    # must NOT be a whole multiple of the restart length
    assert 0 < int(res.iters) < 40


def test_warm_start_from_solution_executes_zero_iterations():
    A, b = _spd_system(80, jnp.float64)
    first = gm.gmres(lambda x: A @ x, b, tol=1e-10, restart=30)
    again = gm.gmres(lambda x: A @ x, b, x0=first.x, tol=1e-8, restart=30)
    assert int(again.iters) == 0
    assert float(again.residual) < 1e-8


def test_restart_cycles_accumulate_iters():
    # force multiple cycles with a short restart
    A, b = _spd_system(100, jnp.float64, seed=3)
    res = gm.gmres(lambda x: A @ x, b, tol=1e-12, restart=5, max_restarts=20)
    assert float(res.residual) < 1e-11
    assert int(res.iters) > 5  # needed more than one cycle


def test_stagnation_matches_unrestarted_theory():
    """Restarted GMRES stagnates on wide log-uniform spectra — the skip
    logic must not change that fixed point (parity with scipy behavior)."""
    A, b = _spd_system(200, jnp.float64, seed=0, cond=1e5)
    res = gm.gmres(lambda x: A @ x, b, tol=1e-8, restart=30, max_restarts=10)
    import scipy.sparse.linalg as spla

    x_sp, _ = spla.gmres(
        np.asarray(A), np.asarray(b), rtol=1e-8, restart=30, maxiter=10
    )
    r_sp = np.linalg.norm(np.asarray(b) - np.asarray(A) @ x_sp) / np.linalg.norm(
        np.asarray(b)
    )
    assert abs(float(res.residual) - r_sp) < 0.05 * max(r_sp, 1e-12)


def test_in_cycle_skip_changes_nothing_but_cost():
    """With restart much larger than the converging iteration, the skipped
    tail must leave the solution identical to a tight-restart solve."""
    A, b = _spd_system(90, jnp.float64, seed=5)
    wide = gm.gmres(lambda x: A @ x, b, tol=1e-10, restart=60, max_restarts=2)
    assert float(wide.residual) < 1e-10
    assert int(wide.iters) < 60  # tail was skipped
    x_direct = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.allclose(np.asarray(wide.x), x_direct, atol=1e-8)
