"""Analytic physics validation — tests the reference does NOT have (SURVEY.md
§4 notes their absence): sphere drag vs 1/(6πηRh), rotational drag
convergence, wall-hindered mobility, frame invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _solve_single(n_blobs, X, Q, force, wall=False, eta=1.0):
    params, cfgb = load_structure(f"shell_N_{n_blobs}")
    a = params["sep"] / 2  # touching blobs → hydrodynamic radius Rh = 1
    cfg = SimulationConfig(a=a, eta=eta, wall=wall, dtype=jnp.float64,
                           gmres_tol=1e-10, gmres_maxiter=600)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(np.asarray(X), np.asarray(Q), dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    res = solvers.solve_saddle(ops, cfg, jnp.zeros((n_blobs, 3)), jnp.asarray(force))
    return res


@pytest.mark.parametrize("n_blobs", [12, 42, 162])
def test_sphere_translational_drag(n_blobs):
    """U/F must equal 1/(6πηRh) with Rh=1 (CSV header) to 0.1%."""
    F = np.zeros((1, 6)); F[0, 2] = -1.0
    res = _solve_single(n_blobs, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], F)
    mu = -float(res.U[0, 2])
    rh_eff = 1.0 / (6 * np.pi * mu)
    assert abs(rh_eff - 1.0) < 1e-3
    # isotropy: same mobility for x-directed force
    Fx = np.zeros((1, 6)); Fx[0, 0] = 1.0
    res_x = _solve_single(n_blobs, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], Fx)
    assert abs(float(res_x.U[0, 0]) - mu) < 1e-8
    # no spurious rotation or transverse drift
    assert np.abs(np.asarray(res.U)[0, [0, 1, 3, 4, 5]]).max() < 1e-10


def test_sphere_rotational_drag_converges():
    """ω/T → 1/(8πηRh³): discretization error must shrink with resolution."""
    errs = []
    for n_blobs in (12, 42, 162):
        T = np.zeros((1, 6)); T[0, 5] = 1.0
        res = _solve_single(n_blobs, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], T)
        mu_r = float(res.U[0, 5])
        rh_rot = (1.0 / (8 * np.pi * mu_r)) ** (1 / 3)
        errs.append(abs(rh_rot - 1.0))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 0.01  # shell_162 within 1%


@pytest.mark.medium
def test_wall_hindered_mobility():
    """Near-wall mobility must be reduced, anisotropic (μ_∥ > μ_⊥), and
    monotonically approach the free-space value with height."""
    F_free = np.zeros((1, 6)); F_free[0, 2] = -1.0
    mu_free = -float(_solve_single(42, [[0, 0, 0.0]], [[1.0, 0, 0, 0]], F_free).U[0, 2])
    mus_perp, mus_par = [], []
    for h in (1.5, 3.0, 6.0, 12.0):
        Fz = np.zeros((1, 6)); Fz[0, 2] = -1.0
        Fx = np.zeros((1, 6)); Fx[0, 0] = 1.0
        mus_perp.append(-float(_solve_single(42, [[0, 0, h]], [[1.0, 0, 0, 0]], Fz, wall=True).U[0, 2]))
        mus_par.append(float(_solve_single(42, [[0, 0, h]], [[1.0, 0, 0, 0]], Fx, wall=True).U[0, 0]))
    assert all(m < mu_free for m in mus_perp)
    assert mus_perp == sorted(mus_perp)          # increasing with height
    assert all(p > z for p, z in zip(mus_par, mus_perp))  # parallel easier than perpendicular
    assert abs(mus_perp[-1] - mu_free) / mu_free < 0.1    # far away → near free space


def test_translation_invariance_and_viscosity_scaling():
    F = np.zeros((1, 6)); F[0, 2] = -1.0
    u1 = float(_solve_single(12, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], F).U[0, 2])
    u2 = float(_solve_single(12, [[7.0, -3.0, 11.0]], [[1.0, 0, 0, 0]], F).U[0, 2])
    assert abs(u1 - u2) < 1e-10
    u_eta = float(_solve_single(12, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], F, eta=2.5).U[0, 2])
    assert abs(u_eta * 2.5 - u1) < 1e-10


def test_rotation_equivariance():
    """Rotating the body orientation must not change the drag of a sphere."""
    F = np.zeros((1, 6)); F[0, 2] = -1.0
    q = np.array([[0.3, 0.5, -0.2, 0.7]])
    q /= np.linalg.norm(q)
    u1 = float(_solve_single(42, [[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], F).U[0, 2])
    u2 = float(_solve_single(42, [[0.0, 0.0, 0.0]], q, F).U[0, 2])
    assert abs(u1 - u2) < 1e-9


def test_two_spheres_interact():
    """Two nearby sedimenting spheres fall faster than one (cooperative
    hydrodynamics) — classic Stokes pair result."""
    params, cfgb = load_structure("shell_N_12")
    a = params["sep"] / 2
    cfg = SimulationConfig(a=a, eta=1.0, dtype=jnp.float64, gmres_tol=1e-10)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    F1 = np.zeros((1, 6)); F1[0, 2] = -1.0
    mu_single = -float(_solve_single(12, [[0, 0, 0.0]], [[1.0, 0, 0, 0]], F1).U[0, 2])
    state = make_state(np.array([[0, 0, 0.0], [3.0, 0, 0]]),
                       np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]), dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    F2 = np.zeros((2, 6)); F2[:, 2] = -1.0
    res = solvers.solve_saddle(ops, cfg, jnp.zeros((24, 3)), jnp.asarray(F2))
    u_pair = -np.asarray(res.U)[:, 2]
    assert np.all(u_pair > mu_single)  # both fall faster
    assert abs(u_pair[0] - u_pair[1]) < 1e-9  # symmetric
