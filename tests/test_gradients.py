"""Differentiable mobility solves (implicit adjoints) vs finite differences."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _setup():
    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dtype=jnp.float64,
                           gmres_tol=1e-12, gmres_maxiter=400)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    return cfg, geom


@pytest.mark.medium
def test_force_gradient_is_symmetric_mobility():
    """∂(v·U)/∂F = N·v: the gradient w.r.t. force of a velocity projection is
    a mobility application — check against an explicit extra solve."""
    cfg, geom = _setup()
    solve = solvers.make_differentiable_solver(cfg)
    state = make_state([[0.0, 0, 0], [3.0, 0, 0]], [[1.0, 0, 0, 0]] * 2,
                       dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((2, 6)))
    v = jnp.asarray(rng.standard_normal((2, 6)))
    slip = jnp.zeros((24, 3))

    def proj(F):
        lam, U = solve(ops, slip, F)
        return jnp.sum(U * v)

    g = jax.grad(proj)(F)
    # N·v via a solve with force=v (N is symmetric)
    _, Nv = solve(ops, slip, v)
    assert np.allclose(np.asarray(g), np.asarray(Nv), atol=1e-9)


@pytest.mark.medium
def test_position_gradient_vs_finite_difference():
    """∂(U_z of body 0)/∂(X of body 1): implicit adjoint vs centered FD."""
    cfg, geom = _setup()
    solve = solvers.make_differentiable_solver(cfg)
    F = jnp.zeros((2, 6), jnp.float64).at[:, 2].set(-1.0)
    slip = jnp.zeros((24, 3))
    Q = jnp.asarray([[1.0, 0, 0, 0]] * 2)

    def uz(X):
        state = make_state(X, Q, dtype=jnp.float64)
        ops = sad.geometry_ops(geom, state)
        lam, U = solve(ops, slip, F)
        return U[0, 2]

    X0 = jnp.asarray([[0.0, 0, 0], [3.0, 0.5, -0.2]])
    g = jax.grad(uz)(X0)
    eps = 1e-5
    for idx in [(1, 0), (1, 2), (0, 1)]:
        Xp = X0.at[idx].add(eps)
        Xm = X0.at[idx].add(-eps)
        fd = (uz(Xp) - uz(Xm)) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 1e-6, (idx, float(g[idx]), float(fd))


@pytest.mark.medium
def test_slip_gradient_flows():
    cfg, geom = _setup()
    solve = solvers.make_differentiable_solver(cfg)
    state = make_state([[0.0, 0, 0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    F = jnp.zeros((1, 6), jnp.float64)

    def swim_speed(slip_mag):
        slip = jnp.full((12, 3), slip_mag, jnp.float64)
        lam, U = solve(ops, slip, F)
        return U[0, 0]

    g = float(jax.grad(swim_speed)(0.1))
    fd = float((swim_speed(0.1 + 1e-6) - swim_speed(0.1 - 1e-6)) / 2e-6)
    assert abs(g - fd) < 1e-6


def test_rotation_gradient_at_zero():
    """∂q/∂ω at ω=0 must be finite (0.5 per component) — the sqrt at the
    origin needs the double-where guard."""
    Q = jnp.asarray([[1.0, 0, 0, 0]])

    def f(dU):
        _, Qn = kin.update_X_Q(jnp.zeros((1, 3)), Q, dU)
        return jnp.sum(Qn)

    g = jax.grad(f)(jnp.zeros((1, 6)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.allclose(np.asarray(g)[0, 3:], 0.5)


@pytest.mark.medium
def test_differentiable_full_step_vs_finite_differences():
    """End-to-end adjoint through geometry → solve → quaternion commit:
    gradient of the final height after 3 chained steps wrt the applied
    force AND the initial configuration must match central differences."""
    from rigid_body_light_tpu.dynamics import make_differentiable_step
    from rigid_body_light_tpu.state import BodyState, make_state

    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.05, dtype=jnp.float64,
                           gmres_tol=1e-12, gmres_maxiter=300,
                           use_pallas=False)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state0 = make_state([[0.0, 0.0, 2.0], [3.0, 0.0, 2.5]],
                        [[1.0, 0, 0, 0], [1.0, 0, 0, 0]], dtype=jnp.float64)
    step = make_differentiable_step(geom, cfg)

    def loss(X0, F):
        s = BodyState(X=X0, Q=state0.Q)
        for _ in range(3):
            s = step(s, F)
        return jnp.sum(s.X[:, 2])

    F0 = jnp.zeros((2, 6), jnp.float64).at[:, 2].set(-1.0).at[0, 0].set(0.3)
    gX, gF = jax.grad(loss, argnums=(0, 1))(state0.X, F0)

    eps = 1e-6
    for idx in [(0, 2), (1, 0), (0, 4)]:
        Fp = F0.at[idx].add(eps)
        Fm = F0.at[idx].add(-eps)
        fd = (loss(state0.X, Fp) - loss(state0.X, Fm)) / (2 * eps)
        assert float(jnp.abs(gF[idx] - fd)) < 1e-6 * max(1.0, abs(float(fd))), idx
    for idx in [(0, 2), (1, 1)]:
        Xp = state0.X.at[idx].add(eps)
        Xm = state0.X.at[idx].add(-eps)
        fd = (loss(Xp, F0) - loss(Xm, F0)) / (2 * eps)
        assert float(jnp.abs(gX[idx] - fd)) < 1e-5 * max(1.0, abs(float(fd))), idx
