"""Ambient flow slip: a force-free sphere must be advected with the flow."""

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu import SimulationConfig, flows, load_structure
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _setup(X):
    params, cfgb = load_structure("shell_N_42")
    cfg = SimulationConfig(a=params["sep"] / 2, dtype=jnp.float64,
                           gmres_tol=1e-10, gmres_maxiter=400)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(np.asarray(X), [[1.0, 0, 0, 0]], dtype=jnp.float64)
    return cfg, geom, state


def test_uniform_flow_advects_force_free_body():
    cfg, geom, state = _setup([[0.0, 0.0, 0.0]])
    slip_fn = flows.uniform_flow(geom, [0.3, -0.1, 0.7])
    ops = sad.geometry_ops(geom, state)
    res = solvers.solve_saddle(ops, cfg, slip_fn(state), jnp.zeros((1, 6)))
    assert np.allclose(np.asarray(res.U[0, :3]), [0.3, -0.1, 0.7], atol=1e-8)
    assert np.abs(np.asarray(res.U[0, 3:])).max() < 1e-8


def test_shear_flow_translates_and_rotates():
    """A force-free sphere in shear γ̇·z·x̂ at height h translates at ~γ̇·h
    and rotates at ω_y = γ̇/2 (Faxén)."""
    h, gd = 3.0, 0.8
    cfg, geom, state = _setup([[0.0, 0.0, h]])
    slip_fn = flows.shear_flow(geom, gd, flow_axis=0, gradient_axis=2)
    ops = sad.geometry_ops(geom, state)
    res = solvers.solve_saddle(ops, cfg, slip_fn(state), jnp.zeros((1, 6)))
    U = np.asarray(res.U[0])
    assert abs(U[0] - gd * h) < 1e-6        # advected with local flow
    assert abs(U[4] - gd / 2) < 2e-3         # vorticity/2 rotation
    assert abs(U[2]) < 1e-8                  # no vertical drift


def test_extensional_flow_stagnation_point():
    cfg, geom, state = _setup([[0.0, 0.0, 0.0]])
    slip_fn = flows.extensional_flow(geom, 0.5)
    ops = sad.geometry_ops(geom, state)
    res = solvers.solve_saddle(ops, cfg, slip_fn(state), jnp.zeros((1, 6)))
    # at the stagnation point: no translation, no rotation (pure strain)
    assert np.abs(np.asarray(res.U)).max() < 1e-7
