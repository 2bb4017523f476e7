"""In-jit diagnostics + host-side error contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.utils import validation


def test_diagnose_clean_state():
    r = jnp.asarray([[0.0, 0, 1], [3.0, 0, 1], [0, 3.0, 2]])
    Q = jnp.asarray([[1.0, 0, 0, 0]])
    d = jax.jit(validation.diagnose)(r, Q)
    assert abs(float(d.min_separation) - 3.0) < 1e-6
    assert int(d.n_below_wall) == 0
    assert float(d.max_quat_err) < 1e-7
    validation.assert_valid(d, wall=True)  # no raise


def test_diagnose_overlap_and_below_wall():
    r = jnp.asarray([[0.0, 0, 1], [1e-9, 0, 1], [0, 0, -0.5]])
    Q = jnp.asarray([[1.0, 0, 0, 0]])
    d = validation.diagnose(r, Q, a=1.0)
    assert float(d.min_separation) < 1e-6
    assert int(d.n_below_wall) == 1
    with pytest.raises(RuntimeError, match="OVERLAPPING"):
        validation.assert_valid(d)
    d2 = validation.diagnose(jnp.asarray([[0.0, 0, 1], [0, 0, -0.5]]), Q)
    with pytest.raises(RuntimeError, match="below the wall"):
        validation.assert_valid(d2, wall=True)


def test_diagnose_tiled_matches_direct():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(-5, 5, (77, 3)))
    Q = jnp.asarray(rng.standard_normal((4, 4)))
    d_tiled = validation.diagnose(r, Q, a=0.5, row_tile=16)
    dist = np.linalg.norm(np.asarray(r)[:, None] - np.asarray(r)[None, :], axis=-1)
    dist[np.arange(77), np.arange(77)] = np.inf
    assert abs(float(d_tiled.min_separation) - dist.min() / 0.5) < 1e-6


def test_bad_quaternions_flagged():
    r = jnp.asarray([[0.0, 0, 1], [3.0, 0, 1]])
    Q = jnp.asarray([[1.1, 0, 0, 0]])
    d = validation.diagnose(r, Q)
    with pytest.raises(RuntimeError, match="unit norm"):
        validation.assert_valid(d)


# ---- RigidBody API error contract (reference process-kills; we raise) ----


def _shell_and_cfg():
    from rigid_body_light_tpu import load_structure

    params, cfgb = load_structure("shell_N_12")
    return params, cfgb


def test_api_rejects_coincident_blobs_on_set_config():
    """Two bodies at the same position → coincident blobs.  The reference's
    ``mobilityUFRPY`` exits the process on r<1e-12 (``c_rigid_obj.cpp:53-58``);
    the API layer raises instead."""
    from rigid_body_light_tpu import RigidBody

    params, cfgb = _shell_and_cfg()
    Q = np.tile([1.0, 0, 0, 0], (2, 1))
    with pytest.raises(RuntimeError, match="OVERLAPPING"):
        RigidBody(
            cfgb, np.array([[0.0, 0, 3], [0.0, 0, 3]]), Q,
            params["sep"] / 2, 1.0, 0.1,
        )


def test_api_rejects_overlap_in_apply_m_positions():
    from rigid_body_light_tpu import RigidBody

    params, cfgb = _shell_and_cfg()
    Q = np.tile([1.0, 0, 0, 0], (2, 1))
    rb = RigidBody(
        cfgb, np.array([[0.0, 0, 3], [5.0, 0, 3]]), Q, params["sep"] / 2, 1.0, 0.1
    )
    r_bad = np.array([[0.0, 0, 3], [0.0, 0, 3]])
    with pytest.raises(RuntimeError, match="OVERLAPPING"):
        rb.apply_M(np.ones(6), r_bad.ravel())


def test_api_rejects_collinear_body():
    """Collinear blobs make the rotational (KᵀK) block singular; the
    reference kills the process ('is your rigid body a dimer?',
    ``c_rigid_obj.cpp:313-316``) — the API raises at construction."""
    from rigid_body_light_tpu import RigidBody

    dimer = np.array([[0.0, 0, 0], [0.0, 0, 2.0]])
    X = np.array([[0.0, 0, 3], [5.0, 0, 3]])
    Q = np.tile([1.0, 0, 0, 0], (2, 1))
    with pytest.raises(RuntimeError, match="dimer"):
        RigidBody(dimer, X, Q, 1.0, 1.0, 0.1)


def test_validate_config_opt_out():
    """validate_config=False skips the O(N²) overlap sweep (large-N path)."""
    from rigid_body_light_tpu import RigidBody, SimulationConfig

    params, cfgb = _shell_and_cfg()
    Q = np.tile([1.0, 0, 0, 0], (2, 1))
    cfg = SimulationConfig(validate_config=False)
    rb = RigidBody(
        cfgb, np.array([[0.0, 0, 3], [0.0, 0, 3]]), Q,
        params["sep"] / 2, 1.0, 0.1, config=cfg,
    )  # no raise
    assert rb.total_blobs == 24
