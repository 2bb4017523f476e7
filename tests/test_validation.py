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
