"""Noise-accuracy observable + adaptive Lanczos iteration control.

The reference's noise is an exact dense Cholesky (``c_rigid_obj.cpp:661-675``)
with no accuracy question; the TPU-native Lanczos sampler replaces it with a
truncated Krylov sqrt, so truncation error must be OBSERVABLE (per step, next
to the solve's residual/iters) and optionally CONTROLLED (adaptive iteration
count against a tolerance).  These tests pin the estimator against the true
error and the control loop against its tolerance.
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.dynamics import run_bd, stochastic_step
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.state import make_state


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T / n + 0.05 * np.eye(n)


def test_truncation_estimate_tracks_true_error():
    n = 240
    A = _spd(n)
    w, V = np.linalg.eigh(A)
    sq = V @ (np.sqrt(w)[:, None] * V.T)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n))
    ref = (sq @ x.T).T

    def mv(vk):
        return (jnp.asarray(A) @ vk.T).T

    prev = None
    for m in (4, 8, 12):
        out, err = lanczos.sqrt_matvec_batched(
            mv, jnp.asarray(x), iters=m, return_err=True)
        true = np.linalg.norm(np.asarray(out) - ref, axis=1)
        true /= np.linalg.norm(ref, axis=1)
        est = np.asarray(err)
        # same order of magnitude: within 8x both ways, monotone decreasing
        assert np.all(est < 8 * true + 1e-14) and np.all(true < 8 * est)
        if prev is not None:
            assert est.max() < prev
        prev = est.max()


def test_adaptive_iterations_hit_tolerance():
    n = 240
    A = _spd(n, seed=2)
    x = np.random.default_rng(3).standard_normal((1, n))

    def mv(vk):
        return (jnp.asarray(A) @ vk.T).T

    tol = 1e-5
    out, err = lanczos.sqrt_matvec_batched(
        mv, jnp.asarray(x), iters=4, max_iters=60, err_tol=tol,
        return_err=True)
    assert float(err[0]) <= tol
    # and the fixed 4-iteration answer is far worse than tol
    _, err4 = lanczos.sqrt_matvec_batched(
        mv, jnp.asarray(x), iters=4, return_err=True)
    assert float(err4[0]) > 10 * tol


def test_adaptive_matches_fixed_when_already_converged():
    """If the estimate is already below tol at ``iters``, adaptive mode must
    return exactly the fixed-iteration answer (no spurious extra work)."""
    n = 120
    A = _spd(n, seed=4)
    x = np.random.default_rng(5).standard_normal((1, n))

    def mv(vk):
        return (jnp.asarray(A) @ vk.T).T

    fixed = lanczos.sqrt_matvec_batched(mv, jnp.asarray(x), iters=25)
    adapt, err = lanczos.sqrt_matvec_batched(
        mv, jnp.asarray(x), iters=25, max_iters=40, err_tol=1.0,
        return_err=True)
    np.testing.assert_allclose(np.asarray(adapt), np.asarray(fixed),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.medium
def test_run_bd_surfaces_noise_err_and_adaptive_controls_it():
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    B = 4
    xs = np.array([[3.0 * i, 0.0, 2.0] for i in range(B)])
    state = make_state(xs, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float32)
    base = dict(a=params["sep"] / 2, dt=0.01, kBT=1.0, wall=True,
                dtype=jnp.float32, lanczos_iters=4, use_pallas=False,
                gmres_tol=1e-4, pc_mode="block_free")
    cfg = SimulationConfig(**base)
    runner = jax.jit(functools.partial(run_bd, geom, cfg, n_steps=4))
    _, traj = runner(state, jax.random.key(0))
    fixed_err = np.asarray(traj["noise_err"])
    assert fixed_err.shape == (4,) and np.all(fixed_err > 0)

    tol = 1e-5
    cfg_a = SimulationConfig(**base, lanczos_max_iters=20, lanczos_err_tol=tol)
    runner_a = jax.jit(functools.partial(run_bd, geom, cfg_a, n_steps=4))
    _, traj_a = runner_a(state, jax.random.key(0))
    adapt_err = np.asarray(traj_a["noise_err"])
    assert np.all(adapt_err <= tol)
    assert adapt_err.max() < fixed_err.min()


def test_deterministic_step_reports_zero_noise_err():
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state([[0.0, 0.0, 2.0]], [[1.0, 0, 0, 0]], dtype=jnp.float32)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=0.0,
                           dtype=jnp.float32, use_pallas=False, gmres_tol=1e-4)
    F = jnp.zeros((1, 6), jnp.float32).at[0, 2].set(-1.0)
    _, aux = stochastic_step(geom, cfg, state, jax.random.key(0), F)
    assert float(aux.noise_err) == 0.0
