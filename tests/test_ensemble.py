"""Multi-host (DCN) ensemble layer: walkers over the outer mesh axis,
bodies over the inner (ICI) axis — see parallel/ensemble.py's rationale
(DCN carries zero bytes during stepping; the body ring stays on ICI).

Runs on the 8-virtual-device CPU mesh as a 2x4 (dcn x chips) grid; the
semantics are identical to a real two-host slice by construction
(single-process meshes are a plain reshape of the same device order).
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_light_tpu import SimulationConfig, forces, load_structure, parallel
from rigid_body_light_tpu.dynamics import run_bd
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.state import BodyState


def _setup(W=4, B=8, kBT=0.0):
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    X = rng.uniform([-4, -4, 2.0], [4, 4, 6.0], (W, B, 3))
    Q = rng.standard_normal((W, B, 4))
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    states = BodyState(X=jnp.asarray(X), Q=jnp.asarray(Q))
    keys = jax.vmap(jax.random.key)(jnp.arange(10, 10 + W))
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=kBT, wall=True,
                           dtype=jnp.float64, lanczos_iters=8,
                           use_pallas=False, gmres_tol=1e-8,
                           pc_mode="block_free")
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=2.0, debye_length=0.5, radius=1.0))
    return geom, cfg, states, keys, force_fn


def test_hybrid_mesh_shape_and_axes():
    mesh = parallel.make_hybrid_mesh(dcn=2)
    assert dict(mesh.shape) == {"dcn": 2, "chips": 4}
    with pytest.raises(ValueError):
        parallel.make_hybrid_mesh(dcn=3)


@pytest.mark.medium
def test_ensemble_deterministic_matches_single_device_per_walker():
    """kBT=0 ensemble trajectories must equal the plain single-device
    scan walker by walker (the body ring is exact; walkers independent)."""
    geom, cfg, states, keys, force_fn = _setup(kBT=0.0)
    mesh = parallel.make_hybrid_mesh(dcn=2)
    run_e = jax.jit(parallel.make_ensemble_run_bd(
        geom, cfg, mesh, n_steps=3, force_fn=force_fn))
    fin, traj = run_e(states, keys)
    assert np.asarray(traj["X"]).shape == (4, 3, 8, 3)
    for w in range(states.X.shape[0]):
        s_ref, _ = jax.jit(functools.partial(
            run_bd, geom, cfg, n_steps=3, force_fn=force_fn))(
            BodyState(X=states.X[w], Q=states.Q[w]), keys[w])
        np.testing.assert_allclose(np.asarray(fin.X[w]),
                                   np.asarray(s_ref.X), atol=1e-12)


@pytest.mark.medium
def test_ensemble_stochastic_matches_1d_distributed_per_walker():
    """Each walker's fluctuating trajectory must reproduce what the 1-D
    fully-distributed run produces from the same key on the same number
    of body shards (the ensemble layer adds NO new randomness paths)."""
    geom, cfg, states, keys, force_fn = _setup(kBT=0.5)
    cfg = cfg.replace(gmres_tol=1e-6)
    mesh = parallel.make_hybrid_mesh(dcn=2)
    run_e = jax.jit(parallel.make_ensemble_run_bd(
        geom, cfg, mesh, n_steps=3, force_fn=force_fn))
    fin, traj = run_e(states, keys)
    assert np.isfinite(np.asarray(fin.X)).all()
    assert np.asarray(traj["residual"]).max() < 1e-5
    mesh1 = parallel.make_mesh(4)
    w = 1
    run_d = jax.jit(parallel.make_distributed_run_bd(
        geom, cfg, mesh1, n_steps=3, force_fn=force_fn))
    s_d, _ = run_d(BodyState(X=states.X[w], Q=states.Q[w]), keys[w])
    np.testing.assert_allclose(np.asarray(fin.X[w]), np.asarray(s_d.X),
                               atol=1e-10)
    # walkers see different noise: distinct keys -> distinct trajectories
    assert not np.allclose(np.asarray(fin.X[0]), np.asarray(fin.X[1]),
                           atol=1e-3)


def test_ensemble_divisibility_errors():
    geom, cfg, states, keys, force_fn = _setup(W=3)
    mesh = parallel.make_hybrid_mesh(dcn=2)
    run_e = parallel.make_ensemble_run_bd(geom, cfg, mesh, n_steps=2)
    with pytest.raises(ValueError, match="n_walkers divisible"):
        run_e(states, keys)
    geom, cfg, states, keys, force_fn = _setup(W=4, B=6)
    with pytest.raises(ValueError, match="n_bodies divisible"):
        parallel.make_ensemble_run_bd(geom, cfg, mesh, n_steps=2)(
            states, keys)
