"""Pseudo-periodic (minimum-image) boundaries in the plane.

The wrap lives wherever pair displacements are formed: the XLA streamed
sweep, the dense assembler, both Pallas kernels (ordered + symmetric), the
sharded paths, the oracle, and pair forces.  These tests pin the geometry
(nearest-image equivalence, translation invariance, symmetry) and the
cross-implementation parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from rigid_body_light_tpu import SimulationConfig
from rigid_body_light_tpu.ops import rpy, rpy_pallas

BOX = (10.0, 8.0)


def _cloud(n=40, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform([0, 0, 1.2], [BOX[0], BOX[1], 6.0], (n, 3))
    F = rng.standard_normal((n, 3))
    return r, F


@pytest.mark.parametrize("wall", [False, True])
def test_dense_matches_oracle_with_box(wall):
    r, F = _cloud()
    M = np.asarray(rpy.mobility_matrix(jnp.asarray(r), a=0.8, eta=1.2,
                                       wall=wall, box=BOX))
    Mo = oracle.rpy_matrix(r, 0.8, 1.2, wall, box=BOX)
    assert np.abs(M - Mo).max() < 1e-12
    assert np.abs(M - M.T).max() < 1e-12  # minimum image keeps symmetry


@pytest.mark.parametrize("wall", [False, True])
def test_streamed_matches_dense_with_box(wall):
    r, F = _cloud(seed=1)
    U = np.asarray(rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r),
                                      a=0.8, wall=wall, box=BOX))
    Ud = np.asarray(oracle.apply_M(F, r, 0.8, 1.0, wall, box=BOX)).reshape(-1, 3)
    assert np.abs(U - Ud).max() / np.abs(Ud).max() < 1e-12


def test_wrap_equals_nearest_image_pair():
    """A pair across the boundary must interact exactly like the explicitly
    shifted (unwrapped) nearest image."""
    r_wrapped = np.array([[0.5, 4.0, 2.0], [9.7, 4.0, 2.3]])   # gap 0.8 thru x
    r_shifted = np.array([[0.5, 4.0, 2.0], [-0.3, 4.0, 2.3]])  # same, unwrapped
    F = np.array([[1.0, -0.5, 0.25], [0.0, 1.0, -1.0]])
    Uw = np.asarray(rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r_wrapped),
                                       wall=True, box=BOX))
    Us = np.asarray(rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r_shifted),
                                       wall=True))
    assert np.abs(Uw - Us).max() < 1e-13


def test_translation_invariance_under_box_shift():
    """Shifting every blob by one period (or any lattice vector) must leave
    the product unchanged."""
    r, F = _cloud(seed=2)
    U0 = np.asarray(rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r),
                                       wall=True, box=BOX))
    shift = np.array([BOX[0], -2.0 * BOX[1], 0.0])
    U1 = np.asarray(rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r + shift),
                                       wall=True, box=BOX))
    assert np.abs(U0 - U1).max() / np.abs(U0).max() < 1e-11


@pytest.mark.parametrize("wall", [False, True])
def test_pallas_kernels_match_oracle_with_box(wall):
    """Both Pallas kernels (ordered and symmetric) wrap identically."""
    r, F = _cloud(n=150, seed=3)
    rf = jnp.asarray(r, jnp.float32)
    Ff = jnp.asarray(F, jnp.float32)
    truth = np.asarray(
        oracle.apply_M(F.astype(np.float64), r, 1.0, 1.0, wall, box=BOX)
    ).reshape(-1, 3)
    old = rpy_pallas.USE_SYM
    try:
        for sym in (False, True):
            rpy_pallas.USE_SYM = sym
            U = np.asarray(rpy_pallas.mobility_apply(
                Ff, rf, 1.0, 1.0, wall, box=BOX, interpret=True))
            err = np.abs(U - truth).max() / np.abs(truth).max()
            assert err < 5e-6, (sym, err)
    finally:
        rpy_pallas.USE_SYM = old


@pytest.mark.medium
def test_sharded_pair_sum_with_box():
    from rigid_body_light_tpu.parallel import make_mesh
    from rigid_body_light_tpu.parallel.sharding import sharded_pair_sum

    r, F = _cloud(n=30, seed=4)
    rj, Fj = jnp.asarray(r), jnp.asarray(F)
    ids = jnp.arange(30, dtype=jnp.int32)
    ref = np.asarray(rpy.pair_sum(rj, ids, rj, ids, Fj, a=0.7, wall=True,
                                  box=BOX))
    mesh = make_mesh()
    out = np.asarray(sharded_pair_sum(rj, Fj, mesh, a=0.7, wall=True, box=BOX))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.medium
def test_bd_step_with_box_runs():
    """End to end: a periodic wall suspension steps, converges, stays finite,
    and keeps unwrapped coordinates (bodies can drift past the boundary)."""
    from rigid_body_light_tpu import load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=0.5, wall=True,
                           box=(8.0, 8.0), dtype=jnp.float64,
                           lanczos_iters=10, gmres_tol=1e-7,
                           gmres_maxiter=150, pc_mode="block_free")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.5, 4.0, 2.0], [7.5, 4.0, 2.4]],
                       [[1.0, 0, 0, 0]] * 2, dtype=jnp.float64)
    final, traj = run_bd(geom, cfg, state, jax.random.key(1), 10)
    assert np.isfinite(np.asarray(traj["X"])).all()
    assert float(np.asarray(traj["residual"]).max()) < 1e-6
    assert not np.allclose(np.asarray(final.X), np.asarray(state.X))


def test_pair_yukawa_wraps():
    from rigid_body_light_tpu import forces
    from rigid_body_light_tpu.state import make_state

    st = make_state([[0.5, 4.0, 2.0], [9.7, 4.0, 2.0]],
                    [[1.0, 0, 0, 0]] * 2, dtype=jnp.float64)
    f_open = forces.pair_yukawa(2.0, 0.5, 1.0)(st)
    f_box = forces.pair_yukawa(2.0, 0.5, 1.0, box=BOX)(st)
    # across the boundary the pair is 0.8 apart, not 9.2: strong repulsion,
    # pushing body 0 in +x and body 1 in -x (through the boundary)
    assert float(f_box[0, 0]) > 10 * abs(float(f_open[0, 0]))
    assert float(f_box[0, 0]) > 0 and float(f_box[1, 0]) < 0
    assert np.allclose(np.asarray(f_box[:, 1]), 0.0)


@pytest.mark.medium
def test_sharded_pair_sum_2d_with_box():
    """The SUMMA path's box plumbing (independent of the 1-D path's)."""
    from rigid_body_light_tpu.parallel.sharding import (
        make_mesh_2d, sharded_pair_sum_2d,
    )

    r, F = _cloud(n=32, seed=6)
    rj, Fj = jnp.asarray(r), jnp.asarray(F)
    ids = jnp.arange(32, dtype=jnp.int32)
    ref = np.asarray(rpy.pair_sum(rj, ids, rj, ids, Fj, a=0.7, wall=True,
                                  box=BOX))
    mesh = make_mesh_2d((2, 4))
    out = np.asarray(sharded_pair_sum_2d(rj, Fj, mesh, a=0.7, wall=True,
                                         box=BOX))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


def test_box_too_small_for_body_raises():
    """A box smaller than twice the body diameter must be rejected wherever
    geometry meets the config (API constructor and scan drivers)."""
    from rigid_body_light_tpu import RigidBody, load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_42")  # diameter ~2 + 2a
    with pytest.raises(ValueError, match="too small"):
        RigidBody(np.asarray(cfgb).ravel(), np.array([0.0, 0, 3.0]),
                  np.array([1.0, 0, 0, 0]), a=params["sep"] / 2, eta=1.0,
                  dt=0.01, config=SimulationConfig(
                      wall=True, box=(3.0, 3.0), dtype=jnp.float32))
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=0.5, wall=True,
                           box=(3.0, 3.0), dtype=jnp.float64)
    state = make_state([[0.0, 0, 3.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    with pytest.raises(ValueError, match="too small"):
        run_bd(geom, cfg, state, jax.random.key(0), 2)


def test_overlap_check_sees_wrapped_distance():
    """Blobs coincident modulo the box are the r=0 failure the API's
    overlap validation exists for — it must measure wrapped distances."""
    from rigid_body_light_tpu import RigidBody, load_structure

    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(box=(8.0, 8.0), dtype=jnp.float64)
    with pytest.raises(RuntimeError, match="OVERLAP"):
        RigidBody(np.asarray(cfgb).ravel(),
                  np.array([[0.0, 2.0, 3.0], [8.0, 2.0, 3.0]]),
                  np.tile([1.0, 0, 0, 0], (2, 1)),
                  a=params["sep"] / 2, eta=1.0, dt=0.01, config=cfg)


def test_zero_box_component_rejected():
    with pytest.raises(ValueError):
        SimulationConfig(box=(10.0, 0.0))
    with pytest.raises(ValueError):
        rpy.mobility_apply(jnp.zeros((2, 3)), jnp.ones((2, 3)),
                           box=(10.0, 0.0))
