"""Proxy-grid far field (ops/farfield.py) vs the exact RPY sweep.

The near/far split must partition pairs exactly once (agreement with the
dense operator at the interpolation tolerance), stay symmetric (the far
field is Pᵀ·K·P with one shared basis), and poison loudly on
neighbor-list overflow.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.ops import farfield, rpy


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    r = rng.uniform(0, 20, (1500, 3))
    F = rng.standard_normal((2, 1500, 3))
    return r, F


@pytest.mark.parametrize("p,tol", [
    (3, 2e-2), (4, 3e-3),
    pytest.param(6, 2e-4, marks=pytest.mark.medium),
])
def test_matches_exact_sweep(cloud, p, tol):
    r, F = cloud
    a, eta = 0.9, 1.3
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    U_ref = rpy.mobility_apply(F64, r64, a=a, eta=eta, wall=False)
    U = farfield.mobility_apply(F64, r64, a=a, eta=eta, grid=4, p=p)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < tol


def test_symmetry_and_multi_rhs(cloud):
    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F1 = jnp.asarray(F[0], jnp.float64)
    F2 = jnp.asarray(F[1], jnp.float64)
    U1 = farfield.mobility_apply(F1, r64, a=0.9, grid=4, p=4)
    U2 = farfield.mobility_apply(F2, r64, a=0.9, grid=4, p=4)
    s1, s2 = float(jnp.vdot(F2, U1)), float(jnp.vdot(F1, U2))
    assert abs(s1 - s2) / abs(s1) < 1e-12
    Um = farfield.mobility_apply(jnp.stack([F1, F2]), r64, a=0.9, grid=4, p=4)
    assert float(jnp.abs(Um[0] - U1).max()) < 1e-13
    assert float(jnp.abs(Um[1] - U2).max()) < 1e-13


def test_float32_path(cloud):
    r, F = cloud
    r32 = jnp.asarray(r, jnp.float32)
    F32 = jnp.asarray(F[0], jnp.float32)
    U_ref = rpy.mobility_apply(F32, r32, a=0.9, wall=False)
    U = farfield.mobility_apply(F32, r32, a=0.9, grid=4, p=4)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 5e-3


def test_anisotropic_grid_flat_layer():
    """Sedimented-slab geometry: anisotropic grid keeps cells cubic-ish."""
    rng = np.random.default_rng(3)
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 30, 1200), rng.uniform(0, 30, 1200),
        rng.uniform(1.0, 4.0, 1200)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((1200, 3)), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.9, wall=False)
    U = farfield.mobility_apply(F, r, a=0.9, grid=(6, 6, 1), p=5)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 3e-3


def test_clustered_bodies(cloud):
    """Body-scale clustering must neither overflow nor lose accuracy."""
    rng = np.random.default_rng(2)
    cluster = 10.0 + 0.8 * rng.standard_normal((600, 3))
    sparse = rng.uniform(0, 20, (400, 3))
    r = jnp.asarray(np.concatenate([cluster, sparse]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((1000, 3)), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.3, wall=False)
    U = farfield.mobility_apply(F, r, a=0.3, grid=4, p=4)
    assert bool(jnp.isfinite(U).all())
    assert float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max()) < 3e-3


def test_cell_snake_order_tiles_are_cell_compact():
    """The snake sort must (a) be a permutation, (b) keep every TILE-run
    inside a narrow band of consecutive snake cells, so per-tile cell
    bboxes — and hence the neighbor-tile lists — stay tight even when N
    is not a multiple of TILE (the partial tile pads with its own last
    entry)."""
    from rigid_body_light_tpu.ops import tiles

    rng = np.random.default_rng(11)
    grid = (5, 4, 3)
    n = 3 * farfield.TILE + 77                               # partial tile
    ci = jnp.asarray(rng.integers(0, grid, size=(n, 3)), jnp.int32)
    order = np.asarray(tiles.cell_snake_order(ci, grid))
    assert sorted(order.tolist()) == list(range(n))
    # snake position must be non-decreasing along the sort
    gx, gy, gz = grid
    c = np.asarray(ci)[order]
    cy = np.where(c[:, 0] % 2 == 0, c[:, 1], gy - 1 - c[:, 1])
    col = c[:, 0] * gy + cy
    cz = np.where(col % 2 == 0, c[:, 2], gz - 1 - c[:, 2])
    snake = col * gz + cz
    assert (np.diff(snake) >= 0).all()
    # pad entries must NOT expand the partial tile's cell bbox: padding
    # with the last sorted entry keeps min/max over the padded tile equal
    # to min/max over its real entries alone
    t = -(-n // farfield.TILE)
    pad = t * farfield.TILE - n
    real_tail = c[(t - 1) * farfield.TILE:]
    ci_s = np.concatenate([c, np.broadcast_to(c[-1:], (pad, 3))])
    padded_tail = ci_s[(t - 1) * farfield.TILE:]
    assert (padded_tail.min(0) == real_tail.min(0)).all()
    assert (padded_tail.max(0) == real_tail.max(0)).all()


def test_overflow_poisons(cloud):
    r, F = cloud
    U = farfield.mobility_apply(jnp.asarray(r), jnp.asarray(r), a=0.9,
                                grid=4, p=3, max_nbr=1)
    assert bool(jnp.isnan(U).any())


@pytest.mark.parametrize("p,tol", [
    (4, 5e-3), pytest.param(6, 3e-4, marks=pytest.mark.medium),
])
def test_wall_matches_exact_sweep(p, tol):
    """Swan–Brady far field: image-kernel lattices + exact near terms."""
    rng = np.random.default_rng(11)
    n = 1200
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 30, n), rng.uniform(0, 30, n),
        rng.uniform(0.9, 6.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True)
    U = farfield.mobility_apply(F, r, a=0.9, eta=1.3, wall=True,
                                grid=(5, 5, 2), p=p)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < tol


@pytest.mark.medium
def test_config_backend_dispatch_matches_exact():
    """farfield_grid routes both apply-fn entry points to the proxy grid."""
    from rigid_body_light_tpu import SimulationConfig
    from rigid_body_light_tpu.ops import saddle as sad

    rng = np.random.default_rng(21)
    n = 900
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 25, n), rng.uniform(0, 25, n),
        rng.uniform(0.9, 5.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    cfg = SimulationConfig(a=0.9, eta=1.3, wall=True, dtype=jnp.float64,
                           farfield_grid=(4, 4, 2), farfield_p=6)
    U = sad.mobility_apply_fn(cfg)(F, r)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 1e-3
    # the multi-RHS entry point shares the same implementation
    Fs = jnp.stack([F, 2.0 * F])
    Us = sad.mobility_apply_multi_fn(cfg)(Fs, r)
    assert np.allclose(np.asarray(Us[0]), np.asarray(U))
    assert np.allclose(np.asarray(Us[1]), 2.0 * np.asarray(U))


def test_config_validation():
    from rigid_body_light_tpu import SimulationConfig

    with pytest.raises(ValueError, match="open"):
        SimulationConfig(box=(10.0, 10.0, 10.0), farfield_grid=4)
    with pytest.raises(ValueError, match="triple"):
        SimulationConfig(farfield_grid=(4, 4))
    # JSON-style list is normalized to a hashable tuple (jit-static)
    cfg = SimulationConfig(farfield_grid=[4, 4, 2])
    assert cfg.farfield_grid == (4, 4, 2)
    hash(cfg)


def test_tolerance_mismatch_warns():
    """gmres_tol below the p-level operator error warns (round-3 verdict
    weak item 8); an accuracy-consistent pairing stays silent."""
    from rigid_body_light_tpu import SimulationConfig

    with pytest.warns(UserWarning, match="operator error"):
        SimulationConfig(farfield_grid=4, farfield_p=4, gmres_tol=1e-4)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SimulationConfig(farfield_grid=4, farfield_p=4, gmres_tol=1e-2,
                         max_step_residual=1e-1)
        SimulationConfig(farfield_grid=4, farfield_p=6, gmres_tol=1e-3)


@pytest.mark.medium
def test_stepper_on_farfield_backend():
    """Full solve + stochastic step run on the proxy-grid operator and
    agree with the exact backend at the interpolation tolerance."""
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu.dynamics import stochastic_step
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb = load_structure("shell_N_12")
    rng = np.random.default_rng(3)
    X = rng.uniform(0, 18, (8, 3)) + [0, 0, 4.0]
    Q = rng.standard_normal((8, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(X, Q, dtype=jnp.float64)
    F = jnp.tile(jnp.asarray([0.0, 0, -1.0, 0, 0, 0], jnp.float64), (8, 1))
    kw = dict(a=params["sep"] / 2, dt=0.05, dtype=jnp.float64,
              gmres_tol=1e-9, lanczos_iters=20)
    cfg_ff = SimulationConfig(farfield_grid=(3, 3, 3), farfield_p=6, **kw)
    cfg_ex = SimulationConfig(**kw)
    # deterministic (kBT=0): displacement matches the exact backend
    s_ff, aux = stochastic_step(geom, cfg_ff, state, jax.random.key(0), F)
    s_ex, _ = stochastic_step(geom, cfg_ex, state, jax.random.key(0), F)
    dx_ff = np.asarray(s_ff.X - state.X)
    dx_ex = np.asarray(s_ex.X - state.X)
    assert float(aux.residual) < 1e-9
    assert np.abs(dx_ff - dx_ex).max() / np.abs(dx_ex).max() < 1e-2
    # stochastic step: runs, finite, accepted
    cfg_kt = dataclasses.replace(cfg_ff, kBT=0.5)
    s_kt, aux_kt = stochastic_step(geom, cfg_kt, state, jax.random.key(1), F)
    assert np.isfinite(np.asarray(s_kt.X)).all()
    # the move was accepted (an overflow/rejection would freeze the state)
    assert np.abs(np.asarray(s_kt.X - state.X)).max() > 1e-6


@pytest.mark.parametrize("p,tol", [
    (4, 5e-3), pytest.param(6, 5e-4, marks=pytest.mark.medium),
])
def test_polydisperse_matches_exact_sweep(cloud, p, tol):
    """Radius-split kernel lattices (K₀ + (âᵢ²+âⱼ²)K₂) vs the exact
    polydisperse sweep (rpy._free_coeffs_poly)."""
    r, F = cloud
    rng = np.random.default_rng(17)
    n = r.shape[0]
    radii = jnp.asarray(rng.choice([0.6, 0.9, 1.4], n), jnp.float64)
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    U_ref = rpy.mobility_apply(F64, r64, a=0.9, eta=1.3, radii=radii)
    U = farfield.mobility_apply(F64, r64, a=0.9, eta=1.3, grid=4, p=p,
                                radii=radii)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < tol


@pytest.mark.parametrize("p,tol", [
    (4, 8e-3), pytest.param(6, 8e-4, marks=pytest.mark.medium),
])
def test_polydisperse_wall_matches_exact_sweep(p, tol):
    """Wall image kernels split by 1/R power: G₀ + âᵢâⱼ·G₁ + (âᵢâⱼ)²·G₂
    in the geometric-mean a_eff convention of the exact sweep."""
    rng = np.random.default_rng(19)
    n = 1200
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 30, n), rng.uniform(0, 30, n),
        rng.uniform(1.2, 6.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.7, 0.9, 1.2], n), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True, radii=radii)
    U = farfield.mobility_apply(F, r, a=0.9, eta=1.3, wall=True,
                                grid=(5, 5, 2), p=p, radii=radii)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < tol


@pytest.mark.medium
def test_polydisperse_symmetry(cloud):
    """M must stay symmetric with unequal radii (wall on)."""
    rng = np.random.default_rng(23)
    n = 800
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 20, n), rng.uniform(0, 20, n),
        rng.uniform(1.0, 5.0, n)]), jnp.float64)
    radii = jnp.asarray(rng.uniform(0.6, 1.3, n), jnp.float64)
    F1 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    F2 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    kw = dict(a=0.9, wall=True, grid=(4, 4, 2), p=4, radii=radii)
    U1 = farfield.mobility_apply(F1, r, **kw)
    U2 = farfield.mobility_apply(F2, r, **kw)
    s1, s2 = float(jnp.vdot(F2, U1)), float(jnp.vdot(F1, U2))
    assert abs(s1 - s2) / abs(s1) < 1e-12


@pytest.mark.medium
def test_polydisperse_equal_radii_reduces_to_mono(cloud):
    """radii = a everywhere must agree with the monodisperse path to
    interpolation-difference tolerance (different kernel regularization)."""
    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    n = r.shape[0]
    U_m = farfield.mobility_apply(F64, r64, a=0.9, grid=4, p=6)
    U_p = farfield.mobility_apply(F64, r64, a=0.9, grid=4, p=6,
                                  radii=jnp.full((n,), 0.9, jnp.float64))
    assert float(jnp.abs(U_p - U_m).max() / jnp.abs(U_m).max()) < 1e-10


@pytest.mark.medium
def test_config_backend_dispatch_polydisperse():
    """farfield_grid + per-blob radii routes through the proxy grid."""
    from rigid_body_light_tpu import SimulationConfig
    from rigid_body_light_tpu.ops import saddle as sad

    rng = np.random.default_rng(29)
    n = 900
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 25, n), rng.uniform(0, 25, n),
        rng.uniform(1.0, 5.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.7, 1.1], n), jnp.float64)
    cfg = SimulationConfig(a=0.9, eta=1.3, wall=True, dtype=jnp.float64,
                           farfield_grid=(4, 4, 2), farfield_p=6)
    U = sad.mobility_apply_fn(cfg, radii=radii)(F, r)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True, radii=radii)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 2e-3


@pytest.mark.medium
def test_gradients_flow_through_farfield():
    """The proxy-grid operator is plain XLA (FFT/einsum/segment_sum), so
    reverse-mode AD must work and match finite differences of the scalar
    F·M(r)F through both forces and positions."""
    rng = np.random.default_rng(31)
    n = 300
    r = jnp.asarray(rng.uniform(0, 12, (n, 3)), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)

    def energy(F_, r_):
        U = farfield.mobility_apply(F_, r_, a=0.9, grid=3, p=4)
        return jnp.vdot(F_, U)

    gF, gr = jax.grad(energy, argnums=(0, 1))(F, r)
    assert bool(jnp.isfinite(gF).all()) and bool(jnp.isfinite(gr).all())
    # E = FᵀMF with M symmetric → dE/dF = 2MF
    U = farfield.mobility_apply(F, r, a=0.9, grid=3, p=4)
    assert float(jnp.abs(gF - 2.0 * U).max() / jnp.abs(U).max()) < 1e-10
    # directional FD check on positions
    v = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    eps = 1e-6
    fd = (energy(F, r + eps * v) - energy(F, r - eps * v)) / (2 * eps)
    an = float(jnp.vdot(gr, v))
    assert abs(fd - an) / max(abs(fd), 1e-12) < 1e-5


@pytest.mark.slow
def test_mixture_step_on_farfield_backend():
    """Two-species mixture with unequal blob radii stepping on the
    proxy-grid backend agrees with the exact backend (kBT=0)."""
    from rigid_body_light_tpu import SimulationConfig, load_structure
    from rigid_body_light_tpu import multi
    from rigid_body_light_tpu.state import make_state

    pa, ca = load_structure("shell_N_12")
    pb, cb = load_structure("shell_N_42")
    rng = np.random.default_rng(33)
    Xa = rng.uniform(0, 16, (4, 3)) + [0, 0, 5.0]
    Xb = rng.uniform(0, 16, (3, 3)) + [0, 0, 9.0]
    qa = np.tile([1.0, 0, 0, 0], (4, 1))
    qb = np.tile([1.0, 0, 0, 0], (3, 1))
    a = pa["sep"] / 2
    kw = dict(a=a, dt=0.02, dtype=jnp.float64, gmres_tol=1e-9,
              wall=True)
    mgeom = multi.MultiGeometry.create([ca, cb], dtype=jnp.float64,
                                       radii=(None, 1.4 * a))
    states = [make_state(Xa, qa, dtype=jnp.float64),
              make_state(Xb, qb, dtype=jnp.float64)]
    F = [jnp.tile(jnp.asarray([0.0, 0, -1, 0, 0, 0], jnp.float64), (4, 1)),
         jnp.tile(jnp.asarray([0.0, 0, -1, 0, 0, 0], jnp.float64), (3, 1))]
    cfg_ff = SimulationConfig(farfield_grid=(3, 3, 2), farfield_p=6, **kw)
    cfg_ex = SimulationConfig(**kw)
    s_ff, aux_ff = multi.stochastic_step_multi(
        mgeom, cfg_ff, states, jax.random.key(0), F)
    s_ex, _ = multi.stochastic_step_multi(
        mgeom, cfg_ex, states, jax.random.key(0), F)
    assert float(aux_ff.residual) < 1e-8
    for sf, se, s0 in zip(s_ff, s_ex, states):
        dxf = np.asarray(sf.X - s0.X)
        dxe = np.asarray(se.X - s0.X)
        assert np.abs(dxf - dxe).max() / np.abs(dxe).max() < 1e-2


def test_wall_symmetry():
    rng = np.random.default_rng(13)
    n = 800
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 20, n), rng.uniform(0, 20, n),
        rng.uniform(1.0, 5.0, n)]), jnp.float64)
    F1 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    F2 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    U1 = farfield.mobility_apply(F1, r, a=0.9, wall=True, grid=(4, 4, 2), p=4)
    U2 = farfield.mobility_apply(F2, r, a=0.9, wall=True, grid=(4, 4, 2), p=4)
    s1, s2 = float(jnp.vdot(F2, U1)), float(jnp.vdot(F1, U2))
    assert abs(s1 - s2) / abs(s1) < 1e-12


def test_prepare_ctx_matches_direct_apply(cloud):
    """mobility_apply(ctx=prepare(r)) is bit-identical to the ctx-free
    call — the hoisted setup must be the SAME computation, just moved."""
    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    kw = dict(a=0.9, eta=1.3, grid=4, p=4)
    U_direct = farfield.mobility_apply(F64, r64, **kw)
    ctx = farfield.prepare(r64, **kw)
    U_ctx = farfield.mobility_apply(F64, r64, ctx=ctx, **kw)
    assert float(jnp.abs(U_ctx - U_direct).max()) == 0.0


def test_hoist_positions_binds_and_passes_through(cloud):
    """saddle.hoist_positions: far-field operators get a bound ctx that
    reproduces the unbound apply; operators without .prepare pass
    through unchanged."""
    from rigid_body_light_tpu.config import SimulationConfig
    from rigid_body_light_tpu.ops import saddle

    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    cfg = SimulationConfig(a=0.9, eta=1.3, dtype=jnp.float64,
                           farfield_grid=4, farfield_p=4)
    mob = saddle.mobility_apply_fn(cfg)
    bound = saddle.hoist_positions(mob, r64)
    assert float(jnp.abs(bound(F64, r64) - mob(F64, r64)).max()) == 0.0

    cfg_dense = SimulationConfig(a=0.9, eta=1.3, dtype=jnp.float64)
    mob_dense = saddle.mobility_apply_fn(cfg_dense)
    assert saddle.hoist_positions(mob_dense, r64) is mob_dense
    assert saddle.pin_geometry(mob_dense, r64) is mob_dense


def test_pin_geometry_reuses_lattices_across_nearby_positions(cloud):
    """pin_geometry: applying at positions displaced by a small fraction
    of a cell under the pinned geometry tier must stay at the operator's
    own interpolation accuracy (the stepper reuses one lattice build
    across noise/RFD/midpoint position sets)."""
    from rigid_body_light_tpu.config import SimulationConfig
    from rigid_body_light_tpu.ops import saddle

    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    cfg = SimulationConfig(a=0.9, eta=1.3, dtype=jnp.float64,
                           farfield_grid=4, farfield_p=4)
    mob = saddle.mobility_apply_fn(cfg)
    pinned = saddle.pin_geometry(mob, r64)
    # at the pinning positions: identical to a fresh prepare
    assert float(jnp.abs(pinned(F64, r64) - mob(F64, r64)).max()) == 0.0
    # displaced by ~1e-3 cells (RFD deltas / one dt of drift scale)
    r2 = r64 + 1e-3 * jnp.asarray(
        np.random.default_rng(3).standard_normal(r.shape), jnp.float64)
    U_pin = pinned(F64, r2)
    U_fresh = mob(F64, r2)
    # a fresh prepare re-fits the bounding box, moving a few boundary
    # pairs between the exact-near and interpolated-far treatments — the
    # pinned result must agree within the operator's own p=4 accuracy,
    # far below it in practice (measured ~1e-4 here)
    err = float(jnp.abs(U_pin - U_fresh).max() / jnp.abs(U_fresh).max())
    assert err < 1e-3
    # and the exact near part still tracks the dense sweep at p=4 accuracy
    U_ref = rpy.mobility_apply(F64, r2, a=0.9, eta=1.3, wall=False)
    rel = float(jnp.abs(U_pin - U_ref).max() / jnp.abs(U_ref).max())
    assert rel < 3e-3


# ------------------------------------------------------- band tier (round 5)
# farfield_band_p: cell offsets with ∞-norm in [2, 3] re-evaluated at high
# order as a direct banded block convolution while the FFT tier is masked
# to offsets ≥ 4 — p=6-class operator error at p=4 lattice cost
# (ops/farfield.py band-tier section).


def test_band_validation():
    from rigid_body_light_tpu import SimulationConfig

    with pytest.raises(ValueError, match="band_p"):
        farfield.mobility_apply(jnp.zeros((8, 3)), jnp.zeros((8, 3)),
                                grid=4, p=3, band_p=2)
    with pytest.raises(ValueError, match="pseudo-2D"):
        farfield.prepare(jnp.ones((8, 3)), wall=True, grid=(3, 3, 2), p=3,
                         band_p=4, box=(10.0, 10.0))
    # config plumbing: the two-tier accuracy estimate feeds the
    # tolerance-mismatch warning (p=4+band6 ≈ p=6-class → 1e-3 is fine)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SimulationConfig(farfield_grid=4, farfield_p=4, farfield_band_p=6,
                         gmres_tol=1e-3)
    with pytest.warns(UserWarning, match="operator error"):
        SimulationConfig(farfield_grid=4, farfield_p=4, farfield_band_p=6,
                         gmres_tol=1e-5)


def test_band_tier_tightens_free(cloud):
    """The p=3 operator error is dominated by the closest non-adjacent
    cells; re-evaluating offsets 2..3 at band_p=5 must cut it several-fold
    (measured: ~2e-2 → ~1.5e-3)."""
    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F64 = jnp.asarray(F[0], jnp.float64)
    U_ref = rpy.mobility_apply(F64, r64, a=0.9, eta=1.3, wall=False)
    kw = dict(a=0.9, eta=1.3, grid=5, p=3)
    scale = float(jnp.abs(U_ref).max())
    e_base = float(jnp.abs(farfield.mobility_apply(F64, r64, **kw)
                           - U_ref).max()) / scale
    e_band = float(jnp.abs(farfield.mobility_apply(F64, r64, band_p=5, **kw)
                           - U_ref).max()) / scale
    assert e_band < e_base / 4
    assert e_band < 3e-3


def test_band_symmetry_multi_rhs_and_ctx(cloud):
    """Band-tier operator stays symmetric (shared P-basis both sides),
    multi-RHS rides the same moment batch, and the prepared ctx is the
    identical computation hoisted."""
    r, F = cloud
    r64 = jnp.asarray(r, jnp.float64)
    F1 = jnp.asarray(F[0], jnp.float64)
    F2 = jnp.asarray(F[1], jnp.float64)
    kw = dict(a=0.9, eta=1.3, grid=5, p=3, band_p=4)
    U1 = farfield.mobility_apply(F1, r64, **kw)
    U2 = farfield.mobility_apply(F2, r64, **kw)
    s1, s2 = float(jnp.vdot(F2, U1)), float(jnp.vdot(F1, U2))
    assert abs(s1 - s2) / abs(s1) < 1e-12
    Um = farfield.mobility_apply(jnp.stack([F1, F2]), r64, **kw)
    assert float(jnp.abs(Um[0] - U1).max()) < 1e-13
    assert float(jnp.abs(Um[1] - U2).max()) < 1e-13
    ctx = farfield.prepare(r64, **kw)
    U_ctx = farfield.mobility_apply(F1, r64, ctx=ctx, **kw)
    assert float(jnp.abs(U_ctx - U1).max()) == 0.0


@pytest.mark.medium
def test_band_wall_matches_exact_sweep():
    """Wall band tier: p=4+band6 reaches p=6-class accuracy (vs p=4's
    5e-3) against the exact Swan–Brady sweep."""
    rng = np.random.default_rng(11)
    n = 1200
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 30, n), rng.uniform(0, 30, n),
        rng.uniform(0.9, 12.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True)
    U = farfield.mobility_apply(F, r, a=0.9, eta=1.3, wall=True,
                                grid=(5, 5, 2), p=4, band_p=6)
    err = float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max())
    assert err < 8e-4


@pytest.mark.medium
def test_band_polydisperse_wall_matches_exact_sweep():
    """Polydisperse wall band tier (radius-split band blocks ride the
    same moment channels as the FFT tier)."""
    rng = np.random.default_rng(5)
    n = 1000
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 28, n), rng.uniform(0, 28, n),
        rng.uniform(1.2, 12.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.7, 1.15], n), jnp.float64)
    U_ref = rpy.mobility_apply(F, r, a=0.9, eta=1.3, wall=True, radii=radii)
    e4 = float(jnp.abs(farfield.mobility_apply(
        F, r, a=0.9, eta=1.3, wall=True, grid=(5, 5, 2), p=4, radii=radii)
        - U_ref).max() / jnp.abs(U_ref).max())
    e_band = float(jnp.abs(farfield.mobility_apply(
        F, r, a=0.9, eta=1.3, wall=True, grid=(5, 5, 2), p=4, band_p=6,
        radii=radii) - U_ref).max() / jnp.abs(U_ref).max())
    assert e_band < e4 / 3
    assert e_band < 1.5e-3


@pytest.mark.medium
def test_band_config_dispatch_matches_direct():
    """cfg.farfield_band_p routes through saddle.mobility_apply_fn to the
    same operator as the direct band call (machine-identical)."""
    from rigid_body_light_tpu import SimulationConfig
    from rigid_body_light_tpu.ops import saddle as sad

    rng = np.random.default_rng(23)
    n = 900
    r = jnp.asarray(np.column_stack([
        rng.uniform(0, 25, n), rng.uniform(0, 25, n),
        rng.uniform(0.9, 8.0, n)]), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    cfg = SimulationConfig(a=0.9, eta=1.3, wall=True, dtype=jnp.float64,
                           farfield_grid=(4, 4, 2), farfield_p=4,
                           farfield_band_p=5, gmres_tol=1e-2,
                           max_step_residual=1e-1)
    U = sad.mobility_apply_fn(cfg)(F, r)
    U_direct = farfield.mobility_apply(F, r, a=0.9, eta=1.3, wall=True,
                                       grid=(4, 4, 2), p=4, band_p=5)
    assert float(jnp.abs(U - U_direct).max()) == 0.0
