"""Sorted-tile balanced-splitting Ewald (ops/ewald_cells.py).

Correctness anchors: the tile sweep must reproduce the rc-masked
all-pairs sweep exactly (same scalars, same pair set), and the balanced
split must agree with the classic min(L)/2 split on the FULL mobility to
the shared truncation tolerance — real and wave parts shift against each
other, so agreement validates the whole pipeline (tiles, adjacency,
ξ choice, k-lattice growth, chunked wave sum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu import SimulationConfig
from rigid_body_light_tpu.ops import ewald, ewald_cells, saddle


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(5)
    box = (10.0, 12.0, 9.0)
    # positions deliberately outside [0, L) — binning must fold them
    r = rng.uniform(-5, 15, (900, 3))
    F = rng.standard_normal((2, 900, 3))
    return box, r, F


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-6),
                                       (jnp.float64, 1e-13)])
def test_cells_match_allpairs(cloud, dtype, tol):
    box, r, F = cloud
    params = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    r = jnp.asarray(r, dtype)
    F = jnp.asarray(F, dtype)
    U_ref = ewald.real_space_apply(F, r, params)
    U_c = ewald_cells.real_space_apply_cells(F, r, params)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U_c - U_ref).max()) / scale < tol
    U1 = ewald_cells.real_space_apply_cells(F[0], r, params)
    assert float(jnp.abs(U1 - U_ref[0]).max()) / scale < tol


def test_balanced_split_matches_classic(cloud):
    box, r, F = cloud
    params_c = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    params_0 = ewald.make_params(box, 0.3, tol=1e-5)
    assert params_c.xi > params_0.xi
    assert len(params_c.kvecs) > len(params_0.kvecs)
    r64 = jnp.asarray(r[:300], jnp.float64)
    F64 = jnp.asarray(F[0, :300], jnp.float64)
    U_c = ewald.mobility_apply(F64, r64, params_c)
    U_0 = ewald.mobility_apply(F64, r64, params_0)
    err = float(jnp.abs(U_c - U_0).max() / jnp.abs(U_0).max())
    assert err < 5e-5  # both splits truncate at tol=1e-5


def test_wave_chunked_matches_dense(cloud):
    box, r, F = cloud
    params = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    r64 = jnp.asarray(r[:200], jnp.float64)
    F64 = jnp.asarray(F[0, :200], jnp.float64)
    U_d = ewald._wave_space_dense(F64, r64, params)
    U_ch = ewald._wave_space_chunked(F64, r64, params, kc=1000)
    assert float(jnp.abs(U_ch - U_d).max() / jnp.abs(U_d).max()) < 1e-12


def test_overflow_poisons_with_nan(cloud):
    box, r, _ = cloud
    params = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    # every tile is adjacent to every other at this density; max_nbr=1
    # must overflow and poison rather than silently truncate
    U = ewald_cells.real_space_apply_cells(
        jnp.ones((900, 3)), jnp.asarray(r), params, max_nbr=1)
    assert bool(jnp.isnan(U).any())


def test_clustered_bodies_do_not_overflow(cloud):
    """The failure mode that killed the uniform-cell design: one rigid
    body's blobs all landing in one cell.  Equal-population tiles must
    handle a tight 500-blob cluster with the AUTO neighbor width."""
    box, _, _ = cloud
    params = ewald.make_params(box, 0.04, tol=1e-5, rc=2.5)
    rng = np.random.default_rng(2)
    cluster = 5.0 + 0.4 * rng.standard_normal((500, 3))
    sparse = rng.uniform(0, 9, (200, 3))
    r = jnp.asarray(np.concatenate([cluster, sparse]))
    F = jnp.asarray(rng.standard_normal((700, 3)))
    U = ewald_cells.real_space_apply_cells(F, r, params)
    assert bool(jnp.isfinite(U).all())
    U_ref = ewald.real_space_apply(F, r, params)
    assert float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max()) < 1e-12


def test_config_dispatch_and_validation(cloud):
    box, r, F = cloud
    cfg = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_rc=2.5,
                           ewald_tol=1e-5, dtype=jnp.float64)
    fn = saddle.mobility_apply_fn(cfg)
    cfg0 = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_tol=1e-5,
                            dtype=jnp.float64)
    fn0 = saddle.mobility_apply_fn(cfg0)
    r64 = jnp.asarray(r[:200] % 9.0, jnp.float64)
    F64 = jnp.asarray(F[0, :200], jnp.float64)
    U = fn(F64, r64)
    U0 = fn0(F64, r64)
    assert float(jnp.abs(U - U0).max() / jnp.abs(U0).max()) < 5e-5

    with pytest.raises(ValueError, match="not both"):
        SimulationConfig(a=0.3, dt=0.01, box=box, ewald_rc=2.5, ewald_xi=1.0)
    with pytest.raises(ValueError, match="3-D"):
        SimulationConfig(a=0.3, dt=0.01, ewald_rc=2.5)
    with pytest.raises(ValueError, match="rc"):
        ewald.make_params(box, 0.3, rc=0.5)  # below 2a


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-6),
                                       (jnp.float64, 1e-13)])
def test_cells_polydisperse_match_allpairs(cloud, dtype, tol):
    """Per-blob radii through the tile sweep: identical pair set and
    species-pair scalars as the rc-masked all-pairs polydisperse sweep."""
    box, r, F = cloud
    params = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    rng = np.random.default_rng(7)
    radii = jnp.asarray(rng.choice([0.2, 0.3, 0.45], size=900), dtype)
    r = jnp.asarray(r, dtype)
    F = jnp.asarray(F, dtype)
    U_ref = ewald.real_space_apply(F, r, params, radii=radii)
    U_c = ewald_cells.real_space_apply_cells(F, r, params, radii=radii)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U_c - U_ref).max()) / scale < tol
    U1 = ewald_cells.real_space_apply_cells(F[0], r, params, radii=radii)
    assert float(jnp.abs(U1 - U_ref[0]).max()) / scale < tol


def test_config_dispatch_polydisperse(cloud):
    """ewald_rc + radii: the config-built balanced-split polydisperse
    operator agrees with the classic-split polydisperse operator at the
    shared truncation tolerance (the round-4 'monodisperse only' gate is
    lifted)."""
    box, r, F = cloud
    rng = np.random.default_rng(9)
    radii = jnp.asarray(rng.choice([0.25, 0.3, 0.4], size=200),
                        jnp.float64)
    cfg = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_rc=2.5,
                           ewald_tol=1e-5, dtype=jnp.float64)
    cfg0 = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_tol=1e-5,
                            dtype=jnp.float64)
    fn = saddle.mobility_apply_fn(cfg, radii=radii)
    fn0 = saddle.mobility_apply_fn(cfg0, radii=radii)
    r64 = jnp.asarray(r[:200] % 9.0, jnp.float64)
    F64 = jnp.asarray(F[0, :200], jnp.float64)
    U = fn(F64, r64)
    U0 = fn0(F64, r64)
    assert float(jnp.abs(U - U0).max() / jnp.abs(U0).max()) < 5e-5
