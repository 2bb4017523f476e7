"""Gridded (PME-style) Ewald wave part (ops/ewald_pme.py).

Correctness anchors: the cell-spectral evaluation must reproduce the
dense k-sum (ewald.wave_space_apply) to the Chebyshev interpolation
accuracy of the plane waves (measured: p=4 ≈ 3e-5, p=6 ≈ 1e-8 relative
— far below the worst-case κ^p bound because the Gaussian-screened
weights crush the large-k modes), the gridded operator must be exactly
symmetric (P2M/L2P share one basis → M_wave = Pᵀ·diag⁺·P), and the full
balanced-split mobility with the grid must agree with the classic split
to the shared truncation tolerance.

Reference counterpart: none — the reference is open-domain O(N²) only
(``c_rigid_obj.cpp:413-459``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu import SimulationConfig
from rigid_body_light_tpu.ops import ewald, ewald_pme, saddle


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(11)
    box = (8.0, 8.5, 9.0)
    # positions deliberately outside [0, L) — folding must handle them
    r = rng.uniform(-4, 12, (300, 3))
    F = rng.standard_normal((2, 300, 3))
    return box, r, F


@pytest.fixture(scope="module")
def params(cloud):
    box, _, _ = cloud
    return ewald.make_params(box, 0.3, eta=1.3, tol=1e-4, rc=3.0)


@pytest.mark.parametrize("p,os,tol", [(4, 1.5, 3e-4), (4, 2.0, 1e-4),
                                      (6, 2.0, 1e-6)])
def test_wave_grid_matches_dense(cloud, params, p, os, tol):
    box, r, F = cloud
    r = jnp.asarray(r)
    F = jnp.asarray(F[0])
    g = ewald_pme.make_grid(params, p=p, oversample=os)
    # oversampled past Nyquist: every bin holds at most one wavevector
    nmax = np.abs(params.nvecs).max(axis=0)
    assert all(gd >= 2 * nm + 2 for gd, nm in zip(g.grid, nmax))
    U_ref = ewald.wave_space_apply(F, r, params)
    U = ewald_pme.wave_space_apply_grid(F, r, params, g)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U - U_ref).max()) / scale < tol


def test_wave_grid_multi_rhs(cloud, params):
    box, r, F = cloud
    r, F = jnp.asarray(r), jnp.asarray(F)
    g = ewald_pme.make_grid(params, p=4)
    U2 = ewald_pme.wave_space_apply_grid(F, r, params, g)
    assert U2.shape == F.shape
    U0 = ewald_pme.wave_space_apply_grid(F[0], r, params, g)
    assert float(jnp.abs(U2[0] - U0).max()) < 1e-12


def test_wave_grid_exactly_symmetric(cloud, params):
    """P2M and L2P share one basis → ⟨y, M_wave x⟩ = ⟨x, M_wave y⟩ to
    roundoff, independent of the interpolation error."""
    box, r, _ = cloud
    rng = np.random.default_rng(3)
    r = jnp.asarray(r)
    x = jnp.asarray(rng.standard_normal((300, 3)))
    y = jnp.asarray(rng.standard_normal((300, 3)))
    g = ewald_pme.make_grid(params, p=3, oversample=1.0)  # coarse on purpose
    Mx = ewald_pme.wave_space_apply_grid(x, r, params, g)
    My = ewald_pme.wave_space_apply_grid(y, r, params, g)
    lhs = float(jnp.vdot(y.ravel(), Mx.ravel()))
    rhs = float(jnp.vdot(x.ravel(), My.ravel()))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)
    # PSD: wk ≥ 0 and transverse projection → x·M_wave·x ≥ 0
    assert float(jnp.vdot(x.ravel(), Mx.ravel())) >= 0.0


def test_full_mobility_grid_matches_classic(cloud):
    """Balanced split + gridded wave ≈ classic split on the FULL mobility
    — real and wave parts shift against each other, so agreement
    validates the whole pipeline at the shared truncation tolerance."""
    box, r, F = cloud
    r, F = jnp.asarray(r), jnp.asarray(F[0])
    params_c = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    params_0 = ewald.make_params(box, 0.3, tol=1e-5)
    g = ewald_pme.make_grid(params_c, p=6)
    U_grid = ewald.mobility_apply(F, r, params_c, grid=g)
    U_ref = ewald.mobility_apply(F, r, params_0)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U_grid - U_ref).max()) / scale < 3e-5
    Um = ewald.mobility_apply_multi(F[None], r, params_c, grid=g)
    assert float(jnp.abs(Um[0] - U_grid).max()) < 1e-12


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-4)])
def test_wave_grid_f32(cloud, params, dtype, tol):
    box, r, F = cloud
    r = jnp.asarray(r, dtype)
    F = jnp.asarray(F[0], dtype)
    g = ewald_pme.make_grid(params, p=4)
    U_ref = ewald.wave_space_apply(F, r, params)
    U = ewald_pme.wave_space_apply_grid(F, r, params, g)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U - U_ref).max()) / scale < tol


@pytest.fixture(scope="module")
def radii(cloud):
    _, r, _ = cloud
    rng = np.random.default_rng(21)
    return rng.choice([0.2, 0.3, 0.45], size=r.shape[0])


@pytest.mark.parametrize("p,tol", [(4, 3e-4), (6, 3e-6)])
def test_wave_grid_polydisperse_matches_dense(cloud, params, radii, p, tol):
    """Species-split grids reproduce the dense polydisperse k-sum
    (per-blob sinc(|k|aᵢ) weights) to interpolation accuracy."""
    box, r, F = cloud
    r = jnp.asarray(r)
    F = jnp.asarray(F[0])
    rad = jnp.asarray(radii)
    g = ewald_pme.make_grid(params, p=p, radii=radii)
    assert g.sinc_bin.shape[0] == 3           # three species
    U_ref = ewald.wave_space_apply(F, r, params, radii=rad)
    U = ewald_pme.wave_space_apply_grid(F, r, params, g)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U - U_ref).max()) / scale < tol
    # multi-RHS consistency
    U2 = ewald_pme.wave_space_apply_grid(F[None], r, params, g)
    assert float(jnp.abs(U2[0] - U).max()) < 1e-12


def test_wave_grid_polydisperse_symmetric(cloud, params, radii):
    """The species sinc weights ride P2M/L2P symmetrically →
    M_wave = Pᵀ·diag⁺·P stays exactly symmetric PSD."""
    box, r, _ = cloud
    rng = np.random.default_rng(4)
    r = jnp.asarray(r)
    x = jnp.asarray(rng.standard_normal(r.shape))
    y = jnp.asarray(rng.standard_normal(r.shape))
    g = ewald_pme.make_grid(params, p=3, oversample=1.0, radii=radii)
    Mx = ewald_pme.wave_space_apply_grid(x, r, params, g)
    My = ewald_pme.wave_space_apply_grid(y, r, params, g)
    lhs = float(jnp.vdot(y.ravel(), Mx.ravel()))
    rhs = float(jnp.vdot(x.ravel(), My.ravel()))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)
    assert float(jnp.vdot(x.ravel(), Mx.ravel())) >= 0.0


def test_full_mobility_grid_polydisperse_matches_classic(cloud, radii):
    """Balanced split + species-split gridded wave ≈ classic-split
    polydisperse operator on the FULL mobility (the whole at-scale
    periodic pipeline is now radius-exact)."""
    box, r, F = cloud
    r, F = jnp.asarray(r), jnp.asarray(F[0])
    rad = jnp.asarray(radii)
    params_c = ewald.make_params(box, 0.3, tol=1e-5, rc=2.5)
    params_0 = ewald.make_params(box, 0.3, tol=1e-5)
    g = ewald_pme.make_grid(params_c, p=6, radii=radii)
    U_grid = ewald.mobility_apply(F, r, params_c, radii=rad, grid=g)
    U_ref = ewald.mobility_apply(F, r, params_0, radii=rad)
    scale = float(jnp.abs(U_ref).max())
    assert float(jnp.abs(U_grid - U_ref).max()) / scale < 5e-5


def test_grid_radii_mismatch_raises(cloud, params, radii):
    box, r, F = cloud
    r, F = jnp.asarray(r), jnp.asarray(F[0])
    g_mono = ewald_pme.make_grid(params, p=4)
    g_poly = ewald_pme.make_grid(params, p=4, radii=radii)
    with pytest.raises(ValueError, match="same radii"):
        ewald.mobility_apply(F, r, params, radii=jnp.asarray(radii),
                             grid=g_mono)
    with pytest.raises(ValueError, match="same radii"):
        ewald.mobility_apply(F, r, params, grid=g_poly)


def test_config_validation():
    with pytest.raises(ValueError, match="ewald_grid_p needs ewald_rc"):
        SimulationConfig(a=1.0, box=(8.0, 8.0, 8.0), ewald_grid_p=4)
    with pytest.raises(ValueError, match="ewald_grid_p must be >= 2"):
        SimulationConfig(a=1.0, box=(8.0, 8.0, 8.0), ewald_rc=3.0,
                         ewald_grid_p=1)
    cfg = SimulationConfig(a=1.0, box=(8.0, 8.0, 8.0), ewald_rc=3.0,
                           ewald_grid_p=4)
    assert cfg.ewald_grid_p == 4


def test_make_grid_validation(params):
    with pytest.raises(ValueError, match="p >= 2"):
        ewald_pme.make_grid(params, p=1)
    with pytest.raises(ValueError, match="oversample"):
        ewald_pme.make_grid(params, p=4, oversample=0.5)
    p0 = params._replace(nvecs=None)
    with pytest.raises(ValueError, match="nvecs"):
        ewald_pme.make_grid(p0, p=4)


def test_config_dispatch(cloud):
    """ewald_rc + ewald_grid_p routes the config-built operator through
    the grid and agrees with the classic split at the shared tolerance."""
    box, r, F = cloud
    cfg = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_rc=2.5,
                           ewald_grid_p=6, ewald_tol=1e-5,
                           dtype=jnp.float64)
    fn = saddle.mobility_apply_fn(cfg)
    cfg0 = SimulationConfig(a=0.3, dt=0.01, box=box, ewald_tol=1e-5,
                            dtype=jnp.float64)
    fn0 = saddle.mobility_apply_fn(cfg0)
    r64 = jnp.asarray(r[:200] % 8.0, jnp.float64)
    F64 = jnp.asarray(F[0, :200], jnp.float64)
    U = fn(F64, r64)
    U0 = fn0(F64, r64)
    assert float(jnp.abs(U - U0).max() / jnp.abs(U0).max()) < 5e-5
    fnm = saddle.mobility_apply_multi_fn(cfg)
    Um = fnm(F64[None], r64)
    assert float(jnp.abs(Um[0] - U).max()) < 1e-12


@pytest.mark.medium
def test_grid_bd_step_runs(cloud):
    """One full fluctuating BD step through the gridded periodic operator
    — converges and stays finite (the production at-scale periodic mode)."""
    import functools

    from rigid_body_light_tpu import load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params_s, cfgb = load_structure("shell_N_12")
    xs = np.array([[2.0, 2.0, 2.0], [5.5, 4.0, 4.5], [3.0, 6.0, 6.5]])
    qs = np.tile([1.0, 0, 0, 0], (3, 1))
    cfg = SimulationConfig(
        a=params_s["sep"] / 2, eta=1.0, dt=0.01, kBT=1.0,
        box=(9.0, 9.0, 9.0), ewald_rc=3.0, ewald_grid_p=4,
        ewald_tol=1e-4, gmres_tol=1e-6, dtype=jnp.float64,
        use_pallas=False, lanczos_iters=20)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(xs, qs, dtype=jnp.float64)
    F = jnp.zeros((3, 6), jnp.float64).at[:, 2].set(-1.0)
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=2, force_fn=lambda s, i: F,
        save_every=1))
    fin, traj = runner(state, jax.random.key(0))
    assert bool(jnp.isfinite(fin.X).all())
    assert float(jnp.asarray(traj["residual"]).max()) < 10 * cfg.gmres_tol
