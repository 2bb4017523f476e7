"""Observables: MSD of a synthetic random walk, orientation decorrelation,
diffusion-coefficient fit, pair distribution of an ideal gas."""

import numpy as np

from rigid_body_light_tpu import analysis


def test_msd_random_walk():
    rng = np.random.default_rng(0)
    T, B, D = 2000, 8, 0.25
    dt = 1.0
    steps = rng.normal(0, np.sqrt(2 * D * dt), (T, B, 3))
    X = np.cumsum(steps, axis=0)
    lags, m = analysis.msd(X, max_lag=50)
    # MSD per axis = 2 D t
    expected = 2 * D * lags[:, None] * dt
    assert np.allclose(m, expected, rtol=0.15)
    D_fit = analysis.diffusion_coefficient(X, dt, max_lag=50)
    assert abs(D_fit - D) / D < 0.1


def test_orientation_correlation_identity():
    Q = np.tile([1.0, 0, 0, 0], (100, 4, 1))
    lags, C = analysis.orientation_correlation(Q, max_lag=10)
    assert np.allclose(C, 1.0)
    # double-cover: flipping quaternion sign must not change C
    Q2 = Q.copy()
    Q2[::2] *= -1
    _, C2 = analysis.orientation_correlation(Q2, max_lag=10)
    assert np.allclose(C2, 1.0)


def test_pair_distribution_ideal_gas():
    rng = np.random.default_rng(1)
    # uniform points in a box — g(r) ≈ const at small r (far from edges)
    X = rng.uniform(0, 20, (40, 64, 3))
    r, g = analysis.pair_distribution(X, r_max=3.0, bins=10)
    assert np.isfinite(g).all()
    assert g.min() > 0


def test_height_histogram():
    rng = np.random.default_rng(2)
    X = rng.uniform([0, 0, 1], [5, 5, 3], (10, 50, 3))
    z, rho = analysis.height_histogram(X, bins=20)
    assert abs(np.trapezoid(rho, z) - 1.0) < 0.05
    assert (z > 0.9).all() and (z < 3.1).all()


def test_pair_distribution_wraps_with_box():
    """Periodic trajectories keep unwrapped coordinates; g(r) with box=
    must see the through-boundary neighbor at its wrapped distance."""
    # two bodies 0.5 apart across the x boundary of a (10, 10) box
    X = np.array([[[0.2, 5.0, 2.0], [9.7, 5.0, 2.0]]])
    r_open, g_open = analysis.pair_distribution(X, r_max=2.0, bins=10)
    r_box, g_box = analysis.pair_distribution(X, r_max=2.0, bins=10,
                                              box=(10.0, 10.0))
    assert g_open.sum() == 0.0          # 9.5 apart: outside r_max
    assert g_box[r_box < 1.0].sum() > 0  # wrapped: 0.5 apart
