"""Polydisperse (unequal blob radii) RPY — ops-level and mixture-level.

The reference hardcodes ONE blob radius (``setParameters``,
``c_rigid_obj.cpp:31-83,183``).  The generalization here follows Zuk,
Wajnryb, Mizerski & Szymczak (J. Fluid Mech. 741 (2014) R5): all three
branches (far field, overlap, full engulfment), validated against an
independent oracle, plus per-blob self/wall/damping terms and species-level
wiring through the mixture stack.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_light_tpu import SimulationConfig, load_structure, multi
from rigid_body_light_tpu.ops import rpy, rpy_pallas
from rigid_body_light_tpu.state import make_state


def _zuk_pair(ri, rj, ai, aj, eta=1.0):
    """Independent dense 3x3 pair oracle (physical units)."""
    d = np.asarray(ri, float) - np.asarray(rj, float)
    r = np.linalg.norm(d)
    e = d / r
    if r >= ai + aj:
        al = (1 + (ai * ai + aj * aj) / (3 * r * r)) / (8 * np.pi * eta * r)
        be = (1 - (ai * ai + aj * aj) / (r * r)) / (8 * np.pi * eta * r)
        return al * np.eye(3) + be * np.outer(e, e)
    if r > abs(ai - aj):
        c1 = (16 * r**3 * (ai + aj) - ((ai - aj) ** 2 + 3 * r**2) ** 2) / (
            32 * r**3)
        c2 = 3 * ((ai - aj) ** 2 - r**2) ** 2 / (32 * r**3)
        return (c1 * np.eye(3) + c2 * np.outer(e, e)) / (
            6 * np.pi * eta * ai * aj)
    return np.eye(3) / (6 * np.pi * eta * max(ai, aj))


def _random_config(n=24, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.0, 6.0, (n, 3)) + np.array([0, 0, 1.0])
    radii = rng.uniform(0.2, 0.8, (n,))
    F = rng.standard_normal((n, 3))
    return r, radii, F


def test_poly_dense_matches_zuk_oracle():
    r, radii, _ = _random_config()
    n = len(radii)
    M = np.asarray(rpy.mobility_matrix(
        jnp.asarray(r), a=0.4, wall=False, radii=jnp.asarray(radii)))
    for i in range(n):
        for j in range(n):
            blk = M[3 * i:3 * i + 3, 3 * j:3 * j + 3]
            if i == j:
                ref = np.eye(3) / (6 * np.pi * radii[i])
            else:
                ref = _zuk_pair(r[i], r[j], radii[i], radii[j])
            np.testing.assert_allclose(blk, ref, rtol=1e-12, atol=1e-14)


def test_poly_overlap_branches_spd_and_symmetric():
    # touching, overlapping and fully-engulfed pairs
    r = jnp.asarray([[0, 0, 2.0], [0.3, 0, 2.0], [0.01, 0, 2.0],
                     [5.0, 0, 2.0]], jnp.float64)
    radii = jnp.asarray([0.5, 0.3, 0.05, 0.4], jnp.float64)
    for wall in (False, True):
        M = np.asarray(rpy.mobility_matrix(r, a=0.4, wall=wall, radii=radii))
        np.testing.assert_allclose(M, M.T, atol=1e-14)
        assert np.linalg.eigvalsh((M + M.T) / 2).min() > 0


@pytest.mark.parametrize("wall", [False, True])
def test_equal_radii_array_reduces_to_monodisperse(wall):
    r, _, F = _random_config(seed=1)
    a = 0.4
    eq = jnp.full((len(r),), a)
    U0 = rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r), a=a, wall=wall)
    U1 = rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r), a=a, wall=wall,
                            radii=eq)
    np.testing.assert_allclose(np.asarray(U0), np.asarray(U1), atol=1e-14)


@pytest.mark.parametrize("wall", [False, True])
def test_poly_streamed_matches_dense(wall):
    r, radii, F = _random_config(seed=2)
    Up = rpy.mobility_apply(jnp.asarray(F), jnp.asarray(r), a=0.4, wall=wall,
                            radii=jnp.asarray(radii))
    Ud = rpy.apply_M_dense(jnp.asarray(F), jnp.asarray(r), a=0.4, wall=wall,
                           radii=jnp.asarray(radii))
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Ud), atol=1e-13)


@pytest.mark.parametrize("wall", [False, True])
def test_poly_pallas_interpret_matches_xla(wall):
    r, radii, F = _random_config(seed=3)
    r32 = jnp.asarray(r, jnp.float32)
    rad32 = jnp.asarray(radii, jnp.float32)
    F32 = jnp.asarray(F, jnp.float32)
    Up = rpy_pallas.mobility_apply(F32, r32, a=0.4, wall=wall, radii=rad32,
                                   interpret=True)
    Ux = rpy.mobility_apply(F32, r32, a=0.4, wall=wall, radii=rad32)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Ux), rtol=3e-5,
                               atol=1e-6)
    # fused 2-RHS route (ordered kernel)
    Fs = jnp.stack([F32, 2 * F32])
    Um = rpy_pallas.mobility_apply_multi(Fs, r32, a=0.4, wall=wall,
                                         radii=rad32, interpret=True)
    Ux2 = rpy.mobility_apply_multi(Fs, r32, a=0.4, wall=wall, radii=rad32)
    np.testing.assert_allclose(np.asarray(Um), np.asarray(Ux2), rtol=3e-5,
                               atol=1e-6)


def test_stokes_drag_two_radii():
    """Two isolated blobs of different radii in one sweep: U = F/(6πη aᵢ)."""
    r = jnp.asarray([[0.0, 0, 0], [500.0, 0, 0]], jnp.float64)
    radii = jnp.asarray([0.25, 1.0], jnp.float64)
    F = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float64)
    U = np.asarray(rpy.mobility_apply(F, r, a=0.5, wall=False, radii=radii))
    for i, ai in enumerate(np.asarray(radii)):
        np.testing.assert_allclose(-U[i, 2], 1.0 / (6 * np.pi * ai),
                                   rtol=3e-3)  # far-field coupling ~ 1/500


@pytest.mark.medium
def test_mixture_with_species_radii_runs_and_reduces():
    """Two-species mixture: same-radius mixture == monodisperse mixture;
    a distinct-radius mixture runs the full stochastic step finite, and its
    mobility solve matches a dense poly oracle solve."""
    params, cfgb = load_structure("shell_N_12")
    a = params["sep"] / 2
    cfg = SimulationConfig(a=a, dt=0.01, kBT=0.7, wall=True,
                           dtype=jnp.float64, lanczos_iters=8,
                           use_pallas=False, gmres_tol=1e-7,
                           pc_mode="block_free")
    states = (
        make_state([[0.0, 0, 2.0], [4.0, 0, 2.2]],
                   np.tile([1.0, 0, 0, 0], (2, 1)), dtype=jnp.float64),
        make_state([[2.0, 3.0, 2.5]], [[1.0, 0, 0, 0]], dtype=jnp.float64),
    )
    forces = (jnp.zeros((2, 6), jnp.float64).at[:, 2].set(-1.0),
              jnp.zeros((1, 6), jnp.float64).at[:, 2].set(-1.0))

    # same-radius species: explicit radii must change nothing
    m_eq = multi.MultiGeometry.create([cfgb, cfgb * 0.5], dtype=jnp.float64,
                                      radii=[a, a])
    m_none = multi.MultiGeometry.create([cfgb, cfgb * 0.5], dtype=jnp.float64)
    r_eq = multi.solve_saddle_multi(m_eq, cfg, states, None, forces)
    r_none = multi.solve_saddle_multi(m_none, cfg, states, None, forces)
    np.testing.assert_allclose(np.asarray(r_eq.Us[0]),
                               np.asarray(r_none.Us[0]), atol=1e-10)

    # distinct radii: solve converges, velocities differ from equal-radius,
    # and the blob-level operator agrees with the dense poly oracle
    m_poly = multi.MultiGeometry.create([cfgb, cfgb * 0.5], dtype=jnp.float64,
                                        radii=[a, 0.5 * a])
    r_poly = multi.solve_saddle_multi(m_poly, cfg, states, None, forces)
    assert float(r_poly.residual) < 1e-6
    assert not np.allclose(np.asarray(r_poly.Us[1]), np.asarray(r_none.Us[1]))

    opses = multi.geometry_ops_multi(m_poly, states)
    pos = multi.concat_positions(opses)
    radii_arr = multi.blob_radii_multi(m_poly, opses, cfg)
    F = jnp.asarray(np.random.default_rng(0).standard_normal(pos.shape))
    U_stream = multi._mob_fns(m_poly, opses, cfg)[0](F, pos)
    U_dense = rpy.apply_M_dense(F, pos, a=cfg.a, wall=True, radii=radii_arr)
    np.testing.assert_allclose(np.asarray(U_stream), np.asarray(U_dense),
                               atol=1e-12)

    # full stochastic step stays finite and converged
    ss, res = multi.stochastic_step_multi(m_poly, cfg, states,
                                          jax.random.key(0), forces)
    assert float(res.residual) < 1e-6
    for s in ss:
        assert np.isfinite(np.asarray(s.X)).all()


@pytest.mark.parametrize("wall", [False, True])
def test_poly_cross_mobility_blocks_match_dense(wall):
    """cross_mobility_blocks with radii (the mixture-RAS coupling path,
    multi.build_pc_ras_multi) must equal the off-diagonal blocks of the
    dense polydisperse mobility_matrix (damping sandwich stripped — cross
    blocks apply it externally)."""
    rng = np.random.default_rng(0)
    P, Q, a = 5, 7, 0.24
    ri = jnp.asarray(rng.uniform(0.5, 4.0, (P, 3)))
    rj = jnp.asarray(rng.uniform(0.5, 4.0, (Q, 3)))
    ai = jnp.asarray(rng.uniform(0.15, 0.4, (P,)))
    aj = jnp.asarray(rng.uniform(0.15, 0.4, (Q,)))
    C = rpy.cross_mobility_blocks(ri, rj, a, 1.0, wall=wall,
                                  radii_i=ai, radii_j=aj)
    allpos = jnp.concatenate([ri, rj])
    allrad = jnp.concatenate([ai, aj])
    M = rpy.mobility_matrix(allpos, a, 1.0, wall=wall, radii=allrad)
    if wall:
        binv = 1.0 / jnp.repeat(rpy.damping_factors(allpos, a,
                                                    radii=allrad), 3)
        M = binv[:, None] * M * binv[None, :]
    Mij = M[:3 * P, 3 * P:].reshape(P, 3, Q, 3).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(C), np.asarray(Mij), atol=1e-14)
