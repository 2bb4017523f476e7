"""Pallas RPY kernel parity — run in interpreter mode so the kernel logic is
covered on the CPU test mesh (on TPU the compiled kernel is exercised by
bench.py and is *more* accurate than the XLA path, see BENCH_NOTES.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
import jax
from rigid_body_light_tpu.ops import rpy
from rigid_body_light_tpu.ops import rpy_pallas


@pytest.fixture
def cloud():
    rng = np.random.default_rng(7)
    r = rng.uniform([-4, -4, 0.6], [4, 4, 7], (150, 3)).astype(np.float32)
    F = rng.standard_normal((150, 3)).astype(np.float32)
    return r, F


@pytest.mark.parametrize("wall", [False, True])
def test_kernel_parity_interpret(cloud, wall):
    r, F = cloud
    a, eta = 0.9, 1.3
    Uref = oracle.apply_M(F.astype(np.float64), r.astype(np.float64), a, eta, wall).reshape(-1, 3)
    U = np.asarray(
        rpy_pallas.mobility_apply(
            jnp.asarray(F), jnp.asarray(r), a, eta, wall, interpret=True
        )
    )
    scale = np.abs(Uref).max()
    assert np.abs(U - Uref).max() / scale < 5e-6


@pytest.mark.parametrize("wall", [False, True])
def test_slab_matches_square(cloud, wall):
    """Rectangular slab sweep over a row chunk must equal the corresponding
    rows of the square sweep (the sharded-path contract)."""
    r, F = cloud
    r_n = jnp.asarray(r) / 0.9
    F_j = jnp.asarray(F)
    full = rpy_pallas.pair_sum(r_n, F_j, wall, interpret=True)
    lo, hi = 40, 110
    slab = rpy_pallas.pair_sum_slab(
        r_n[lo:hi], lo, r_n, F_j, wall, interpret=True
    )
    assert np.allclose(np.asarray(slab), np.asarray(full)[lo:hi], atol=1e-5)


def test_slab_multi_rhs_matches_single(cloud):
    """(k, N, 3) slab sweep = stacked single-RHS slabs (the distributed
    fused two-draw Lanczos noise contract)."""
    r, F = cloud
    rng = np.random.default_rng(11)
    r_n = jnp.asarray(r) / 0.9
    Fk = jnp.asarray(np.stack([F, rng.standard_normal(F.shape)]), jnp.float32)
    lo, hi = 24, 96
    multi = rpy_pallas.pair_sum_slab(r_n[lo:hi], lo, r_n, Fk, True,
                                     interpret=True)
    for i in range(2):
        single = rpy_pallas.pair_sum_slab(r_n[lo:hi], lo, r_n, Fk[i], True,
                                          interpret=True)
        assert np.allclose(np.asarray(multi[i]), np.asarray(single),
                           atol=1e-5)


@pytest.mark.parametrize("wall", [False, True])
def test_slab_2d_decomposition(cloud, wall):
    """Tiling the pair matrix into row×column blocks with row/col offsets
    must reproduce the square sweep — the 2-D SUMMA sharded-path contract
    (each device computes one block, psum over the column axis)."""
    r, F = cloud
    r_n = jnp.asarray(r) / 0.9
    F_j = jnp.asarray(F)
    full = np.asarray(rpy_pallas.pair_sum(r_n, F_j, wall, interpret=True))
    n = r.shape[0]
    n_pad = 160  # 2 divides; padded tail inert (zero force)
    r_p = jnp.pad(r_n, ((0, n_pad - n), (0, 0)))
    F_p = jnp.pad(F_j, ((0, n_pad - n), (0, 0)))
    h = n_pad // 2
    acc = np.zeros((n_pad, 3), np.float32)
    for bi in range(2):
        for bj in range(2):
            part = rpy_pallas.pair_sum_slab(
                r_p[bi * h : (bi + 1) * h], bi * h,
                r_p[bj * h : (bj + 1) * h], F_p[bj * h : (bj + 1) * h],
                wall, col_offset=bj * h, interpret=True,
            )
            acc[bi * h : (bi + 1) * h] += np.asarray(part)
    # padded rows are dropped by the sharded caller (U_p[:n]) and may carry
    # wall-branch garbage (z=0 image at distance 0) — only valid rows count
    assert np.isfinite(acc[:n]).all()
    assert np.abs(acc[:n] - full).max() / np.abs(full).max() < 1e-5


@pytest.mark.parametrize("wall", [False, True])
@pytest.mark.parametrize("nrhs", [1, 2])
def test_symmetric_kernel_matches_ordered(cloud, wall, nrhs):
    """The unordered-pair (symmetric) sweep must reproduce the ordered sweep
    exactly (same math, each strict-upper tile applied forward + transposed);
    ragged N covers pad inertness on both the row and column roles."""
    r, F = cloud
    r_n = jnp.asarray(r) / 0.9
    rng = np.random.default_rng(11)
    n = r.shape[0]
    Fk = jnp.asarray(rng.standard_normal((nrhs, n, 3)), jnp.float32)
    old = rpy_pallas.USE_SYM
    try:
        rpy_pallas.USE_SYM = False
        ref = np.asarray(rpy_pallas.pair_sum(r_n, Fk, wall, interpret=True))
    finally:
        rpy_pallas.USE_SYM = old
    # call the sym sweep directly: pair_sum only routes k=1 through it
    n_pad = -(-n // rpy_pallas.TC) * rpy_pallas.TC
    P = rpy_pallas._pack(r_n, Fk, n_pad)
    out = rpy_pallas._pair_sweep_sym(
        P, n_pad, wall, nrhs, rpy_pallas.rpy_xla.WALL_H_FLOOR, interpret=True)
    sym = np.stack([np.asarray(out)[3 * i : 3 * i + 3, :n].T
                    for i in range(nrhs)])
    assert np.abs(sym - ref).max() / np.abs(ref).max() < 2e-6


def test_symmetric_kernel_vs_oracle(cloud):
    """End-to-end mobility through the symmetric kernel vs the f64 oracle."""
    import oracle

    r, F = cloud
    a, eta = 0.9, 1.3
    Uref = oracle.apply_M(
        F.astype(np.float64), r.astype(np.float64), a, eta, True
    ).reshape(-1, 3)
    old = rpy_pallas.USE_SYM
    try:
        rpy_pallas.USE_SYM = True
        U = np.asarray(rpy_pallas.mobility_apply(
            jnp.asarray(F), jnp.asarray(r), a, eta, True, interpret=True))
    finally:
        rpy_pallas.USE_SYM = old
    assert np.abs(U - Uref).max() / np.abs(Uref).max() < 5e-6


def test_padded_columns_are_inert(cloud):
    """Ragged N (not a multiple of the column tile) must not perturb results:
    compare against the XLA reference path at the same precision."""
    from rigid_body_light_tpu.ops import rpy

    r, F = cloud
    r1, F1 = jnp.asarray(r[:137]), jnp.asarray(F[:137])
    U_pal = np.asarray(rpy_pallas.mobility_apply(F1, r1, 1.0, 1.0, True, interpret=True))
    U_xla = np.asarray(rpy.mobility_apply(F1, r1, 1.0, 1.0, True))
    assert np.abs(U_pal - U_xla).max() / np.abs(U_xla).max() < 1e-5
    assert np.isfinite(U_pal).all()


@pytest.mark.parametrize("nrhs", [1, 2])
def test_symmetric_kernel_multi_column_tile(nrhs):
    """Production-size tiling: n_pad = 3 column tiles exercises the
    diagonal-tile skip (j_start > 0 for later row tiles) and the
    cross-column-tile transposed accumulation, which single-tile clouds
    (n_pad = TC) never touch."""
    rng = np.random.default_rng(23)
    n = 1100  # n_pad = 1536 = 3 * TC
    r = jnp.asarray(
        rng.uniform([-12, -12, 0.7], [12, 12, 9], (n, 3)), jnp.float32)
    Fk = jnp.asarray(rng.standard_normal((nrhs, n, 3)), jnp.float32)
    old = rpy_pallas.USE_SYM
    try:
        rpy_pallas.USE_SYM = False
        ref = np.asarray(rpy_pallas.pair_sum(r, Fk, True, interpret=True))
    finally:
        rpy_pallas.USE_SYM = old
    n_pad = -(-n // rpy_pallas.TC) * rpy_pallas.TC
    assert n_pad // rpy_pallas.TC >= 3
    P = rpy_pallas._pack(r, Fk, n_pad)
    out = rpy_pallas._pair_sweep_sym(
        P, n_pad, True, nrhs, rpy_pallas.rpy_xla.WALL_H_FLOOR, interpret=True)
    sym = np.stack([np.asarray(out)[3 * i : 3 * i + 3, :n].T
                    for i in range(nrhs)])
    assert np.abs(sym - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.medium
def test_pallas_mobility_custom_vjp_matches_xla():
    """The kernel's custom VJP: force cotangent via the (symmetric) kernel
    itself, position cotangent via the XLA fallback — both must match the
    XLA path's autodiff, and stay finite in float32 (the self-pair
    gradient-safety substitution in ops/rpy.py)."""
    rng = np.random.default_rng(0)
    n = 40
    r = jnp.asarray(rng.uniform(0.5, 5.0, (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    Ub = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def f_pal(F, r):
        return jnp.sum(rpy_pallas.mobility_apply(
            F, r, a=0.3, eta=1.0, wall=True, interpret=True) * Ub)

    def f_xla(F, r):
        return jnp.sum(rpy.mobility_apply(F, r, a=0.3, eta=1.0, wall=True) * Ub)

    gF_p, gr_p = jax.grad(f_pal, argnums=(0, 1))(F, r)
    gF_x, gr_x = jax.grad(f_xla, argnums=(0, 1))(F, r)
    assert jnp.isfinite(gF_p).all() and jnp.isfinite(gr_p).all()
    np.testing.assert_allclose(np.asarray(gF_p), np.asarray(gF_x), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_x), rtol=2e-5,
                               atol=1e-7)
    # position gradient against finite differences
    eps = 1e-3
    e = jnp.zeros_like(r).at[7, 2].set(1.0)
    fd = (f_xla(F, r + eps * e) - f_xla(F, r - eps * e)) / (2 * eps)
    assert abs(float(fd) - float(gr_x[7, 2])) < 2e-2 * abs(float(fd))


@pytest.mark.parametrize("wall", [False, True])
def test_mobility_apply_rows_matches_full(cloud, wall):
    """The streamed row-block comparator (mobility_apply_rows) must equal
    the corresponding rows of the full apply — it is the exact-compare
    path at scales where the full-system compare OOMs (>=102k wall)."""
    r, F = cloud
    a, eta = 0.9, 1.3
    full = np.asarray(rpy_pallas.mobility_apply(
        jnp.asarray(F), jnp.asarray(r), a, eta, wall, interpret=True))
    for lo, ln in ((0, 64), (64, 50), (114, 36)):
        rows = np.asarray(rpy_pallas.mobility_apply_rows(
            jnp.asarray(F), jnp.asarray(r), lo, ln, a, eta, wall,
            interpret=True))
        np.testing.assert_allclose(rows, full[lo:lo + ln], rtol=0,
                                   atol=1e-5 * np.abs(full).max())


def test_mobility_apply_rows_polydisperse(cloud):
    r, F = cloud
    rng = np.random.default_rng(3)
    radii = rng.choice([0.6, 1.1], r.shape[0]).astype(np.float32)
    full = np.asarray(rpy_pallas.mobility_apply(
        jnp.asarray(F), jnp.asarray(r), 0.9, 1.0, True, interpret=True,
        radii=jnp.asarray(radii)))
    rows = np.asarray(rpy_pallas.mobility_apply_rows(
        jnp.asarray(F), jnp.asarray(r), 32, 77, 0.9, 1.0, True,
        interpret=True, radii=jnp.asarray(radii)))
    np.testing.assert_allclose(rows, full[32:109], rtol=0,
                               atol=1e-5 * np.abs(full).max())
