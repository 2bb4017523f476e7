"""Triply-periodic RPY mobility via positively-split Ewald (PSE).

The reference is open-domain only (``rotne_prager_tensor``,
``c_rigid_obj.cpp:413-459``); the round-2 ``box`` support is the
minimum-image approximation (not guaranteed SPD).  This module is the real
thing: the exact periodic RPY operator, split with the PSE screen

    H(k) = (1 + k²/4ξ²) e^{−k²/4ξ²}          (Fiore, Balboa Usabiaga,
                                               Donev & Swan, JCP 2017)

into a short-ranged real-space part and a smooth wave-space part — both
SPD for every ξ (0 < H ≤ 1 multiplies the SPD spectral density), so
M^{1/2} sampling stays well-posed at any density, unlike minimum image.

Math (derived symbolically and validated in ``scripts/derive_ewald_rpy.py``):
the RPY tensor is the double surface average of the Stokeslet, with exact
Fourier symbol M̂(k) = sinc²(ka)/(ηk²)(I − k̂k̂) — valid for ALL r
including overlap.  The real-space part A(r)I + B(r)r̂r̂ comes from the
scalar transforms

    A = S₀ + S'/r,   B = S'' − S'/r
    S₀(r) = [2J₃(r) − J₃(r+2a) − J₃(r−2a)] / (8π²ηa²r)
    S(r)  = [2J₅(r) − J₅(r+2a) − J₅(r−2a)] / (8π²ηa²r)
    J₃(α) = (√πα/4ξ)e^{−α²ξ²} − (πα²/4)erfc(αξ)
    J₅(α) = (πα⁴/48)erfc(αξ) − (√πα³/48ξ)e^{−α²ξ²}
            + (√πα/96ξ³)e^{−α²ξ²} + (π/64ξ⁴)erf(αξ)

(J_n odd in α — the |r−2a| reflection handles overlap), with S', S''
taken by forward-mode autodiff of the closed forms — no hand-derived
derivative expressions to get wrong.  Self term
A_self = [1−erf(2aξ)]/(6πηa) + [1−e^{−4a²ξ²}]/(24π^{3/2}a²ηξ).

TPU-first design: the wave-space sum is evaluated as DENSE MATMULS against
the (N, K) phase matrices (cos/sin of r·k) — MXU work with no
scatter/gather gridding (the FFT-spreading formulation is hostile to TPU;
at K ≈ a few thousand wavevectors the matmul path is both exact and fast).
The real-space part is a streamed pair sweep with 3-D minimum-image
wrapping; no cutoff mask is needed — A, B decay as e^{−ξ²r²} and ξ is
chosen so they are below tolerance at L/2.

Correctness anchors (tests/test_ewald.py): ξ-independence (real and wave
parts have disjoint code paths — agreement across ξ validates both),
Hasimoto's cubic-lattice self-mobility 1 − 2.837297·a/L + 4π/3·(a/L)³,
symmetry/SPD, and equal-radius reduction of the wave symbol.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.special import erf

_SQPI = float(np.sqrt(np.pi))


def _erfc(x):
    return 1.0 - erf(x)


def _j3(al, xi):
    """J₃(α) for α ≥ 0 (odd extension is the caller's job)."""
    e = jnp.exp(-(al * xi) ** 2)
    return _SQPI * al / (4.0 * xi) * e - jnp.pi * al**2 / 4.0 * _erfc(al * xi)


def _j5(al, xi):
    e = jnp.exp(-(al * xi) ** 2)
    return (jnp.pi * al**4 / 48.0 * _erfc(al * xi)
            - _SQPI * al**3 / (48.0 * xi) * e
            + _SQPI * al / (96.0 * xi**3) * e
            + jnp.pi / (64.0 * xi**4) * erf(al * xi))


def _j_odd(j_fn, al, xi):
    return jnp.sign(al) * j_fn(jnp.abs(al), xi)


def _s0(r, a, xi, eta, ai=None, aj=None):
    if ai is None:
        c = 1.0 / (8.0 * jnp.pi**2 * eta * a**2)
        return c / r * (2.0 * _j3(r, xi) - _j3(r + 2 * a, xi)
                        - _j_odd(_j3, r - 2 * a, xi))
    # polydisperse: sin(ka_i)sin(ka_j)sin(kr) product-to-sum — the same
    # J-cascade with shifts r±(a_i−a_j), r±(a_i+a_j)
    c = 1.0 / (8.0 * jnp.pi**2 * eta * ai * aj)
    d, sm = ai - aj, ai + aj
    return c / r * (_j_odd(_j3, r + d, xi) + _j_odd(_j3, r - d, xi)
                    - _j3(r + sm, xi) - _j_odd(_j3, r - sm, xi))


def _s(r, a, xi, eta, ai=None, aj=None):
    if ai is None:
        c = 1.0 / (8.0 * jnp.pi**2 * eta * a**2)
        return c / r * (2.0 * _j5(r, xi) - _j5(r + 2 * a, xi)
                        - _j_odd(_j5, r - 2 * a, xi))
    c = 1.0 / (8.0 * jnp.pi**2 * eta * ai * aj)
    d, sm = ai - aj, ai + aj
    return c / r * (_j_odd(_j5, r + d, xi) + _j_odd(_j5, r - d, xi)
                    - _j5(r + sm, xi) - _j_odd(_j5, r - sm, xi))


def real_space_ab(r, a, xi, eta=1.0, ai=None, aj=None):
    """Real-space Ewald scalars (A, B) with M_real = A·I + B·r̂r̂.

    Elementwise over any-shape ``r`` (physical units).  S'/S'' via
    forward-mode AD of the closed-form S — exact, fuses to elementwise XLA.
    ai, aj: optional per-pair radii (broadcast against r) — polydisperse
    RPY, exact (the Fourier symbol becomes sinc(ka_i)sinc(ka_j)/(ηk²)).
    """
    s_fn = lambda rr: _s(rr, a, xi, eta, ai=ai, aj=aj)
    sp_fn = lambda rr: jax.jvp(s_fn, (rr,), (jnp.ones_like(rr),))[1]
    sp = sp_fn(r)
    spp = jax.jvp(sp_fn, (r,), (jnp.ones_like(r),))[1]
    A = _s0(r, a, xi, eta, ai=ai, aj=aj) + sp / r
    B = spp - sp / r
    return A, B


def self_coeff(a, xi, eta=1.0):
    """A_self = lim_{r→0} A(r) — the screened periodic self mobility's
    real-space part.  Vectorizes over per-blob radii ``a``."""
    return ((1.0 - erf(2.0 * a * xi)) / (6.0 * jnp.pi * eta * a)
            + (1.0 - jnp.exp(-4.0 * a**2 * xi**2))
            / (24.0 * jnp.pi**1.5 * a**2 * eta * xi))


class EwaldParams(NamedTuple):
    """Static Ewald configuration (python floats/arrays — jit-closable).

    kvecs: (K, 3) wavevectors (k ≠ 0, |k| ≤ kmax).
    wk: (K,) positive wave weights H(k)·sinc²(ka)/(η V k²).
    wk_raw: (K,) the same without the sinc² factor — the polydisperse path
      applies per-blob sinc(|k|aᵢ) weights at spread/interpolate instead.
    """

    box: tuple
    a: float
    eta: float
    xi: float
    kvecs: np.ndarray
    wk: np.ndarray
    wk_raw: np.ndarray = None
    # f64 host-built radial tables of the monodisperse real-space scalars —
    # the float32 path MUST interpolate these: the closed forms evaluate
    # J-combination second differences whose cancellation is catastrophic in
    # f32 at r >> a (measured: the f32 closed-form operator carries 1e-2-
    # level errors that diverge GMRES and break M^{1/2} sampling entirely).
    r_table: np.ndarray = None
    A_table: np.ndarray = None
    B_table: np.ndarray = None


def _np_j3(al, xi):
    from scipy.special import erfc

    e = np.exp(-(al * xi) ** 2)
    return (np.sqrt(np.pi) * al / (4.0 * xi) * e
            - np.pi * al**2 / 4.0 * erfc(al * xi))


def _np_j5(al, xi):
    from scipy.special import erf, erfc

    e = np.exp(-(al * xi) ** 2)
    return (np.pi * al**4 / 48.0 * erfc(al * xi)
            - np.sqrt(np.pi) * al**3 / (48.0 * xi) * e
            + np.sqrt(np.pi) * al / (96.0 * xi**3) * e
            + np.pi / (64.0 * xi**4) * erf(al * xi))


def _np_j_odd(j_fn, al, xi):
    return np.sign(al) * j_fn(np.abs(al), xi)


def _build_tables(a, eta, xi, rmax, n=8192, oversample=8, ai=None, aj=None):
    """f64 radial tables of (A, B) on [rmin, rmax] (host, numpy).

    S'/S'' by central differences on an ``oversample``-finer grid —
    truncation ~ (Δr)² ≈ 1e-8·curvature, far below the f32 target.
    ai, aj: per-pair radii (polydisperse); default is the monodisperse
    ``a`` (the poly shifts r±(ai−aj), r±(ai+aj) reduce to it exactly).
    """
    m = oversample * n
    r = np.linspace(rmax / m, rmax, m)
    if ai is None:
        ai = aj = a
    c = 1.0 / (8.0 * np.pi**2 * eta * ai * aj)
    d, sm = ai - aj, ai + aj
    g3 = (_np_j_odd(_np_j3, r + d, xi) + _np_j_odd(_np_j3, r - d, xi)
          - _np_j3(r + sm, xi) - _np_j_odd(_np_j3, r - sm, xi))
    g5 = (_np_j_odd(_np_j5, r + d, xi) + _np_j_odd(_np_j5, r - d, xi)
          - _np_j5(r + sm, xi) - _np_j_odd(_np_j5, r - sm, xi))
    s0 = c / r * g3
    S = c / r * g5
    sp = np.gradient(S, r)
    spp = np.gradient(sp, r)
    A = s0 + sp / r
    B = spp - sp / r
    sl = slice(oversample - 1, None, oversample)
    return r[sl], A[sl], B[sl]


class PolyTables(NamedTuple):
    """Species-pair f64 radial tables for the float32 polydisperse path.

    The f32 closed forms are unusable (same catastrophic J-cascade
    cancellation as monodisperse — see ``EwaldParams``), so each unique
    (aᵢ, aⱼ) radius pair gets its own host-built f64 table; blobs carry an
    int species index and pairs gather from the (S², npts) stack.
    """

    sidx: np.ndarray       # (N,) int32 species index per blob
    n_species: int
    r_table: np.ndarray    # (npts,) shared radial grid
    A_tables: np.ndarray   # (S², npts)
    B_tables: np.ndarray


def make_poly_tables(params: "EwaldParams", radii) -> PolyTables:
    """Build per-species-pair (A, B) tables for concrete per-blob radii."""
    try:
        rad = np.asarray(radii, np.float64)
    except Exception as e:  # jax tracer — cannot build tables at trace time
        raise TypeError(
            "float32 polydisperse Ewald needs concrete per-blob radii to "
            "build f64 pair tables (or pass poly_tables=make_poly_tables(...) "
            "built outside the trace, or use float64)"
        ) from e
    uniq, sidx = np.unique(rad, return_inverse=True)
    S = len(uniq)
    rmax = 0.5 * float(np.linalg.norm(params.box)) * 1.001
    A_all, B_all = [], []
    r_t = None
    for i in range(S):
        for j in range(S):
            r_t, A_t, B_t = _build_tables(
                params.a, params.eta, params.xi, rmax,
                ai=float(uniq[i]), aj=float(uniq[j]))
            A_all.append(A_t)
            B_all.append(B_t)
    return PolyTables(sidx=sidx.astype(np.int32), n_species=S,
                      r_table=r_t, A_tables=np.stack(A_all),
                      B_tables=np.stack(B_all))


def make_params(box, a, eta=1.0, xi=None, tol=1e-6) -> EwaldParams:
    """Choose ξ and build the wavevector lattice for a (Lx, Ly, Lz) box.

    Default ξ puts the real-space truncation error at ``tol`` for the
    minimum-image radius min(L)/2 (so the real sweep needs no image loop),
    and kmax puts the wave truncation at the same ``tol``.
    """
    box = tuple(float(b) for b in box)
    if len(box) != 3:
        raise ValueError(f"Ewald needs a 3-D box, got {box!r}")
    s = float(np.sqrt(-np.log(tol)))
    rcut = min(box) / 2.0
    if xi is None:
        xi = s / rcut
    xi = float(xi)
    kmax = 2.0 * xi * s
    nmax = [int(np.ceil(kmax * L / (2 * np.pi))) for L in box]
    grids = np.meshgrid(*[np.arange(-n, n + 1) for n in nmax], indexing="ij")
    n_all = np.stack([g.ravel() for g in grids], axis=1)
    kvecs = 2 * np.pi * n_all / np.asarray(box)
    k2 = np.sum(kvecs**2, axis=1)
    keep = (k2 > 0) & (k2 <= kmax**2)
    kvecs = kvecs[keep]
    k2 = k2[keep]
    k = np.sqrt(k2)
    V = box[0] * box[1] * box[2]
    ka = k * a
    sinc = np.sin(ka) / ka
    H = (1 + k2 / (4 * xi**2)) * np.exp(-k2 / (4 * xi**2))
    wk_raw = H / (eta * V * k2)
    wk = wk_raw * sinc**2
    # table covers every minimum-image distance (half the box diagonal)
    rmax = 0.5 * float(np.linalg.norm(box)) * 1.001
    r_t, A_t, B_t = _build_tables(float(a), float(eta), xi, rmax)
    return EwaldParams(box=box, a=float(a), eta=float(eta), xi=xi,
                       kvecs=kvecs.astype(np.float64),
                       wk=wk.astype(np.float64),
                       wk_raw=wk_raw.astype(np.float64),
                       r_table=r_t, A_table=A_t, B_table=B_t)


def _wrap3(d, box):
    lx, ly, lz = box
    dx = d[..., 0] - lx * jnp.round(d[..., 0] / lx)
    dy = d[..., 1] - ly * jnp.round(d[..., 1] / ly)
    dz = d[..., 2] - lz * jnp.round(d[..., 2] / lz)
    return jnp.stack([dx, dy, dz], axis=-1)


def real_space_apply(F, r, params: EwaldParams, row_tile=512, radii=None,
                     poly_tables: PolyTables = None):
    """Streamed U_real = Σ_{j≠i} [A·I + B·r̂r̂]·F_j with 3-D minimum image.

    No cutoff mask: A, B ≤ tol beyond min(L)/2 by the ξ choice.
    radii: optional (N,) per-blob physical radii (polydisperse, exact).
    In float32 the polydisperse scalars come from species-pair f64 tables
    (built on the fly from concrete radii unless ``poly_tables`` is given)
    — the closed forms are mono/poly alike unusable in f32.
    """
    dtype = r.dtype
    n = r.shape[0]
    a = jnp.asarray(params.a, dtype)
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    tile = min(row_tile, n)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    r_pad = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    poly = radii is not None
    if poly:
        rad = jnp.asarray(radii, dtype)
        rad_pad = jnp.pad(rad, (0, n_pad - n), constant_values=1.0)
        if dtype == jnp.float32 and poly_tables is None:
            poly_tables = make_poly_tables(params, radii)

    def _lerp_idx(rt, rr):
        npts = rt.shape[0]
        dr_inv = (npts - 1) / (rt[-1] - rt[0])
        x = jnp.clip((rr - rt[0]) * dr_inv, 0.0, npts - 1.001)
        i0 = x.astype(jnp.int32)
        return i0, x - i0

    def tile_fn(start):
        ri = lax.dynamic_slice(r_pad, (start, jnp.int32(0)), (tile, 3))
        rid = lax.dynamic_slice(ids, (start,), (tile,))
        d = _wrap3(ri[:, None, :] - r[None, :, :], params.box)
        r2 = jnp.sum(d * d, axis=-1)
        self_mask = rid[:, None] == ids[None, :n]
        rr = jnp.sqrt(jnp.where(self_mask, 1.0, jnp.maximum(r2, 1e-24)))
        if poly and dtype == jnp.float32:
            pt = poly_tables
            rt = jnp.asarray(pt.r_table, dtype)
            At = jnp.asarray(pt.A_tables, dtype).reshape(-1)
            Bt = jnp.asarray(pt.B_tables, dtype).reshape(-1)
            npts = pt.r_table.shape[0]
            sidx = jnp.asarray(pt.sidx, jnp.int32)
            sidx_pad = jnp.pad(sidx, (0, n_pad - n))
            si = lax.dynamic_slice(sidx_pad, (start,), (tile,))[:, None]
            pair = (si * pt.n_species + sidx[None, :n]) * npts
            i0, f = _lerp_idx(rt, rr)
            idx = pair + i0
            A = jnp.take(At, idx) * (1.0 - f) + jnp.take(At, idx + 1) * f
            B = jnp.take(Bt, idx) * (1.0 - f) + jnp.take(Bt, idx + 1) * f
        elif poly:
            ai = lax.dynamic_slice(rad_pad, (start,), (tile,))[:, None]
            A, B = real_space_ab(rr, a, xi, eta, ai=ai, aj=rad[None, :])
        elif dtype == jnp.float32:
            # f32 MUST use the f64-built tables (see EwaldParams note)
            rt = jnp.asarray(params.r_table, dtype)
            At = jnp.asarray(params.A_table, dtype)
            Bt = jnp.asarray(params.B_table, dtype)
            i0, f = _lerp_idx(rt, rr)
            A = jnp.take(At, i0) * (1.0 - f) + jnp.take(At, i0 + 1) * f
            B = jnp.take(Bt, i0) * (1.0 - f) + jnp.take(Bt, i0 + 1) * f
        else:
            A, B = real_space_ab(rr, a, xi, eta)
        A = jnp.where(self_mask, 0.0, A)
        B = jnp.where(self_mask, 0.0, B)
        e = d / rr[..., None]
        eF = jnp.einsum("tnx,nx->tn", e, F)
        return (jnp.einsum("tn,nx->tx", A, F)
                + jnp.einsum("tn,tn,tnx->tx", B, eF, e))

    if n_tiles == 1:
        U = tile_fn(jnp.int32(0))
    else:
        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        U = lax.map(tile_fn, starts).reshape(n_pad, 3)
    return U[:n]


def wave_space_apply(F, r, params: EwaldParams, radii=None):
    """U_wave = Σ_{k≠0} w(k)(I − k̂k̂) e^{ik·(r_i−r_j)} F_j as MXU matmuls.

    Phases: C/S = cos/sin(r·kᵀ) (N, K); the k-sum includes the i=j term
    (the wave part of the self mobility) — the full Ewald identity is
    M_per = M_real(pairs) + A_self·I(self) + M_wave(everything).
    radii: polydisperse — per-blob sinc(|k|aᵢ) weights fold into the
    spread/interpolate phases (wk_raw carries the weight without sinc²).
    """
    dtype = r.dtype
    kv = jnp.asarray(params.kvecs, dtype)      # (K, 3)
    if radii is None:
        wk = jnp.asarray(params.wk, dtype)     # (K,)
    else:
        wk = jnp.asarray(params.wk_raw, dtype)
    khat = kv / jnp.linalg.norm(kv, axis=1, keepdims=True)
    theta = r @ kv.T                           # (N, K)
    C = jnp.cos(theta)
    S = jnp.sin(theta)
    if radii is not None:
        ka = jnp.linalg.norm(kv, axis=1)[None, :] * jnp.asarray(
            radii, dtype)[:, None]             # (N, K)
        sinc = jnp.sin(ka) / ka
        C = C * sinc
        S = S * sinc
    ReF = C.T @ F                              # (K, 3) = Re Σ e^{-ikr} F
    ImF = -(S.T @ F)
    # transverse projection + weight
    ReP = wk[:, None] * (ReF - khat * jnp.sum(khat * ReF, axis=1, keepdims=True))
    ImP = wk[:, None] * (ImF - khat * jnp.sum(khat * ImF, axis=1, keepdims=True))
    return C @ ReP - S @ ImP


def mobility_apply(F, r, params: EwaldParams, row_tile=512, radii=None,
                   poly_tables: PolyTables = None):
    """Full periodic RPY product U = M_per(r)·F, SPD by construction.

    radii: optional (N,) per-blob physical radii — exact polydisperse
    periodic RPY (sinc(kaᵢ)sinc(kaⱼ) symbol; real-space shifts r±(aᵢ∓aⱼ)).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    F = jnp.asarray(F, r.dtype).reshape(-1, 3)
    dtype = r.dtype
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    a_self = (jnp.asarray(params.a, dtype) if radii is None
              else jnp.asarray(radii, dtype)[:, None])
    U = real_space_apply(F, r, params, row_tile=row_tile, radii=radii,
                         poly_tables=poly_tables)
    U = U + self_coeff(a_self, xi, eta) * F
    U = U + wave_space_apply(F, r, params, radii=radii)
    return U


def mobility_apply_multi(Fs, r, params: EwaldParams, row_tile=512, radii=None,
                         poly_tables: PolyTables = None):
    """Multi-RHS variant (k, N, 3) — vmapped (the pair fields are not yet
    shared across RHS; adequate for the 2-RHS noise fusion at current N)."""
    return jax.vmap(lambda F: mobility_apply(F, r, params, row_tile=row_tile,
                                             radii=radii,
                                             poly_tables=poly_tables))(Fs)


def mobility_matrix(r, params: EwaldParams, radii=None,
                    poly_tables: PolyTables = None):
    """Dense (3N, 3N) periodic mobility — tests/PC blocks only."""
    r = jnp.asarray(r).reshape(-1, 3)
    n = r.shape[0]
    eye = jnp.eye(3 * n, dtype=r.dtype)
    cols = jax.vmap(lambda e: mobility_apply(e.reshape(n, 3), r, params,
                                             radii=radii,
                                             poly_tables=poly_tables
                                             ).reshape(-1),
                    in_axes=1, out_axes=1)(eye)
    return cols
