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
    cheb_bounds/cheb_A/cheb_B: host-fitted f64 piecewise-Chebyshev
      representation of the monodisperse real-space scalars — the float32
      path MUST evaluate these instead of the closed forms: the closed
      forms take J-combination differences whose cancellation is
      catastrophic in f32 (measured: ~1e-2 operator errors that diverge
      GMRES and break M^{1/2} sampling entirely).  Chebyshev (not a lookup
      table): Clenshaw is a pure FMA chain the VPU runs at full rate,
      while the 8k-entry table gather this replaces both lowered poorly
      and reproducibly kernel-faulted the TPU runtime.
    """

    box: tuple
    a: float
    eta: float
    xi: float
    kvecs: np.ndarray
    wk: np.ndarray
    wk_raw: np.ndarray = None
    cheb_bounds: np.ndarray = None   # (4,) segment edges
    cheb_A: np.ndarray = None        # (3, D+1) per-segment coefficients
    cheb_B: np.ndarray = None
    # balanced splitting: rc < min(L)/2 routes the real sweep through the
    # sorted-tile neighbor structure (ops/ewald_cells.py); rc=None keeps
    # the original all-pairs choice (real part spans min(L)/2).
    rc: float = None
    # integer lattice indices n with k = 2πn/L — the wave phases then
    # factorize per dimension (cos/sin of N·W base angles instead of N·K;
    # the (N, K) matrices are built by gathers + complex multiplies)
    nvecs: np.ndarray = None


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


_CHEB_DEG = 48     # fit degree per segment (long-segment fit ≈ 4e-9 abs)
_CHEB_DEG_S = 96   # degree of the intermediate S-series (derivative source)


def _fit_pair_cheb(eta, xi, rmax, ai, aj, deg=_CHEB_DEG, deg_s=_CHEB_DEG_S):
    """Host f64 piecewise-Chebyshev fit of A(r), B(r) for one radius pair.

    Segments split at the kink radii r = |aᵢ−aⱼ| and r = aᵢ+aⱼ (the
    α|α|-type terms of the odd J-extension make the scalars non-smooth
    exactly there).  S', S'' come from differentiating a degree-``deg_s``
    Chebyshev series of S analytically (``chebder``) — no finite-difference
    noise, unlike a gradient-on-grid table build.

    The required degree grows with ξ·(segment length) (≈ const for cubic
    boxes, larger for anisotropic ones), so each fit is validated against
    a deg+16 refit at off-node points and escalated until they agree to
    3e-6 of the scalar's scale.

    Returns bounds (4,), coefA (3, D+1), coefB (3, D+1).
    """
    cheb = np.polynomial.chebyshev
    c = 1.0 / (8.0 * np.pi**2 * eta * ai * aj)
    d, sm = ai - aj, ai + aj

    def g(r, j_fn):
        return (_np_j_odd(j_fn, r + d, xi) + _np_j_odd(j_fn, r - d, xi)
                - j_fn(r + sm, xi) - _np_j_odd(j_fn, r - sm, xi))

    def fit_seg(lo, hi, deg, deg_s):
        ks = np.arange(deg_s + 1)
        xs = np.cos(np.pi * (ks + 0.5) / (deg_s + 1))
        rs = lo + (hi - lo) * (xs + 1) / 2
        cS = cheb.chebfit(xs, c / rs * g(rs, _np_j5), deg_s)
        scale = 2.0 / (hi - lo)
        cSp = cheb.chebder(cS) * scale
        cSpp = cheb.chebder(cSp) * scale
        kf = np.arange(deg + 1)
        xf = np.cos(np.pi * (kf + 0.5) / (deg + 1))
        rf = lo + (hi - lo) * (xf + 1) / 2
        sp = cheb.chebval(xf, cSp)
        spp = cheb.chebval(xf, cSpp)
        s0 = c / rf * g(rf, _np_j3)
        return (cheb.chebfit(xf, s0 + sp / rf, deg),
                cheb.chebfit(xf, spp - sp / rf, deg))

    rlo = 0.05 * min(ai, aj)   # below: clamp (A,B smooth and ~flat at 0)
    edges = [rlo, max(abs(d), rlo * (1 + 1e-9)), sm, rmax]
    edges = list(np.maximum.accumulate(edges))
    a_scale = 1.0 / (6.0 * np.pi * eta * max(ai, aj))
    coefA, coefB = [None] * 3, [None] * 3
    deg_out = deg
    for seg in (2, 1, 0):      # reverse: degenerate segs copy their right
        lo, hi = edges[seg], edges[seg + 1]
        if hi <= lo * (1 + 1e-8):
            # zero-width (equal radii): constant = next segment's left edge
            # (chosen only for r below the clamp radius)
            coefA[seg] = np.asarray([cheb.chebval(-1.0, coefA[seg + 1])])
            coefB[seg] = np.asarray([cheb.chebval(-1.0, coefB[seg + 1])])
            continue
        # initial degree tracks the segment's screened length (the
        # Gaussian-decay bandwidth); cubic boxes land at the default
        dcur = max(deg, int(10 + 7.5 * xi * (hi - lo)))
        dscur = 2 * dcur
        prev_err = np.inf
        for _ in range(4):
            cA, cB = fit_seg(lo, hi, dcur, dscur)
            cA2, cB2 = fit_seg(lo, hi, dcur + 16, dscur + 32)
            xv = np.linspace(-1, 1, 257)
            err = max(np.abs(cheb.chebval(xv, cA) -
                             cheb.chebval(xv, cA2)).max(),
                      np.abs(cheb.chebval(xv, cB) -
                             cheb.chebval(xv, cB2)).max())
            # stop on convergence OR plateau (short overlap segments are
            # S''-sample-noise limited at ~1e-5·scale — more degree only
            # fits noise; deep-overlap pairs are physically pathological)
            if err <= 3e-6 * a_scale or err > 0.5 * prev_err:
                break
            prev_err = err
            dcur, dscur = dcur + 16, dscur + 32
        coefA[seg] = cA
        coefB[seg] = cB
        deg_out = max(deg_out, len(cA) - 1)
    # pad all segments to the common escalated degree
    coefA = [np.pad(ca, (0, deg_out + 1 - len(ca))) for ca in coefA]
    coefB = [np.pad(cb, (0, deg_out + 1 - len(cb))) for cb in coefB]
    return (np.asarray(edges), np.stack(coefA), np.stack(coefB))


def _cheb_ab(rr, bounds, coefA, coefB):
    """Evaluate the piecewise fit elementwise (jittable, gather-free).

    Segment choice and per-slot coefficient picks are 3-way selects on
    broadcast scalars; the two Clenshaw recurrences are FMA chains — XLA
    fuses the whole thing into the surrounding pair sweep.
    """
    dtype = rr.dtype
    b = [jnp.asarray(float(v), dtype) for v in bounds]
    in1 = rr >= b[1]
    in2 = rr >= b[2]
    lo = jnp.where(in2, b[2], jnp.where(in1, b[1], b[0]))
    hi = jnp.where(in2, b[3], jnp.where(in1, b[2], b[1]))
    x = jnp.clip(2.0 * (rr - lo) / (hi - lo) - 1.0, -1.0, 1.0)
    cA = jnp.asarray(coefA, dtype)
    cB = jnp.asarray(coefB, dtype)

    def sel(c3):
        return jnp.where(in2, c3[2], jnp.where(in1, c3[1], c3[0]))

    def clenshaw(coef):
        two_x = 2.0 * x
        bk1 = jnp.zeros_like(x)
        bk2 = jnp.zeros_like(x)
        for j in range(coef.shape[1] - 1, 0, -1):
            bk1, bk2 = sel(coef[:, j]) + two_x * bk1 - bk2, bk1
        return sel(coef[:, 0]) + x * bk1 - bk2

    return clenshaw(cA), clenshaw(cB)


class PolyTables(NamedTuple):
    """Species-pair Chebyshev fits for the float32 polydisperse path.

    The f32 closed forms are unusable (same catastrophic J-cascade
    cancellation as monodisperse — see ``EwaldParams``), so each unique
    unordered (aᵢ, aⱼ) radius pair gets its own host-fitted piecewise
    Chebyshev; blobs carry an int species index and ``pair_map`` assigns
    each (sᵢ, sⱼ) its fit, applied by masked Clenshaw sweeps (no gather).
    """

    sidx: np.ndarray       # (N,) int32 species index per blob
    n_species: int
    pair_map: np.ndarray   # (S, S) int32 → pair-fit index (symmetric)
    bounds: np.ndarray     # (P, 4)
    coefA: np.ndarray      # (P, 3, D+1)
    coefB: np.ndarray


def make_poly_tables(params: "EwaldParams", radii) -> PolyTables:
    """Build per-species-pair Chebyshev fits for concrete per-blob radii."""
    try:
        rad = np.asarray(radii, np.float64)
    except Exception as e:  # jax tracer — cannot fit at trace time
        raise TypeError(
            "float32 polydisperse Ewald needs concrete per-blob radii to "
            "build f64 pair fits (or pass poly_tables=make_poly_tables(...) "
            "built outside the trace, or use float64)"
        ) from e
    uniq, sidx = np.unique(rad, return_inverse=True)
    S = len(uniq)
    rmax = 0.5 * float(np.linalg.norm(params.box)) * 1.001
    pair_map = np.zeros((S, S), np.int32)
    bounds, coefA, coefB = [], [], []
    p = 0
    for i in range(S):
        for j in range(i, S):
            b, cA, cB = _fit_pair_cheb(params.eta, params.xi, rmax,
                                       float(uniq[i]), float(uniq[j]))
            bounds.append(b)
            coefA.append(cA)
            coefB.append(cB)
            pair_map[i, j] = pair_map[j, i] = p
            p += 1
    # degree escalation is per pair — pad to the common maximum
    dmax = max(c.shape[1] for c in coefA)
    coefA = [np.pad(c, ((0, 0), (0, dmax - c.shape[1]))) for c in coefA]
    coefB = [np.pad(c, ((0, 0), (0, dmax - c.shape[1]))) for c in coefB]
    return PolyTables(sidx=sidx.astype(np.int32), n_species=S,
                      pair_map=pair_map, bounds=np.stack(bounds),
                      coefA=np.stack(coefA), coefB=np.stack(coefB))


def wave_weights(kvecs, a, eta, box, xi):
    """(wk_raw, wk) positively-split wave weights for k ≠ 0 (numpy).

    wk_raw = H(k)/(ηVk²) with H = (1 + k²/4ξ²)·exp(−k²/4ξ²); wk adds the
    monodisperse sinc²(ka) shape factor.  Shared by :func:`make_params`
    (explicit k-list) and :func:`rigid_body_light_tpu.ops.ewald_pme.
    make_grid` (per-spectral-bin weights) so the two paths cannot drift.
    """
    k2 = np.sum(np.asarray(kvecs) ** 2, axis=-1)
    k = np.sqrt(np.maximum(k2, 1e-300))
    V = box[0] * box[1] * box[2]
    ka = k * a
    sinc = np.sin(ka) / np.maximum(ka, 1e-300)
    H = (1 + k2 / (4 * xi**2)) * np.exp(-k2 / (4 * xi**2))
    wk_raw = np.where(k2 > 0, H / (eta * V * np.maximum(k2, 1e-300)), 0.0)
    return wk_raw, wk_raw * sinc**2


def make_params(box, a, eta=1.0, xi=None, tol=1e-6, rc=None) -> EwaldParams:
    """Choose ξ and build the wavevector lattice for a (Lx, Ly, Lz) box.

    Default ξ puts the real-space truncation error at ``tol`` for the
    minimum-image radius min(L)/2 (so the real sweep needs no image loop),
    and kmax puts the wave truncation at the same ``tol``.

    rc: optional balanced-splitting real-space cutoff (2a < rc < min(L)/2).
    Shifts work from the O(N²) real sweep to the MXU wave sum: ξ = s/rc so
    the real part truncates at ``tol`` by ``rc``, pairs beyond rc are
    EXCLUDED (not just small), and the real sweep runs over linked cells
    (:mod:`rigid_body_light_tpu.ops.ewald_cells`) at O(N·ρ·rc³) cost.
    The split stays exact/SPD for every rc — only the truncation tolerance
    is shared.  Explicit ``xi`` is incompatible with ``rc``.
    """
    box = tuple(float(b) for b in box)
    if len(box) != 3:
        raise ValueError(f"Ewald needs a 3-D box, got {box!r}")
    s = float(np.sqrt(-np.log(tol)))
    rcut = min(box) / 2.0
    if rc is not None:
        if xi is not None:
            raise ValueError("pass either rc= (balanced split) or xi=, not both")
        rc = float(rc)
        if not 2.0 * a < rc <= rcut:
            raise ValueError(
                f"ewald rc must satisfy 2a = {2 * a:.4g} < rc <= min(L)/2 = "
                f"{rcut:.4g}, got {rc:.4g}")
        xi = s / rc
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
    wk_raw, wk = wave_weights(kvecs, a, eta, box, xi)
    # fit covers every distance the sweep can see: rc with cells, else
    # half the box diagonal (minimum image).  Short-range (rc) fits get a
    # low initial degree — the screened length ξ·rc is ~constant and the
    # per-pair Clenshaw cost is the real sweep's flop budget; the
    # escalation loop still validates to 3e-6 of scale either way.
    rmax = (rc if rc is not None
            else 0.5 * float(np.linalg.norm(box))) * 1.001
    deg0 = 12 if rc is not None else _CHEB_DEG
    b, cA, cB = _fit_pair_cheb(float(eta), xi, rmax, float(a), float(a),
                               deg=deg0)
    return EwaldParams(box=box, a=float(a), eta=float(eta), xi=xi,
                       kvecs=kvecs.astype(np.float64),
                       wk=wk.astype(np.float64),
                       wk_raw=wk_raw.astype(np.float64),
                       cheb_bounds=b, cheb_A=cA, cheb_B=cB, rc=rc,
                       nvecs=n_all[keep].astype(np.int32))


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
    In float32 the scalars come from host-fitted piecewise-Chebyshev
    representations (species-pair fits for polydisperse, built on the fly
    from concrete radii unless ``poly_tables`` is given) — the closed
    forms are mono/poly alike unusable in f32.
    """
    dtype = r.dtype
    n = r.shape[0]
    poly = radii is not None
    if not poly:
        # monodisperse: one shared implementation with the distributed ring
        # block (rows = all blobs, columns = all blobs)
        ids = jnp.arange(n, dtype=jnp.int32)
        return real_space_block(r, ids, r, ids, F, params, row_tile=row_tile)
    a = jnp.asarray(params.a, dtype)
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    tile = min(row_tile, n)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    r_pad = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    rad = jnp.asarray(radii, dtype)
    rad_pad = jnp.pad(rad, (0, n_pad - n), constant_values=1.0)
    if dtype == jnp.float32 and poly_tables is None:
        poly_tables = make_poly_tables(params, radii)

    multi_rhs = F.ndim == 3  # (k, N, 3) — shared pair fields across RHS

    def tile_fn(start):
        ri = lax.dynamic_slice(r_pad, (start, jnp.int32(0)), (tile, 3))
        rid = lax.dynamic_slice(ids, (start,), (tile,))
        d = _wrap3(ri[:, None, :] - r[None, :, :], params.box)
        r2 = jnp.sum(d * d, axis=-1)
        self_mask = rid[:, None] == ids[None, :n]
        rr = jnp.sqrt(jnp.where(self_mask, 1.0, jnp.maximum(r2, 1e-24)))
        if dtype == jnp.float32:
            # masked per-pair-type Chebyshev sweeps (see PolyTables)
            pt = poly_tables
            sidx = jnp.asarray(pt.sidx, jnp.int32)
            sidx_pad = jnp.pad(sidx, (0, n_pad - n))
            si = lax.dynamic_slice(sidx_pad, (start,), (tile,))[:, None]
            pmap = jnp.asarray(pt.pair_map, jnp.int32)
            pair = pmap[si, sidx[None, :n]]
            A = jnp.zeros_like(rr)
            B = jnp.zeros_like(rr)
            for p in range(pt.bounds.shape[0]):
                Ap, Bp = _cheb_ab(rr, pt.bounds[p], pt.coefA[p],
                                  pt.coefB[p])
                m = pair == p
                A = jnp.where(m, Ap, A)
                B = jnp.where(m, Bp, B)
        else:
            ai = lax.dynamic_slice(rad_pad, (start,), (tile,))[:, None]
            A, B = real_space_ab(rr, a, xi, eta, ai=ai, aj=rad[None, :])
        A = jnp.where(self_mask, 0.0, A)
        B = jnp.where(self_mask, 0.0, B)
        if params.rc is not None:
            # balanced split: pairs beyond rc are excluded by contract
            # (matches the linked-cell sweep exactly)
            cut = rr <= params.rc
            A = jnp.where(cut, A, 0.0)
            B = jnp.where(cut, B, 0.0)
        e = d / rr[..., None]
        if multi_rhs:
            eF = jnp.einsum("tnx,knx->ktn", e, F)
            return (jnp.einsum("tn,knx->ktx", A, F)
                    + jnp.einsum("ktn,tn,tnx->ktx", eF, B, e))
        eF = jnp.einsum("tnx,nx->tn", e, F)
        return (jnp.einsum("tn,nx->tx", A, F)
                + jnp.einsum("tn,tn,tnx->tx", B, eF, e))

    if n_tiles == 1:
        U = tile_fn(jnp.int32(0))
        if multi_rhs:
            return U[:, :n]
    else:
        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        U = lax.map(tile_fn, starts)
        if multi_rhs:
            # (n_tiles, k, tile, 3) -> (k, n_pad, 3)
            return U.transpose(1, 0, 2, 3).reshape(F.shape[0], n_pad,
                                                   3)[:, :n]
        U = U.reshape(n_pad, 3)
    return U[:n]


def wave_space_apply(F, r, params: EwaldParams, radii=None, axis_name=None):
    """U_wave = Σ_{k≠0} w(k)(I − k̂k̂) e^{ik·(r_i−r_j)} F_j as MXU matmuls.

    Phases: C/S = cos/sin(r·kᵀ) (N, K); the k-sum includes the i=j term
    (the wave part of the self mobility) — the full Ewald identity is
    M_per = M_real(pairs) + A_self·I(self) + M_wave(everything).
    radii: polydisperse — per-blob sinc(|k|aᵢ) weights fold into the
    spread/interpolate phases (wk_raw carries the weight without sinc²).

    Balanced-splitting params (``rc=``) grow K by ~(rcut/rc)³; above a
    memory threshold the k-sum is evaluated in scanned K-chunks so the
    (N, K) phase matrices never materialize whole.

    axis_name: distributed mode — F/r are the LOCAL blob shard inside
    ``shard_map``; the (K, 3) k-space moments close with one ``psum``
    (the spread/readback phases stay local), so wave-space work and
    memory scale with the shard.
    """
    n = r.shape[0]
    K = len(params.kvecs)
    if K * n > 2**27 and K > 4096:
        return _wave_space_chunked(F, r, params, radii=radii,
                                   axis_name=axis_name)
    return _wave_space_dense(F, r, params, radii=radii, axis_name=axis_name)


def _phase_tables(r, box, nmax3):
    """Per-dimension phase tables cos/sin(xᵢ·2πm/L) for m ∈ [−nmax, nmax].

    Lattice wavevectors factorize: e^{ik·r} = Ex(n₁)·Ey(n₂)·Ez(n₃), so
    the (N, K) phase matrices need only N·ΣW base transcendentals (W =
    2·nmax+1 ≈ 40) plus gathers and complex multiplies — the direct
    cos(r·kᵀ) build is N·K transcendentals and dominated the measured
    balanced-split wave cost (~70 ms at 40k blobs, K = 26k).
    """
    out = []
    for d2 in range(3):
        m = jnp.arange(-nmax3[d2], nmax3[d2] + 1, dtype=r.dtype)
        th = r[:, d2, None] * (2.0 * np.pi / box[d2]) * m[None, :]
        out.append((jnp.cos(th), jnp.sin(th)))
    return out


def _onehot_selectors(nvecs, nmax3, dtype):
    """Per-dim one-hot matrices Hd (Wd, K) with Hd[m + nmax, k] = 1 iff
    nvecs[k, d] = m.  Phase "gathers" become (N, W)@(W, K) MXU matmuls —
    XLA gathers of (N, K) from the small tables lowered ~3× SLOWER than
    the direct cos/sin they replaced on TPU (measured); one-hot matmuls
    are ~7× faster."""
    outs = []
    for d2 in range(3):
        w = 2 * nmax3[d2] + 1
        H = np.zeros((w, len(nvecs)), dtype)
        H[nvecs[:, d2] + nmax3[d2], np.arange(len(nvecs))] = 1.0
        outs.append(H)
    return outs


def _phases_from_tables(tables, onehots):
    """(N, K) C, S = Re/Im of Ex·Ey·Ez via one-hot matmuls."""
    (cx, sx), (cy, sy), (cz, sz) = tables
    Hx, Hy, Hz = onehots
    cxg, sxg = cx @ Hx, sx @ Hx
    cyg, syg = cy @ Hy, sy @ Hy
    czg, szg = cz @ Hz, sz @ Hz
    cxy = cxg * cyg - sxg * syg
    sxy = cxg * syg + sxg * cyg
    return cxy * czg - sxy * szg, cxy * szg + sxy * czg


def _wave_space_chunked(F, r, params: EwaldParams, radii=None, kc=4096,
                        axis_name=None):
    """Scan the k-sum in chunks of ``kc`` wavevectors (zero-weight pad)."""
    K = len(params.kvecs)
    pad = (-K) % kc
    kvp = np.concatenate(
        [params.kvecs, np.tile([[1.0, 0, 0]], (pad, 1))]).reshape(-1, kc, 3)
    wk_np = params.wk if radii is None else params.wk_raw
    wkp = np.concatenate([wk_np, np.zeros(pad)]).reshape(-1, kc)
    dtype = r.dtype
    hp = None
    tables = None
    if params.nvecs is not None:
        nmax3 = tuple(int(m) for m in np.abs(params.nvecs).max(axis=0))
        np_dt = np.float32 if dtype == jnp.float32 else np.float64
        nvp = np.concatenate([params.nvecs, np.zeros((pad, 3), np.int32)])
        hs = _onehot_selectors(nvp, nmax3, np_dt)
        hp = [h.T.reshape(-1, kc, h.shape[0]) for h in hs]  # (nc, kc, Wd)
        tables = _phase_tables(r, params.box, nmax3)

    def body(acc, kw):
        kv, wk, *oh = kw
        sub = params._replace(kvecs=kv, wk=wk, wk_raw=wk, nvecs=None)
        phases = (_phases_from_tables(tables, [o.T for o in oh])
                  if tables is not None else None)
        return acc + _wave_space_dense(F, r, sub, radii=radii,
                                       phases=phases,
                                       axis_name=axis_name), None

    xs = [jnp.asarray(kvp, dtype), jnp.asarray(wkp, dtype)]
    if hp is not None:
        xs.extend(jnp.asarray(h) for h in hp)
    acc0 = jnp.zeros(jnp.shape(F), dtype)
    U, _ = lax.scan(body, acc0, tuple(xs))
    return U


def _wave_space_dense(F, r, params: EwaldParams, radii=None, phases=None,
                      axis_name=None):
    dtype = r.dtype
    kv = jnp.asarray(params.kvecs, dtype)      # (K, 3)
    if radii is None:
        wk = jnp.asarray(params.wk, dtype)     # (K,)
    else:
        wk = jnp.asarray(params.wk_raw, dtype)
    khat = kv / jnp.linalg.norm(kv, axis=1, keepdims=True)
    if phases is None and params.nvecs is not None and len(kv) >= 1024:
        nmax3 = tuple(int(m) for m in np.abs(params.nvecs).max(axis=0))
        np_dt = np.float32 if dtype == jnp.float32 else np.float64
        hs = [jnp.asarray(h)
              for h in _onehot_selectors(params.nvecs, nmax3, np_dt)]
        phases = _phases_from_tables(_phase_tables(r, params.box, nmax3), hs)
    if phases is not None:
        C, S = phases
    else:
        theta = r @ kv.T                       # (N, K)
        C = jnp.cos(theta)
        S = jnp.sin(theta)
    if radii is not None:
        ka = jnp.linalg.norm(kv, axis=1)[None, :] * jnp.asarray(
            radii, dtype)[:, None]             # (N, K)
        sinc = jnp.sin(ka) / ka
        C = C * sinc
        S = S * sinc
    if F.ndim == 3:                            # (k, N, 3): shared phases
        ReF = jnp.einsum("nK,qnx->qKx", C, F)
        ImF = -jnp.einsum("nK,qnx->qKx", S, F)
        if axis_name is not None:
            ReF = lax.psum(ReF, axis_name)
            ImF = lax.psum(ImF, axis_name)
        ReP = wk[:, None] * (ReF - khat * jnp.sum(khat * ReF, axis=-1,
                                                  keepdims=True))
        ImP = wk[:, None] * (ImF - khat * jnp.sum(khat * ImF, axis=-1,
                                                  keepdims=True))
        return (jnp.einsum("nK,qKx->qnx", C, ReP)
                - jnp.einsum("nK,qKx->qnx", S, ImP))
    ReF = C.T @ F                              # (K, 3) = Re Σ e^{-ikr} F
    ImF = -(S.T @ F)
    if axis_name is not None:
        ReF = lax.psum(ReF, axis_name)
        ImF = lax.psum(ImF, axis_name)
    # transverse projection + weight
    ReP = wk[:, None] * (ReF - khat * jnp.sum(khat * ReF, axis=1, keepdims=True))
    ImP = wk[:, None] * (ImF - khat * jnp.sum(khat * ImF, axis=1, keepdims=True))
    return C @ ReP - S @ ImP


def mobility_apply(F, r, params: EwaldParams, row_tile=512, radii=None,
                   poly_tables: PolyTables = None, max_nbr=None, grid=None):
    """Full periodic RPY product U = M_per(r)·F, SPD by construction.

    radii: optional (N,) per-blob physical radii — exact polydisperse
    periodic RPY (sinc(kaᵢ)sinc(kaⱼ) symbol; real-space shifts r±(aᵢ∓aⱼ)).
    grid: optional :class:`rigid_body_light_tpu.ops.ewald_pme.EwaldGrid` —
    evaluate the wave part on the cell-spectral grid at O(N + G³·p³·log G)
    instead of the O(N·K) dense k-sum (the at-scale balanced-splitting
    mode; polydisperse needs the grid built with the same ``radii=``).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    F = jnp.asarray(F, r.dtype).reshape(-1, 3)
    dtype = r.dtype
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    a_self = (jnp.asarray(params.a, dtype) if radii is None
              else jnp.asarray(radii, dtype)[:, None])
    if params.rc is not None:
        from rigid_body_light_tpu.ops import ewald_cells

        U = ewald_cells.real_space_apply_cells(
            F, r, params, max_nbr=max_nbr, radii=radii,
            poly_tables=poly_tables)
    else:
        U = real_space_apply(F, r, params, row_tile=row_tile, radii=radii,
                             poly_tables=poly_tables)
    U = U + self_coeff(a_self, xi, eta) * F
    if grid is not None:
        from rigid_body_light_tpu.ops import ewald_pme

        if (radii is None) != (grid.sidx is None):
            raise ValueError("gridded wave part: build the grid with the "
                             "same radii= as the apply (polydisperse needs "
                             "species sinc tables)")
        return U + ewald_pme.wave_space_apply_grid(F, r, params, grid)
    U = U + wave_space_apply(F, r, params, radii=radii)
    return U


def mobility_apply_multi(Fs, r, params: EwaldParams, row_tile=512, radii=None,
                         poly_tables: PolyTables = None, max_nbr=None,
                         grid=None):
    """Multi-RHS periodic product (k, N, 3) → (k, N, 3) with SHARED pair
    fields: the real-space (A, B) coefficient sweep and the wave-space
    phase matrices are computed once and applied to every RHS — the fused
    2-RHS Lanczos noise pays ~half the single-RHS×k cost."""
    r = jnp.asarray(r).reshape(-1, 3)
    Fs = jnp.asarray(Fs, r.dtype)
    dtype = r.dtype
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    a_self = (jnp.asarray(params.a, dtype) if radii is None
              else jnp.asarray(radii, dtype)[:, None])
    if params.rc is not None:
        from rigid_body_light_tpu.ops import ewald_cells

        U = ewald_cells.real_space_apply_cells(
            Fs, r, params, max_nbr=max_nbr, radii=radii,
            poly_tables=poly_tables)
    else:
        U = real_space_apply(Fs, r, params, row_tile=row_tile, radii=radii,
                             poly_tables=poly_tables)
    U = U + self_coeff(a_self, xi, eta) * Fs
    if grid is not None:
        from rigid_body_light_tpu.ops import ewald_pme

        if (radii is None) != (grid.sidx is None):
            raise ValueError("gridded wave part: build the grid with the "
                             "same radii= as the apply (polydisperse needs "
                             "species sinc tables)")
        return U + ewald_pme.wave_space_apply_grid(Fs, r, params, grid)
    U = U + wave_space_apply(Fs, r, params, radii=radii)
    return U


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


# ------------------------------------------------------------- distributed
def real_space_block(r_rows, row_ids, r_cols, col_ids, F_cols,
                     params: EwaldParams, row_tile=512):
    """Screened real-space pair terms of a (rows × column-block) slab.

    The building block of the distributed (ring) periodic sweep: rows are
    a device's local blobs, columns one in-flight ring block; global ids
    mask the self pair.  Monodisperse; F_cols (N_c, 3) single RHS or
    (k, N_c, 3) multi-RHS with shared pair fields (the fused two-draw
    Lanczos noise path).  Same A/B fields as :func:`real_space_apply`
    (f32 uses the f64-fitted Chebyshev forms).
    """
    multi_rhs = F_cols.ndim == 3
    dtype = r_rows.dtype
    n_r = r_rows.shape[0]
    n_c = r_cols.shape[0]
    a = jnp.asarray(params.a, dtype)
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    tile = min(row_tile, n_r)
    n_tiles = -(-n_r // tile)
    n_pad = n_tiles * tile
    r_pad = jnp.pad(r_rows, ((0, n_pad - n_r), (0, 0)))
    id_pad = jnp.pad(row_ids, (0, n_pad - n_r), constant_values=-1)

    def tile_fn(start):
        ri = lax.dynamic_slice(r_pad, (start, jnp.int32(0)), (tile, 3))
        rid = lax.dynamic_slice(id_pad, (start,), (tile,))
        d = _wrap3(ri[:, None, :] - r_cols[None, :, :], params.box)
        r2 = jnp.sum(d * d, axis=-1)
        self_mask = rid[:, None] == col_ids[None, :]
        rr = jnp.sqrt(jnp.where(self_mask, 1.0, jnp.maximum(r2, 1e-24)))
        if dtype == jnp.float32:
            A, B = _cheb_ab(rr, params.cheb_bounds, params.cheb_A,
                            params.cheb_B)
        else:
            A, B = real_space_ab(rr, a, xi, eta)
        A = jnp.where(self_mask, 0.0, A)
        B = jnp.where(self_mask, 0.0, B)
        if params.rc is not None:
            cut = rr <= params.rc
            A = jnp.where(cut, A, 0.0)
            B = jnp.where(cut, B, 0.0)
        e = d / rr[..., None]
        if multi_rhs:
            eF = jnp.einsum("tnx,knx->ktn", e, F_cols)
            return (jnp.einsum("tn,knx->ktx", A, F_cols)
                    + jnp.einsum("ktn,tn,tnx->ktx", eF, B, e))
        eF = jnp.einsum("tnx,nx->tn", e, F_cols)
        return (jnp.einsum("tn,nx->tx", A, F_cols)
                + jnp.einsum("tn,tn,tnx->tx", B, eF, e))

    if n_tiles == 1:
        U = tile_fn(jnp.int32(0))
        return U[..., :n_r, :]
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    U = lax.map(tile_fn, starts)
    if multi_rhs:
        U = U.transpose(1, 0, 2, 3).reshape(F_cols.shape[0], n_pad, 3)
    else:
        U = U.reshape(n_pad, 3)
    return U[..., :n_r, :]


def mobility_apply_local(F_l, r_l, params: EwaldParams, n_devices: int,
                         axis_name: str, row_tile=512, max_nbr=None,
                         radii_l=None, poly_tables: PolyTables = None):
    """Local-shard periodic RPY product for use INSIDE ``shard_map``.

    Distributed triply-periodic Ewald: the screened real-space sweep rides
    a D-step ``ppermute`` ring over (N/D, 3) blocks (the next block's
    transfer is issued before the current block's compute so XLA overlaps
    ICI with the slab), the wave part closes its (K, 3) k-space moments
    with one ``psum`` (phases stay local), and the self term is
    elementwise.  Matches :func:`mobility_apply` to machine precision —
    unlike minimum-image approximations, the distributed operator IS the
    exact periodic operator.  F_l (N_l, 3) or multi-RHS (k, N_l, 3) with
    shared pair fields.

    Balanced-splitting params (``rc=``) route the real part through the
    distributed sorted-tile sweep instead of the ring
    (:func:`rigid_body_light_tpu.ops.ewald_cells.
    real_space_apply_cells_local` — O(N·ρ·rc³/D) per device), matching
    the single-device dispatch; ``max_nbr`` is its neighbor-list width.

    radii_l: optional (N_l,) local per-blob radii — exact polydisperse
    periodic RPY, balanced-splitting (rc) configs only (the ring's
    monodisperse real-space blocks do not carry radii); ``poly_tables``
    must be built from the GLOBAL device-major radii (f32).
    """
    r_l = jnp.asarray(r_l).reshape(-1, 3)
    F_l = jnp.asarray(F_l, r_l.dtype)
    F_l = F_l if F_l.ndim == 3 else F_l.reshape(-1, 3)
    dtype = r_l.dtype
    n_l = r_l.shape[0]
    if radii_l is not None and params.rc is None:
        raise NotImplementedError(
            "distributed polydisperse Ewald needs balanced splitting "
            "(ewald_rc > 0) — the classic-split ring sweep is monodisperse")
    if params.rc is not None:
        from rigid_body_light_tpu.ops import ewald_cells

        acc = ewald_cells.real_space_apply_cells_local(
            F_l, r_l, params, n_devices, axis_name, max_nbr=max_nbr,
            radii_l=radii_l, poly_tables=poly_tables)
    else:
        idx = lax.axis_index(axis_name)
        row_ids = idx * n_l + jnp.arange(n_l, dtype=jnp.int32)
        perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
        acc = jnp.zeros_like(F_l)
        blk_r, blk_F = r_l, F_l
        for s in range(n_devices):
            if s < n_devices - 1:
                nxt_r = lax.ppermute(blk_r, axis_name, perm)
                nxt_F = lax.ppermute(blk_F, axis_name, perm)
            src = (idx - s) % n_devices
            col_ids = src * n_l + jnp.arange(n_l, dtype=jnp.int32)
            acc = acc + real_space_block(r_l, row_ids, blk_r, col_ids,
                                         blk_F, params, row_tile=row_tile)
            if s < n_devices - 1:
                blk_r, blk_F = nxt_r, nxt_F
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    a_self = (jnp.asarray(params.a, dtype) if radii_l is None
              else jnp.asarray(radii_l, dtype)[:, None])
    U = acc + self_coeff(a_self, xi, eta) * F_l
    return U + wave_space_apply(F_l, r_l, params, radii=radii_l,
                                axis_name=axis_name)
