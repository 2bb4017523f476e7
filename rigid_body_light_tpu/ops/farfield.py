"""Proxy-grid far field for the open-domain RPY matvec (single level).

The open/wall-bounded pair sweeps are O(N²); the measured low-rank study
(BENCH_NOTES "Low-rank far-field") showed well-separated tile blocks are
numerically low-rank and, on TPU, essentially free once expressed as
matmuls.  This module is the GO recommendation from that study: a
black-box-FMM-style single-level scheme on a uniform supercell grid.

    M ≈ M_near (exact pairs, adjacent cells)  +  Pᵀ · K · P  (far)

  - P (anterpolation): each blob spreads onto the p³ tensor-Chebyshev
    nodes of its cell — separable Lagrange weights, two dense einsums
    per application, O(N·p³).
  - K (M2L): node→node RPY blocks between NON-adjacent cells.  On a
    uniform grid K depends only on the cell OFFSET, so the whole far
    field is a 3-D convolution over the cell grid — evaluated by FFT:
    Û(q) = K̂(q)·Q̂(q), a batched (3p³ × 3p³) matmul per frequency (MXU),
    with K̂ built from O((2G)³·p⁶) kernel evaluations instead of O(G⁶).
  - M_near: blob pairs in adjacent cells (∞-norm cell offset ≤ 1),
    swept exactly over cell-snake equal-population tiles
    (:func:`rigid_body_light_tpu.ops.tiles.cell_snake_order` — robust to
    body-scale clustering, and cell-aligned so neighbor-tile lists stay
    narrow), masked PAIRWISE by cell adjacency so near/far partition
    every pair exactly once.

Everything is O(N·ρ·h³ + G³·p⁶) per apply with static shapes; the only
static bound is the neighbor-tile list width (overflow NaN-poisons, as
in ewald_cells).  The grid is anchored to the dynamic bounding box, so
no domain configuration is needed; pass anisotropic ``grid`` counts to
keep cells near-cubic for flat (sedimented) geometries.

Polydisperse (per-blob radii) far fields stay translation-invariant by
splitting the pair kernel over its radius dependence, which is exactly
low-order polynomial:

  - free space (far branch):  M = K₀(r) + (âᵢ²+âⱼ²)·K₂(r) — two kernel
    lattices; the â² moments ride the same FFTs as extra RHS channels.
  - wall images (geometric-mean a_eff convention of
    :func:`rigid_body_light_tpu.ops.rpy._pair_tile`): the Swan–Brady
    coefficients split by image-distance power — 1/R terms are
    radius-independent, 1/R³ terms scale by âᵢâⱼ, 1/R⁵ by (âᵢâⱼ)² —
    three kernel lattices (see :func:`_wall_coeffs_split`).

Requirement (documented, not checked): cells no smaller than the
largest pair contact distance, h ≥ max(âᵢ+âⱼ), so every far (cell-
nonadjacent) pair is in the non-overlapping branch.  Auto grids at
tile-scale cell populations satisfy this by orders of magnitude.

Accuracy knob: p (nodes per dim).  Measured against the exact sweep in
``tests/test_farfield.py``; pick p=4 for ~1e-3, p=6 for ~1e-5.

Reference counterpart: none — the reference evaluates dense O(N²) RPY
(``c_rigid_obj.cpp:413-459``); this is the path past 10⁵ blobs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rigid_body_light_tpu.ops import fftsafe, rpy, tiles


def _pallas_available():
    try:
        from rigid_body_light_tpu.ops import rpy_pallas

        return rpy_pallas.available()
    except Exception:  # pragma: no cover
        return False

# Near-sweep tile size: 4× coarser than the generic pair-tiling unit
# (tiles.TILE = 32, which sized the original farfield near sweep) but still
# far finer than the Pallas pair-kernel column tile (rpy_pallas.TC = 512).
# The neighbor lists are built at tile granularity, so the
# candidate-over-true-pair waste scales with how many cells a tile spans.
# At bench density (~31 blobs/cell) 512-blob tiles span ~17 cells and sweep
# ~33× more candidates than true adjacent-cell neighbors; 128-blob tiles
# cut that to ~5× (measured 27648 → 4096 candidate columns per blob at the
# 40.96k case) while keeping the O(t²) list build small.
TILE = 128
_SELF_COEF = 4.0 / 3.0


# ----------------------------------------------------------------- basis
def _cheb_nodes(p: int) -> np.ndarray:
    """p Chebyshev points mapped to (0, 1)."""
    k = np.arange(p)
    return (np.cos(np.pi * (k + 0.5) / p)[::-1] + 1.0) / 2.0


def _lagrange_weights(t, nodes):
    """(..., p) Lagrange basis values at t ∈ [0, 1] (product form)."""
    p = len(nodes)
    nd = np.asarray(nodes)
    denom = np.array([np.prod(nd[k] - np.delete(nd, k)) for k in range(p)])
    diff = t[..., None] - jnp.asarray(nd, t.dtype)          # (..., p)
    full = jnp.prod(diff, axis=-1, keepdims=True)           # Π (t - t_j)
    # stable: Π_{j≠k} (t−t_j) = full / (t−t_k), guarded at nodes
    tiny = jnp.asarray(1e-30, t.dtype)
    safe = jnp.where(jnp.abs(diff) < tiny, tiny, diff)
    terms = full / safe
    exact = jnp.abs(diff) < tiny                            # t on a node
    any_exact = jnp.any(exact, axis=-1, keepdims=True)
    w = jnp.where(any_exact, exact.astype(t.dtype),
                  terms / jnp.asarray(denom, t.dtype))
    return w


@functools.lru_cache(maxsize=None)
def _outer_selectors(a: int, b: int):
    """Selector matrices for the flattened outer product (see
    :func:`_flat_outer`): L (a, ab) with L[i, i·b+j] = 1 and
    R (b, ab) with R[j, i·b+j] = 1."""
    L = np.kron(np.eye(a, dtype=np.float32), np.ones((1, b), np.float32))
    R = np.kron(np.ones((1, a), np.float32), np.eye(b, dtype=np.float32))
    return L, R


def _flat_outer(u, v):
    """Row-wise outer product flattened WITHOUT a (..., a, b) intermediate:
    out[n, i·b+j] = u[n, i]·v[n, j], shapes (n, a)·(n, b) → (n, ab).

    TPU lane layout pads the two minor dims of every materialized buffer
    to (8, 128); a (N, p, p)- or (N, p³, 3)-shaped op boundary at N=10⁶
    inflates 40×+ (the 1M-blob wall probe OOM'd on exactly such a 34 GiB
    fusion output).  Two tiny selector matmuls keep every boundary 2-D
    with the product dim minor."""
    L, R = _outer_selectors(u.shape[-1], v.shape[-1])
    return (u @ jnp.asarray(L, u.dtype)) * (v @ jnp.asarray(R, v.dtype))


def _blob_weights(t3, nodes):
    """(N, 3) fractional coords → (N, p³) separable tensor weights."""
    wx = _lagrange_weights(t3[:, 0], nodes)
    wy = _lagrange_weights(t3[:, 1], nodes)
    wz = _lagrange_weights(t3[:, 2], nodes)
    return _flat_outer(_flat_outer(wx, wy), wz)


# ----------------------------------------------------------- grid/binning
def _geometry_from_bounds(lo, hi, grid):
    span = jnp.maximum(hi - lo, 1e-6) * (1.0 + 1e-5)
    h = span / jnp.asarray(grid, lo.dtype)
    return lo, h


def _grid_geometry(x, grid):
    """Dynamic bbox → (lo, h) with h per-dim cell sizes (units of a)."""
    return _geometry_from_bounds(jnp.min(x, axis=0), jnp.max(x, axis=0), grid)


def _cell_indices(x, lo, h, grid):
    gx, gy, gz = grid
    ci = jnp.clip(((x - lo) / h).astype(jnp.int32), 0,
                  jnp.asarray(grid, jnp.int32) - 1)          # (N, 3)
    cid = (ci[:, 0] * gy + ci[:, 1]) * gz + ci[:, 2]
    return ci, cid


# --------------------------------------------------------------- far part
def _signed_offsets(g: int) -> np.ndarray:
    """Signed cell offsets Δ = c_target − c_source on the 2g cyclic pad."""
    o = np.arange(2 * g)
    return np.where(o < g, o, o - 2 * g).astype(np.int64)


def _free_split_coeffs(r2, dtype):
    """Far-branch free-space RPY split by radius dependence.

    α_far = 1/r + (âᵢ²+âⱼ²)/(3r³),  β_far = 1/r³ − (âᵢ²+âⱼ²)/r⁵
    (rpy._free_coeffs_poly far branch), so the pair kernel is
    K₀ + (âᵢ²+âⱼ²)·K₂ with K₀: (α,β) = (1/r, 1/r³) and
    K₂: (α,β) = (1/(3r³), −1/r⁵) — both translation invariant.

    r² is floored at 1e-2 (far node pairs are ≥ one cell apart, ≳ 1 in
    units of a; the floor only bounds the masked near-offset entries so
    0·∞ cannot poison the lattice in f32).
    """
    r2s = jnp.maximum(r2, 1e-2)
    invr2 = 1.0 / r2s
    invr = jnp.sqrt(invr2)
    invr3 = invr * invr2
    invr5 = invr3 * invr2
    return ((invr.astype(dtype), invr3.astype(dtype)),
            ((invr3 / 3.0).astype(dtype), (-invr5).astype(dtype)))


def _far_kernel_hat(h, grid, p, dtype, poly=False, near_excl=1):
    """K̂: half-spectrum FFT over the offset grid of the masked node→node
    RPY blocks, as (nk, n_freq, B, B) with B = 3p³.

    nk = 1 (monodisperse RPY) or 2 (``poly``: the K₀/K₂ radius split of
    :func:`_free_split_coeffs`; channel 1 is contracted against the â²
    moments and read back with â² output weights).

    Built inside the trace (h is dynamic) — O((2G)³·p⁶) kernel
    evaluations.  XLA's loop-invariant code motion does NOT hoist this
    ``lax.map`` out of Krylov ``while`` bodies (measured: ~160 ms per
    GMRES iteration), so loop hosts must hoist it explicitly via
    :func:`prepare` / :class:`FarCtx`.  Memory discipline (the naive
    one-shot build OOM'd a 16 GB chip at G=11, p=4 via 6.3×-padded
    (2G,2G,2G,B,B) temps): the lattice is built in x-offset slabs under
    ``lax.map`` (one (2Gy·2Gz, p³, p³) evaluation at a time), each slab
    is rfft'd over z / fft'd over y in place, and only the half
    spectrum (K real → Hermitian-even K̂) is ever materialized, with
    the frequency axes flattened so the MXU-sized (B, B) dims stay
    minor (offset-minor layouts pad 22 → 128).
    """
    gx, gy, gz = grid
    nodes = _cheb_nodes(p)
    p3 = p ** 3
    tn = jnp.asarray(
        np.stack(np.meshgrid(nodes, nodes, nodes, indexing="ij"),
                 axis=-1).reshape(-1, 3), dtype)             # (p³, 3)
    dn = tn[:, None, :] - tn[None, :, :]                     # (p³, p³, 3)
    oyz = np.stack(np.meshgrid(_signed_offsets(gy), _signed_offsets(gz),
                               indexing="ij"), axis=-1).reshape(-1, 2)
    far_yz = np.any(np.abs(oyz) > near_excl, axis=-1)        # (2gy·2gz,)
    oyz3 = np.concatenate([np.zeros((len(oyz), 1)), oyz], axis=1)
    oyz_j = jnp.asarray(oyz3, dtype)                         # (m, 3) x=0
    far_yz_j = jnp.asarray(far_yz)
    ox = jnp.asarray(_signed_offsets(gx), dtype)             # (2gx,)
    eye = jnp.eye(3, dtype=dtype)

    def slab(ox_val):
        off = oyz_j.at[:, 0].add(ox_val)                     # (m, 3)
        # d = node_n(target) − node_m(source) = (t_n − t_m + Δ)·h
        d = (dn[None] + off[:, None, None, :]) * h           # (m, p³, p³, 3)
        r2 = jnp.sum(d * d, axis=-1)
        if poly:
            coeffs = _free_split_coeffs(r2, dtype)
        else:
            coeffs = (rpy._free_coeffs(r2, dtype),)
        far = (far_yz_j | (jnp.abs(ox_val) > near_excl + 0.5)).astype(
            dtype)[:, None, None]                            # exclude near(+band)
        Ks = []
        for alpha, beta in coeffs:
            alpha = alpha * far
            beta = beta * far
            K = (alpha[..., None, None] * eye
                 + beta[..., None, None] * d[..., :, None] * d[..., None, :])
            K = K.transpose(0, 1, 3, 2, 4).reshape(-1, 3 * p3, 3 * p3)
            K = K.reshape(2 * gy, 2 * gz, 3 * p3, 3 * p3)
            Kf = jnp.fft.rfft(K, axis=1)                     # (2gy, gz+1, B, B)
            Ks.append(jnp.fft.fft(Kf, axis=0))
        return jnp.stack(Ks)                                 # (nk, 2gy, gz+1, B, B)

    Kh = lax.map(slab, ox)                                   # (2gx, nk, 2gy, gz+1, B, B)
    Kh = jnp.fft.fft(Kh, axis=0)
    nk = Kh.shape[1]
    return _pack_hat(Kh.transpose(1, 0, 2, 3, 4, 5).reshape(
        nk, 2 * gx * 2 * gy * (gz + 1), 3 * p3, 3 * p3), axis=1)


def _pack_hat(Kc, axis=0):
    """Complex kernel lattice → packed real (re, im) stacked at ``axis``.

    The frequency-domain convolution with complex khat lowers as batched
    complex GEMVs (4 real multiplies at RHS width 1 — MXU-hostile, and
    the interleaved complex layout strides every read).  Storing khat as
    a real (2, ...) pair and packing the RHS's re/im as 2k GEMM columns
    runs the same contraction as TWO real einsums — measured 2.0× at k=1
    and 3.3× at k=2 on the exact production shapes
    (scripts/tpu_conv_variants.py ``conv_pack``).  Same bytes as the
    complex array; built once per FarCtx/FarGeo.
    """
    return jnp.stack([jnp.real(Kc), jnp.imag(Kc)], axis=axis)


def _conv_pack(Kh, Qf):
    """Packed 3-D-spectrum conv: Kh (2, o, i, j) real × Qf (k, o, j)
    complex → (k, o, i) complex (see :func:`_pack_hat`)."""
    k = Qf.shape[0]
    rhs = jnp.concatenate([jnp.real(Qf), jnp.imag(Qf)], axis=0)
    rhs = rhs.transpose(1, 2, 0)                             # (o, j, 2k)
    ar = jnp.einsum("oij,ojc->oic", Kh[0], rhs)
    br = jnp.einsum("oij,ojc->oic", Kh[1], rhs)
    ur = ar[..., :k] - br[..., k:]
    ui = ar[..., k:] + br[..., :k]
    return lax.complex(ur, ui).transpose(2, 0, 1)


def _conv_pack_z(Kh, Qf):
    """Packed z-coupled conv (wall / pseudo-2D lattices): Kh
    (2, t, s, f, i, j) real × Qf (k, s, f, j) complex → (k, t, f, i)
    complex — contracts source z-slab s and node j together."""
    k = Qf.shape[0]
    rhs = jnp.concatenate([jnp.real(Qf), jnp.imag(Qf)], axis=0)
    ar = jnp.einsum("tsfij,csfj->ctfi", Kh[0], rhs)
    br = jnp.einsum("tsfij,csfj->ctfi", Kh[1], rhs)
    ur = ar[:k] - br[k:]
    ui = ar[k:] + br[:k]
    return lax.complex(ur, ui)


def _p2m(W3, cid, Fs, ncell, p):
    """Anterpolate forces onto cell nodes: Q (k, ncell, B=3p³).

    Every op boundary stays 2-D/3-D with the 3p³ product dim MINOR — a
    (k, N, p³, 3) broadcast product would lane-pad 3 → 128 and OOM at
    10⁶ blobs (see :func:`_flat_outer`)."""
    k, n = Fs.shape[0], Fs.shape[1]
    p3 = p ** 3
    L, R = _outer_selectors(p3, 3)
    # prod[k, n, 3q+x] = W3[n, q] · Fs[k, n, x]
    prod = (W3 @ jnp.asarray(L, W3.dtype))[None] * (
        Fs @ jnp.asarray(R, Fs.dtype))
    Q = jax.ops.segment_sum(
        prod.transpose(1, 0, 2).reshape(n, k * p3 * 3),
        cid, num_segments=ncell)
    return Q.reshape(ncell, k, p3 * 3).transpose(1, 0, 2)


def _l2p(W3, cid, Unodes, p):
    """Interpolate node velocities back to blobs (same basis as P2M);
    the cell gather runs on the B=3p³-flat layout and the p³-sum is a
    (3p³, 3) selector matmul — no (k, N, p³, 3) boundary (lane padding
    would inflate it 42× at 10⁶ blobs)."""
    k = Unodes.shape[0]
    p3 = p ** 3
    local = Unodes.reshape(k, -1, p3 * 3)[:, cid]            # (k, N, 3p³)
    L, R = _outer_selectors(p3, 3)
    prod = (W3 @ jnp.asarray(L, W3.dtype))[None] * local
    return prod @ jnp.asarray(R.T, prod.dtype)               # (k, N, 3)


def _far_free(Qm, h, grid, p, khat=None):
    """Free-space far field on nodes: 3-D FFT convolution over cells
    (half spectrum — K and Q are real).

    Qm: (nm, k, ncell, B) moment channels — nm = 1 (monodisperse: [QF])
    or 2 (polydisperse: [QF, Q_{â²F}]).  Returns (nout, k, ncell, B)
    output channels the caller interpolates with weights [1] (mono) or
    [1, âᵢ²] (poly):

      U₀ = K₀*F + K₂*(â²F)   (unit output weight)
      U₂ = K₂*F              (âᵢ² output weight)
    """
    dtype = jnp.real(Qm).dtype
    nm, k = Qm.shape[0], Qm.shape[1]
    poly = nm == 2
    gx, gy, gz = grid
    B = Qm.shape[-1]
    Qg = jnp.zeros((nm * k, 2 * gx, 2 * gy, 2 * gz, B), dtype)
    Qg = Qg.at[:, :gx, :gy, :gz, :].set(
        Qm.reshape(nm * k, gx, gy, gz, B))
    Khat = khat if khat is not None else _far_kernel_hat(
        h, grid, p, dtype, poly=poly)                        # (nk, n_freq, B, B)
    Qhat = fftsafe.rfftn_lanes(Qg, axes=(1, 2, 3))           # (nm·k,2gx,2gy,gz+1,B)
    Qf = Qhat.reshape(nm, k, -1, B)
    if poly:
        U0 = _conv_pack(Khat[0], Qf[0]) + _conv_pack(Khat[1], Qf[1])
        U2 = _conv_pack(Khat[1], Qf[0])
        Uf = jnp.stack([U0, U2])                             # (2, k, nf, B)
    else:
        Uf = _conv_pack(Khat[0], Qf[0])[None]
    nout = Uf.shape[0]
    Uhat = Uf.reshape(nout * k, 2 * gx, 2 * gy, gz + 1, B)
    Ug = fftsafe.irfftn_lanes(Uhat, s=(2 * gx, 2 * gy, 2 * gz),
                              axes=(1, 2, 3))[
        :, :gx, :gy, :gz, :].astype(dtype)
    return Ug.reshape(nout, k, gx * gy * gz, B)


def _wall_coeffs_split(d_img, hj):
    """Swan–Brady wall coefficients split by image-distance power.

    Same algebra as :func:`rigid_body_light_tpu.ops.rpy._wall_coeffs`
    (f = f1·I + f2·e⊗e + f3·e⊗ẑ + f4·ẑ⊗e + f5·ẑ⊗ẑ) but returned as three
    channels parts[m] = (f1..f5): the 1/R terms (m=0), 1/R³ terms (m=1)
    and 1/R⁵ terms (m=2), with parts[0]+parts[1]+parts[2] equal to the
    equal-radius coefficients.  In the geometric-mean a_eff = √(aᵢaⱼ)
    convention (rpy._pair_tile polydisperse wall path) the physical
    correction is parts[0] + (âᵢâⱼ)·parts[1] + (âᵢâⱼ)²·parts[2]: the
    dimensionless h_hat/ez factors are scale invariant, and the 1/a_eff
    prefactor times (a_eff/R)^m leaves (âᵢâⱼ)^((m−1)/2 ·2).
    """
    rz = d_img[..., 2]
    h_hat = hj / jnp.maximum(rz, 1e-12)
    r2 = jnp.sum(d_img * d_img, axis=-1)
    invR = lax.rsqrt(jnp.maximum(r2, 1e-2))
    ez = rz * invR
    ez2 = ez * ez
    invR3 = invR * invR * invR
    invR5 = invR3 * invR * invR
    hh = h_hat * (1.0 - h_hat)
    p0 = (-(1.0 + 2.0 * hh * ez2) * invR,
          -(1.0 - 6.0 * hh * ez2) * invR,
          2.0 * ez * h_hat * (1.0 - 6.0 * (1.0 - h_hat) * ez2) * invR,
          2.0 * ez * h_hat * invR,
          -4.0 * h_hat * h_hat * ez2 * invR)
    p1 = (-(2.0 / 3.0) * (1.0 - 3.0 * ez2) * invR3,
          2.0 * (1.0 - 5.0 * ez2) * invR3,
          -4.0 * ez * (1.0 - 5.0 * ez2) * invR3,
          jnp.zeros_like(invR3),
          -4.0 * ez2 * invR3)
    p2 = ((2.0 / 3.0) * (1.0 - 5.0 * ez2) * invR5,
          -(10.0 / 3.0) * (1.0 - 7.0 * ez2) * invR5,
          (20.0 / 3.0) * ez * (2.0 - 7.0 * ez2) * invR5,
          -(20.0 / 3.0) * ez * invR5,
          -(4.0 / 3.0) * (2.0 - 15.0 * ez2) * invR5)
    return (p0, p1, p2), invR


def _wall_kernel_hat(lo_z, h, grid, p, dtype, h_floor, poly=False,
                     near_excl=1):
    """K̂_wall[czi, czj]: per-z-cell-pair xy-offset lattices of Swan–Brady
    node blocks, 2-D FFT'd over the padded xy offsets.

    The image kernel is translation-invariant in xy only (it depends on
    zᵢ, zⱼ separately), so z stays an explicit Gz² pairing — cheap for
    the flat sedimented geometries walls imply (pick anisotropic
    ``grid`` with small Gz).  Near xy-offsets are zeroed exactly where
    the pair can be near (|Δz_cell| ≤ 1), matching the sweep's cell-
    adjacency partition.

    Built per-target-z-cell slab under ``lax.map`` (memory discipline as
    in :func:`_far_kernel_hat`), stored as the y half-spectrum
    (n_target_z, n_source_z, xy_freq, B, B).
    """
    gx, gy, gz = grid
    nodes = _cheb_nodes(p)
    p3 = p ** 3
    B = 3 * p3
    # Slab granularity is (target-z-cell × x-offset): the coarser
    # target-z-only slabs carried (gz, 2gx·2gy, p³, p³, 3)-shaped temps
    # whose minor (p³, 3) dims lane-pad to (p³, 128) — 8.2 GiB each at a
    # (14, 14, 5) 1M-blob wall grid (two of them OOM'd the 16 GiB chip).
    # Per (ci, ox) slab the same temps are (gz, 2gy, p³, p³, 3) — 2gx×
    # smaller; the x-FFT moves outside the map (FFT axes commute).
    oy = _signed_offsets(gy)
    near_y = np.abs(oy) <= near_excl                         # (2gy,)
    ox_np = _signed_offsets(gx)
    near_x = np.abs(ox_np) <= near_excl                      # (2gx,)
    tn = jnp.asarray(
        np.stack(np.meshgrid(nodes, nodes, nodes, indexing="ij"),
                 axis=-1).reshape(-1, 3), dtype)             # (p³, 3)
    dtx = tn[:, None, 0] - tn[None, :, 0]                    # (p³, p³)
    dy = (jnp.asarray(oy, dtype)[:, None, None]
          + tn[None, :, None, 1] - tn[None, None, :, 1]) * h[1]
    # z: node heights per z-cell, floored like every wall evaluation
    cz = jnp.arange(gz, dtype=dtype)
    zn = lo_z + (cz[:, None] + tn[None, :, 2]) * h[2]        # (gz, p³)
    znf = jnp.maximum(zn, h_floor) if h_floor > 0 else zn
    eye = jnp.eye(3, dtype=dtype)
    zhat = jnp.zeros(3, dtype).at[2].set(1.0)
    near_y_j = jnp.asarray(near_y)
    ox_j = jnp.asarray(ox_np, dtype)
    near_x_j = jnp.asarray(near_x)
    czj_near = jnp.arange(gz, dtype=jnp.int32)

    def slab(idx):
        ci = idx // (2 * gx)
        xi = idx % (2 * gx)
        dx = (ox_j[xi] + dtx) * h[0]                         # (p³, p³)
        zi = znf[ci][None, None, :, None]                    # target nodes
        zj = znf[:, None, None, :]                           # (czj, 1, 1, p³)
        d_img = jnp.stack(jnp.broadcast_arrays(
            dx[None, None], dy[None], zi + zj), axis=-1)     # (gz,2gy,p³,p³,3)
        parts, invR = _wall_coeffs_split(
            d_img, jnp.broadcast_to(zj, d_img.shape[:-1]))
        if not poly:
            parts = (tuple(a + b + c for a, b, c in zip(*parts)),)
        # zero exactly the near(+band) set: both cell-offset components
        # within near_excl (1 plain; _BAND_MAX with the band tier)
        near_z = jnp.abs(czj_near - ci) <= near_excl
        far = ~(near_z[:, None] & (near_x_j[xi] & near_y_j)[None, :])
        farb = far.astype(dtype)[..., None, None]            # (gz, 2gy, 1, 1)
        e = d_img * invR[..., None]
        Ws = []
        for f1, f2, f3, f4, f5 in parts:
            f1, f2, f3, f4, f5 = (f * farb for f in (f1, f2, f3, f4, f5))
            W = (f1[..., None, None] * eye
                 + f2[..., None, None] * e[..., :, None] * e[..., None, :]
                 + f3[..., None, None] * e[..., :, None] * zhat[None, :]
                 + f4[..., None, None] * zhat[:, None] * e[..., None, :]
                 + f5[..., None, None] * zhat[:, None] * zhat[None, :])
            # (gz, 2gy, p³, p³, 3, 3) → (gz, 2gy, B, B)
            W = W.transpose(0, 1, 2, 4, 3, 5).reshape(gz, 2 * gy, B, B)
            Ws.append(jnp.fft.rfft(W, axis=1))               # (gz, gy+1, B, B)
        return jnp.stack(Ws)                   # (nk, gz_s, gy+1, B, B)

    Kh = lax.map(slab, jnp.arange(gz * 2 * gx, dtype=jnp.int32))
    nk = Kh.shape[1]
    Kh = Kh.reshape(gz, 2 * gx, nk, gz, gy + 1, B, B)
    Kh = jnp.fft.fft(Kh, axis=1)                             # x-offset FFT
    return _pack_hat(Kh.transpose(2, 0, 3, 1, 4, 5, 6).reshape(
        nk, gz, gz, 2 * gx * (gy + 1), B, B), axis=1)


# ------------------------------------------------- band tier (round 5)
# Two-tier mixed-order far field: the FFT lattice's p⁶ storage makes high
# p unaffordable at production grids (p=6 blocks are 3.4 MB/frequency —
# 18 GB at a 102k wall grid), yet the p=4 operator error is DOMINATED by
# the closest non-adjacent cells (measured interpolation error by cell
# offset: p=4 → 6e-3 at offset 2, 1e-3 at 3, 2.3e-4 at ≥4; p=6 → 1.7e-4
# at offset 2).  So ``farfield_band_p`` adds a BAND tier: cell offsets
# with ∞-norm in [2, _BAND_MAX] evaluated at high order (band_p) as a
# DIRECT banded block convolution (a few hundred MXU matmuls — no
# spectrum, storage ∝ the 316-offset band only), while the FFT tier is
# masked to offsets ≥ _BAND_MAX+1 where low p is already accurate.
# Net: p=6-class operator error at p=4 lattice cost.
_BAND_MAX = 3


def _band_offsets_free() -> np.ndarray:
    """All 3-D cell offsets with ∞-norm in [2, _BAND_MAX] — (316, 3)."""
    rng_ = np.arange(-_BAND_MAX, _BAND_MAX + 1)
    O = np.stack(np.meshgrid(rng_, rng_, rng_, indexing="ij"),
                 axis=-1).reshape(-1, 3)
    m = np.abs(O).max(axis=1)
    return O[(m >= 2) & (m <= _BAND_MAX)].astype(np.int64)


def _band_offsets_xy() -> np.ndarray:
    """All xy cell offsets with ∞-norm ≤ _BAND_MAX (the wall band is
    z-pair indexed; the band membership test lives in the block mask)."""
    rng_ = np.arange(-_BAND_MAX, _BAND_MAX + 1)
    OX, OY = np.meshgrid(rng_, rng_, indexing="ij")
    return np.stack([OX, OY], axis=-1).reshape(-1, 2).astype(np.int64)


def _band_blocks_free(h, bp, dtype, poly=False):
    """Free-space node blocks K_o at the band offsets:
    (nk, n_off, B6, B6), B6 = 3·bp³ — same row/col convention as
    :func:`_far_kernel_hat` (row = target node·comp, col = source)."""
    off = _band_offsets_free()
    nodes = _cheb_nodes(bp)
    p3 = bp ** 3
    tn = jnp.asarray(
        np.stack(np.meshgrid(nodes, nodes, nodes, indexing="ij"),
                 axis=-1).reshape(-1, 3), dtype)
    dn = tn[:, None, :] - tn[None, :, :]                     # (p³, p³, 3)
    off_j = jnp.asarray(off, dtype)
    eye = jnp.eye(3, dtype=dtype)

    def one(o):
        d = (dn + o[None, None, :]) * h                      # (p³, p³, 3)
        r2 = jnp.sum(d * d, axis=-1)
        coeffs = (_free_split_coeffs(r2, dtype) if poly
                  else (rpy._free_coeffs(r2, dtype),))
        Ks = []
        for alpha, beta in coeffs:
            K = (alpha[..., None, None] * eye
                 + beta[..., None, None] * d[..., :, None] * d[..., None, :])
            Ks.append(K.transpose(0, 2, 1, 3).reshape(3 * p3, 3 * p3))
        return jnp.stack(Ks)

    Kb = lax.map(one, off_j)                                 # (n_off, nk, B6, B6)
    return Kb.transpose(1, 0, 2, 3)


def _band_blocks_wall(lo_z, h, grid, bp, dtype, h_floor, poly=False):
    """Wall-correction band blocks (nk, n_oxy, gz, gz, B6, B6): all xy
    offsets with ∞-norm ≤ _BAND_MAX, z-cell-pair indexed like
    :func:`_wall_kernel_hat`, masked to the band set
    2 ≤ max(|oxy|∞, |czi−czj|) ≤ _BAND_MAX."""
    gz = grid[2]
    oxy = _band_offsets_xy()
    nodes = _cheb_nodes(bp)
    p3 = bp ** 3
    B6 = 3 * p3
    tn = jnp.asarray(
        np.stack(np.meshgrid(nodes, nodes, nodes, indexing="ij"),
                 axis=-1).reshape(-1, 3), dtype)
    oxy_j = jnp.asarray(oxy, dtype)
    oxy_norm = np.abs(oxy).max(axis=1)                       # (n_oxy,)
    dx = (oxy_j[:, None, None, 0]
          + tn[None, :, None, 0] - tn[None, None, :, 0]) * h[0]
    dy = (oxy_j[:, None, None, 1]
          + tn[None, :, None, 1] - tn[None, None, :, 1]) * h[1]
    cz = jnp.arange(gz, dtype=dtype)
    zn = lo_z + (cz[:, None] + tn[None, :, 2]) * h[2]        # (gz, p³)
    znf = jnp.maximum(zn, h_floor) if h_floor > 0 else zn
    eye = jnp.eye(3, dtype=dtype)
    zhat = jnp.zeros(3, dtype).at[2].set(1.0)
    oxy_norm_j = jnp.asarray(oxy_norm, jnp.int32)
    czi_idx = jnp.arange(gz, dtype=jnp.int32)

    def slab(ci):
        zi = znf[ci][None, None, :, None]
        zj = znf[:, None, None, :]                           # (czj, 1, 1, p³)
        d_img = jnp.stack(jnp.broadcast_arrays(
            dx[None], dy[None], zi + zj), axis=-1)           # (gz, m, p³, p³, 3)
        parts, invR = _wall_coeffs_split(
            d_img, jnp.broadcast_to(zj, d_img.shape[:-1]))
        if not poly:
            parts = (tuple(a + b + c for a, b, c in zip(*parts)),)
        dz = jnp.abs(jnp.arange(gz, dtype=jnp.int32) - ci)   # (gz,)
        mnorm = jnp.maximum(dz[:, None], oxy_norm_j[None, :])
        band = ((mnorm >= 2) & (mnorm <= _BAND_MAX)).astype(
            dtype)[..., None, None]                          # (gz, m, 1, 1)
        e = d_img * invR[..., None]
        Ws = []
        for f1, f2, f3, f4, f5 in parts:
            f1, f2, f3, f4, f5 = (f * band for f in (f1, f2, f3, f4, f5))
            W = (f1[..., None, None] * eye
                 + f2[..., None, None] * e[..., :, None] * e[..., None, :]
                 + f3[..., None, None] * e[..., :, None] * zhat[None, :]
                 + f4[..., None, None] * zhat[:, None] * e[..., None, :]
                 + f5[..., None, None] * zhat[:, None] * zhat[None, :])
            Ws.append(W.transpose(0, 1, 2, 4, 3, 5).reshape(
                gz, -1, B6, B6))
        return jnp.stack(Ws)                   # (nk, gz_s, n_oxy, B6, B6)

    Kh = lax.map(slab, czi_idx)                # (gz_t, nk, gz_s, n_oxy, B6, B6)
    return Kh.transpose(1, 3, 0, 2, 4, 5)      # (nk, n_oxy, gz_t, gz_s, B6, B6)


def _band_apply_free(Kb, Q, grid):
    """Direct banded block convolution (free kernel): Q (nm, k, ncell, B6)
    × Kb (nk, n_off, B6, B6) → (nout, k, ncell, B6) with
    :func:`_far_free`'s channel conventions."""
    gx, gy, gz = grid
    off = _band_offsets_free()
    cidx = np.stack(np.meshgrid(np.arange(gx), np.arange(gy),
                                np.arange(gz), indexing="ij"),
                    axis=-1).reshape(-1, 3)
    src = cidx[None, :, :] - off[:, None, :]
    ok = np.all((src >= 0) & (src < np.array([gx, gy, gz])), axis=-1)
    flat = (src[..., 0] * gy + src[..., 1]) * gz + src[..., 2]
    idx = jnp.asarray(np.where(ok, flat, 0), jnp.int32)     # (n_off, ncell)
    okf = jnp.asarray(ok, Q.dtype)
    nm, k, ncell, B6 = Q.shape
    poly = nm == 2
    Qf = Q.reshape(nm * k, ncell, B6)

    def body(acc, xs):
        K_o, ix, okv = xs
        Qs = (Qf[:, ix, :] * okv[None, :, None]).reshape(nm, k, ncell, B6)
        if poly:
            U0 = (jnp.einsum("ij,kcj->kci", K_o[0], Qs[0])
                  + jnp.einsum("ij,kcj->kci", K_o[1], Qs[1]))
            U2 = jnp.einsum("ij,kcj->kci", K_o[1], Qs[0])
            upd = jnp.stack([U0, U2])
        else:
            upd = jnp.einsum("ij,kcj->kci", K_o[0], Qs[0])[None]
        return acc + upd, None

    nout = 2 if poly else 1
    acc0 = jnp.zeros((nout, k, ncell, B6), Q.dtype)
    acc, _ = lax.scan(body, acc0, (Kb.transpose(1, 0, 2, 3), idx, okf))
    return acc


def _band_apply_wall(Kw, Q, grid):
    """Direct banded block convolution (wall correction): Q
    (nm, k, ncell, B6) × Kw (nk, n_oxy, gz_t, gz_s, B6, B6) →
    (nm, k, ncell, B6) output channels (:func:`_far_wall`'s convention:
    interpolation weights [1] mono / [1, âᵢ, âᵢ²] poly)."""
    gx, gy, gz = grid
    oxy = _band_offsets_xy()
    cxy = np.stack(np.meshgrid(np.arange(gx), np.arange(gy),
                               indexing="ij"), axis=-1).reshape(-1, 2)
    src = cxy[None, :, :] - oxy[:, None, :]
    ok = np.all((src >= 0) & (src < np.array([gx, gy])), axis=-1)
    flat = src[..., 0] * gy + src[..., 1]
    idx = jnp.asarray(np.where(ok, flat, 0), jnp.int32)     # (n_oxy, nxy)
    okf = jnp.asarray(ok, Q.dtype)
    nm, k, ncell, B6 = Q.shape
    nxy = gx * gy
    Qz = Q.reshape(nm * k, nxy, gz, B6)

    def body(acc, xs):
        K_o, ix, okv = xs                 # K_o (nk, gz_t, gz_s, B6, B6)
        Qs = (Qz[:, ix] * okv[None, :, None, None]).reshape(
            nm, k, nxy, gz, B6)
        upd = jnp.stack([
            jnp.einsum("tsij,kcsj->kcti", K_o[m], Qs[m])
            for m in range(nm)])                             # (nm,k,nxy,gz,B6)
        return acc + upd.reshape(nm, k, ncell, B6), None

    acc0 = jnp.zeros((nm, k, ncell, B6), Q.dtype)
    acc, _ = lax.scan(body, acc0, (Kw.transpose(1, 0, 2, 3, 4, 5), idx,
                                   okf))
    return acc


def _signed_offsets_cyclic(g: int) -> np.ndarray:
    """Minimum-imaged cell offsets on a g-cyclic (UNPADDED) axis."""
    o = np.arange(g)
    return np.where(o <= g // 2, o, o - g).astype(np.int64)


def _kernel_hat_2p(lo_z, h, grid, p, dtype, h_floor, shells: int,
                   poly=False, near_excl=1):
    """Doubly-periodic COMBINED (free-space + wall-image) kernel lattice:
    per-z-cell-pair CYCLIC xy-offset lattices, 2-D FFT'd at box size.

    The pseudo-2D (x/y periodic, wall at z=0) far field.  Each lattice
    entry sums the full wall-corrected RPY node blocks over the (2S+1)²
    nearest in-plane lattice images — convergent only as a COMBINED sum
    (the free 1/ρ Stokeslet alone diverges over a 2-D lattice; its no-slip
    images cancel it to 1/ρ³).  The O(1/S) shell tail is killed by
    two-ring Richardson extrapolation: ring sums of a 1/ρ³ kernel behave
    like ring_s ≈ A/s² + B/s³, so the tail Σ_{s>S} is a fixed linear
    combination α·ring_S + β·ring_{S−1} (coefficients solved at trace
    time from exact Σ 1/s², Σ 1/s³ tail sums).  Measured on a single
    pair: raw 3.2e-3 → 5.9e-5 at S=6; lattice-level convergence pinned
    in ``tests/test_pseudo2d_farfield.py``.

    Cyclic means NO 2× zero-padding: the xy convolution is exactly the
    periodic sum, offsets are minimum-imaged cell displacements, and the
    near exclusion zeroes only the n=0 (minimum-image) term of wrapped-
    adjacent offsets — a blob pair's other images stay in the far tier,
    including a blob's own (the self-image interaction).

    Requires h·(gx, gy) == box (the grid tiles the box exactly — the
    caller anchors lo_xy = 0 and wraps positions).  Returns packed-real
    (2, gz_t, gz_s, gx·(gy//2+1), B, B) half-spectrum lattices
    (:func:`_pack_hat`).

    poly=True: FOUR radius-split channels (nk, 2, gz, gz, f, B, B) for
    the polydisperse operator — [K₀+G₀, G₁, G₂, K₂] with the free far
    kernel split K₀ + (âᵢ²+âⱼ²)·K₂ (:func:`_free_split_coeffs`) and the
    wall power split G_m coupling â^m-weighted moments to â^m-weighted
    outputs (:func:`_wall_coeffs_split`); K₂ couples (â²F → 1) and
    (F → âᵢ²).  Each channel decays ≥ 1/ρ³ over the image lattice (the
    Stokeslet cancellation is radius-independent; finite-size terms decay
    faster), so the same two-ring tail weights apply per channel.
    """
    gx, gy, gz = grid
    nodes = _cheb_nodes(p)
    p3 = p ** 3
    B = 3 * p3
    OX, OY = np.meshgrid(_signed_offsets_cyclic(gx),
                         _signed_offsets_cyclic(gy), indexing="ij")
    oxy = np.stack([OX, OY], axis=-1).reshape(-1, 2)         # (m, 2)
    near_xy = np.all(np.abs(oxy) <= near_excl, axis=-1)      # (m,)
    tn = jnp.asarray(
        np.stack(np.meshgrid(nodes, nodes, nodes, indexing="ij"),
                 axis=-1).reshape(-1, 3), dtype)             # (p³, 3)
    oxy_j = jnp.asarray(oxy, dtype)
    dx0 = (oxy_j[:, None, None, 0]
           + tn[None, :, None, 0] - tn[None, None, :, 0]) * h[0]
    dy0 = (oxy_j[:, None, None, 1]
           + tn[None, :, None, 1] - tn[None, None, :, 1]) * h[1]
    cz = jnp.arange(gz, dtype=dtype)
    zn = lo_z + (cz[:, None] + tn[None, :, 2]) * h[2]        # (gz, p³) raw
    znf = jnp.maximum(zn, h_floor) if h_floor > 0 else zn    # wall-floored
    eye = jnp.eye(3, dtype=dtype)
    zhat = jnp.zeros(3, dtype).at[2].set(1.0)
    near_xy_j = jnp.asarray(near_xy)
    czi_idx = jnp.arange(gz, dtype=jnp.int32)
    # image shifts n·(Lx, Ly) in units of a, ring-indexed for the tail
    s_rng = np.arange(-shells, shells + 1)
    NX, NY = np.meshgrid(s_rng, s_rng, indexing="ij")
    shift_np = np.stack([NX * gx * 1.0, NY * gy * 1.0], -1).reshape(-1, 2)
    ring_np = np.maximum(np.abs(NX), np.abs(NY)).reshape(-1)
    shift_j = jnp.asarray(shift_np, dtype)                   # (ns, 2) cells
    is_zero = jnp.asarray(ring_np == 0)
    # two-ring Richardson tail (shared with the exact sweep): tail(S) =
    # α·ring_S + β·ring_{S−1} — see rpy.tail_coeffs
    alpha_t, beta_t = rpy.tail_coeffs(shells)
    ring_w = np.where(ring_np == shells, alpha_t,
                      np.where(ring_np == shells - 1, beta_t, 0.0))
    ring_w_j = jnp.asarray(ring_w, dtype)

    def slab(ci):
        # free part: dz = zi − zj on RAW node heights; wall part: floored
        dz_free = zn[ci][None, None, :, None] - zn[:, None, None, :]
        zi = znf[ci][None, None, :, None]
        zj = znf[:, None, None, :]                           # (gz,1,1,p³)
        rz = jnp.broadcast_to(zi + zj, (gz,) + dx0.shape)    # (gz,m,p³,p³)
        near_z = jnp.abs(jnp.arange(gz, dtype=jnp.int32) - ci) <= 1
        near0 = (near_z[:, None] & near_xy_j[None, :])       # (gz, m)

        def wall_block(fs, e):
            f1, f2, f3, f4, f5 = fs
            return (f1[..., None, None] * eye
                    + f2[..., None, None] * e[..., :, None] * e[..., None, :]
                    + f3[..., None, None] * e[..., :, None] * zhat[None, :]
                    + f4[..., None, None] * zhat[:, None] * e[..., None, :]
                    + f5[..., None, None] * zhat[:, None] * zhat[None, :])

        def term(carry, sh):
            shift, zero, ring_w_s = sh
            dx = dx0 + shift[0] * h[0]
            dy = dy0 + shift[1] * h[1]
            dxb = jnp.broadcast_to(dx, rz.shape)
            dyb = jnp.broadcast_to(dy, rz.shape)
            # exclude the near sweep's term: min-image (n=0) of wrapped-
            # adjacent offsets; plus every n=0 self-distance guard
            keep = jnp.where(zero, ~near0, jnp.ones_like(near0))
            keepb = keep.astype(dtype)[:, :, None, None]     # (gz, m, 1, 1)
            dzb = jnp.broadcast_to(dz_free, rz.shape)
            r2 = dxb * dxb + dyb * dyb + dzb * dzb
            d = jnp.stack([dxb, dyb, dzb], axis=-1)
            ddT = d[..., :, None] * d[..., None, :]
            d_img = jnp.stack([dxb, dyb, rz], axis=-1)
            if poly:
                (a0, b0), (a2, b2) = _free_split_coeffs(r2, dtype)
                K0 = ((a0 * keepb)[..., None, None] * eye
                      + (b0 * keepb)[..., None, None] * ddT)
                K2 = ((a2 * keepb)[..., None, None] * eye
                      + (b2 * keepb)[..., None, None] * ddT)
                parts, invR = _wall_coeffs_split(
                    d_img, jnp.broadcast_to(zj, rz.shape))
                e = d_img * invR[..., None]
                Gs = [wall_block(tuple((f * keepb).astype(dtype)
                                       for f in fs), e) for fs in parts]
                W = jnp.stack([K0 + Gs[0], Gs[1], Gs[2], K2])
            else:
                # free-space RPY (far branch only at these separations)
                alpha, beta = rpy._free_coeffs(jnp.maximum(r2, 1e-2), dtype)
                Wf = ((alpha * keepb)[..., None, None] * eye
                      + (beta * keepb)[..., None, None] * ddT)
                # wall image part
                f1, f2, f3, f4, f5, invR = rpy._wall_coeffs(
                    d_img, jnp.broadcast_to(zj, rz.shape))
                e = d_img * invR[..., None]
                Ww = wall_block(tuple((f * keepb).astype(dtype)
                                      for f in (f1, f2, f3, f4, f5)), e)
                W = (Wf + Ww)[None]            # (nk, gz, m, p³, p³, 3, 3)
            # tail extrapolation folds into the running sum as a per-shift
            # weight 1 + ring_w (rings S, S−1; 1 elsewhere) — one lattice-
            # sized accumulator instead of separate tot/tail carries
            return carry + (1.0 + ring_w_s) * W, None

        nk = 4 if poly else 1
        zeros = jnp.zeros((nk, gz) + dx0.shape + (3, 3), dtype)
        tot, _ = lax.scan(term, zeros, (shift_j, is_zero, ring_w_j))
        W = tot.transpose(0, 1, 2, 3, 5, 4, 6).reshape(nk, gz, gx, gy, B, B)
        return jnp.fft.fft(jnp.fft.rfft(W, axis=3), axis=2)

    Kh = lax.map(slab, czi_idx)        # (gz_t, nk, gz_s, gx, gy//2+1, B, B)
    nk = Kh.shape[1]
    Kh = _pack_hat(Kh.transpose(1, 0, 2, 3, 4, 5, 6).reshape(
        nk, gz, gz, gx * (gy // 2 + 1), B, B), axis=1)
    return Kh if poly else Kh[0]


def _far_2p(Qm, lo_z, h, grid, p, h_floor, khat):
    """Pseudo-2D far field on nodes: Gz² coupled CYCLIC xy convolutions
    (no padding — the wrap IS the periodicity).  Qm (nm, k, ncell, B):
    nm = 1 (monodisperse, khat (2, ...)) or 3 (polydisperse channels
    [F, âF, â²F], khat (4, 2, ...)); returns (nout, k, ncell, B) output
    channels with interpolation weights [1] (mono) or [1, âᵢ², âᵢ]
    (poly) — see :func:`_kernel_hat_2p`."""
    dtype = jnp.real(Qm).dtype
    nm, k = Qm.shape[0], Qm.shape[1]
    poly = nm == 3
    gx, gy, gz = grid
    B = Qm.shape[-1]
    Qg = Qm.reshape(nm * k, gx, gy, gz, B).transpose(0, 3, 1, 2, 4)
    Qhat = fftsafe.rfftn_lanes(Qg, axes=(2, 3))            # (nm·k,gz,gx,gy/2+1,B)
    Qf = Qhat.reshape(nm, k, gz, -1, B)
    if poly:
        A, G1, G2, K2 = khat
        U0 = _conv_pack_z(A, Qf[0]) + _conv_pack_z(K2, Qf[2])
        Ua2 = _conv_pack_z(G2, Qf[2]) + _conv_pack_z(K2, Qf[0])
        Ua1 = _conv_pack_z(G1, Qf[1])
        Uf = jnp.concatenate([U0, Ua2, Ua1])               # (3k, gz, f, B)
    else:
        Uf = _conv_pack_z(khat, Qf[0])
    nout = Uf.shape[0] // k
    Uhat = Uf.reshape(nout * k, gz, gx, gy // 2 + 1, B)
    Ug = fftsafe.irfftn_lanes(Uhat, s=(gx, gy), axes=(2, 3)).astype(dtype)
    return Ug.transpose(0, 2, 3, 1, 4).reshape(nout, k, gx * gy * gz, B)


def _far_wall(Qm, lo_z, h, grid, p, h_floor, khat=None):
    """Wall-image far field on nodes: Gz² coupled 2-D xy convolutions
    (y half-spectrum — the kernel lattices and Q are real).

    Qm: (nm, k, ncell, B) moment channels — nm = 1 (monodisperse: [QF])
    or 3 (polydisperse: [QF, Q_{âF}, Q_{â²F}]).  Each channel convolves
    with its own image-kernel lattice (the (âᵢâⱼ)^m split of
    :func:`_wall_coeffs_split`); the caller interpolates the outputs
    with weights [1] (mono) or [1, âᵢ, âᵢ²] (poly).
    """
    dtype = jnp.real(Qm).dtype
    nm, k = Qm.shape[0], Qm.shape[1]
    poly = nm == 3
    gx, gy, gz = grid
    B = Qm.shape[-1]
    Qg = Qm.reshape(nm * k, gx, gy, gz, B).transpose(0, 3, 1, 2, 4)
    Qp = jnp.zeros((nm * k, gz, 2 * gx, 2 * gy, B), dtype)
    Qp = Qp.at[:, :, :gx, :gy, :].set(Qg)
    Khat = khat if khat is not None else _wall_kernel_hat(
        lo_z, h, grid, p, dtype, h_floor, poly=poly)
    Qhat = fftsafe.rfftn_lanes(Qp, axes=(2, 3))              # (nm·k,gz,2gx,gy+1,B)
    Qf = Qhat.reshape(nm, k, gz, -1, B)
    Uf = jnp.stack([_conv_pack_z(Khat[m], Qf[m]) for m in range(nm)])
    Uhat = Uf.reshape(nm * k, gz, 2 * gx, gy + 1, B)
    Ug = fftsafe.irfftn_lanes(Uhat, s=(2 * gx, 2 * gy), axes=(2, 3))[
        :, :, :gx, :gy, :].astype(dtype)
    return Ug.transpose(0, 2, 3, 1, 4).reshape(nm, k, gx * gy * gz, B)


# -------------------------------------------------------------- near part
def _near_neighbor_lists(ci_sorted, t, max_nbr, wrap_xy=None):
    """Tile adjacency from per-tile cell-index ranges (gap ≤ 1 per dim).

    wrap_xy: None (open) or (gx, gy) — cyclic adjacency in x/y for the
    pseudo-2D mode: tiles touching across the box seam are neighbors too
    (interval distance tested at shifts {−G, 0, +G}; tile bboxes live in
    [0, G), so one period each way covers every wrap)."""
    ct = ci_sorted.reshape(t, TILE, 3)
    lo = jnp.min(ct, axis=1)                                 # (t, 3)
    hi = jnp.max(ct, axis=1)

    def axis_ok(ax, g=None):
        l, h = lo[..., ax], hi[..., ax]
        base = (l[:, None] - h[None, :] <= 1) & (l[None, :] - h[:, None] <= 1)
        if g is None:
            return base
        for s in (-g, g):
            base = base | ((l[:, None] - (h[None, :] + s) <= 1)
                           & ((l[None, :] + s) - h[:, None] <= 1))
        return base

    gx, gy = (wrap_xy if wrap_xy is not None else (None, None))
    ok = axis_ok(0, gx) & axis_ok(1, gy) & axis_ok(2)
    cols = jnp.arange(t, dtype=jnp.int32)
    key = jnp.where(ok, cols, t + cols)
    packed = jnp.sort(key, axis=1)[:, :max_nbr]
    overflow = jnp.any(jnp.sum(ok, axis=1) > max_nbr)
    return jnp.where(packed < t, packed, -1), overflow


KHAT_BUDGET = 2 * 2**30  # HBM budget for the resident kernel-hat lattices


CELL_TARGET = 32  # blobs per supercell auto_grid aims for (near/far balance)


def auto_grid(n: int, p: int, wall: bool, poly: bool = False) -> int:
    """Density-targeted supercell count (cells of ~CELL_TARGET blobs),
    capped so the kernel-hat lattices stay under KHAT_BUDGET bytes —
    storage grows as G³·p⁶, so large N at high p needs an explicit
    (anisotropic) grid and accepts the larger near sweep instead.
    ``poly`` doubles the free-space lattice count and triples the wall
    one (the radius-split kernel channels).

    The occupancy target is NOT the near-sweep TILE: per-blob near-sweep
    candidates ≈ 12·TILE + 49·per_cell (see :func:`default_max_nbr`), so
    past per_cell ≈ TILE/4 finer cells stop paying while the lattice
    cost grows as G³ — ~32 is the measured sweet spot at bench density.
    """
    g = max(2, int(round((n / CELL_TARGET) ** (1.0 / 3.0))))
    b2 = (3 * p ** 3) ** 2
    while g > 2:
        # free-space half spectrum (× kernel channels)
        freqs = (2 if poly else 1) * 4 * g * g * (g + 1)
        if wall:
            # z pairs × xy half spectrum (× kernel channels)
            freqs += (3 if poly else 1) * 2 * g ** 3 * (g + 1)
        if 8 * freqs * b2 <= KHAT_BUDGET:
            break
        g -= 1
    return g


def default_max_nbr(n: int, grid, p: int) -> int:
    """Neighbor-tile width for the cell-snake tile order.

    A tile of TILE blobs spans m ≈ TILE/per_cell + 1 consecutive snake
    cells; candidate tiles live in a 3×3×(m+3)-cell window, so the count
    is ≈ (9·(m+3))·per_cell/TILE = 9 + 36·per_cell/TILE.  Calibrated
    against measured maxima at 40.96k–204.8k uniform cubes and 102.4k
    wall slabs (model within 3–25% of the observed max); the 1.6× margin
    + 8 covers all of them with headroom for moderate mid-trajectory
    clustering.  Overflow still NaN-poisons loudly (every subsequent step
    then rejects — the trajectory's ``iters``/``residual`` trace makes
    the freeze visible); STRONGLY clustered runs should size the list
    explicitly via ``farfield_nbr_tiles``.
    """
    t = -(-n // TILE)
    per_cell = n / float(np.prod(grid))
    est = 9.0 + 36.0 * per_cell / TILE
    return int(min(t, np.ceil(1.6 * est) + 8))


def _chunk_rows(t: int, max_nbr: int, nrhs: int) -> int:
    budget = 96 * 2**20
    per_tile = max_nbr * TILE * TILE * 4 * (8 + 3 * nrhs)
    best = 1
    for d in range(1, t + 1):
        if t % d == 0 and d * per_tile <= budget:
            best = d
    return best


# --------------------------------------------------------------- top level
class FarCtx(NamedTuple):
    """Position-dependent setup of the proxy-grid operator, hoistable out
    of Krylov/Lanczos loops (XLA's loop-invariant code motion can NOT
    hoist the ``lax.map``-built kernel lattices out of a ``while`` body —
    measured at 160+ ms per GMRES iteration before this existed).

    Split in two tiers:
      geometry (lo, h, khat_*): depends on positions only through the
        bounding box — reusable across NEARBY position sets (RFD
        displacements, the midpoint half-kick) via ``prepare(r, geo=...)``.
      position structures (everything else): exact for the ``r`` that
        built them; cheap (one argsort + O(t²) adjacency).
    """
    lo: jax.Array            # (3,) grid origin, units of a
    h: jax.Array             # (3,) cell sizes, units of a
    khat_free: jax.Array     # (nk, n_freq, B, B) free-space lattices
    khat_wall: jax.Array     # wall-image lattices, or None
    b: jax.Array             # (N,) damping factors, or None (no wall)
    ahat: jax.Array          # (N,) normalized radii, or None (mono)
    cid: jax.Array           # (N,) flat cell ids
    W3: jax.Array            # (N, p³) spread/interp weights
    self_diag: jax.Array     # (N, 3) self-mobility diagonal
    order: jax.Array         # (N,) cell-snake sort permutation
    x_s: jax.Array           # (t·TILE, 3) sorted padded positions
    ci_s: jax.Array          # (t·TILE, 3) sorted padded cell indices
    id_s: jax.Array          # (t·TILE,) sorted padded blob ids (−1 pad)
    ah_s: jax.Array          # (t·TILE,) sorted padded radii, or None
    nbr: jax.Array           # (t, max_nbr) neighbor-tile lists
    overflow: jax.Array      # () bool: neighbor lists overflowed
    # --- band tier (farfield_band_p > 0), else None:
    W6: jax.Array = None         # (N, band_p³) band spread weights
    band_free: jax.Array = None  # (nk, n_off, B6, B6) free band blocks
    band_wall: jax.Array = None  # (nk, n_oxy, gz, gz, B6, B6) wall band


class FarGeo(NamedTuple):
    """The geometry tier of a :class:`FarCtx` alone — grid origin, cell
    sizes and kernel-hat lattices.  What :func:`rigid_body_light_tpu.ops.
    saddle.pin_geometry` shares across a step's position sets; built by
    :func:`prepare_geometry` without the position tier's sort/adjacency/
    neighbor-list work (a full ``prepare`` whose position structures would
    be thrown away costs one argsort + O(t²) adjacency extra)."""

    lo: jax.Array
    h: jax.Array
    khat_free: jax.Array
    khat_wall: jax.Array
    band_free: jax.Array = None
    band_wall: jax.Array = None


def _check_2p(wall, poly, box, grid, shells=1):
    """Validate the pseudo-2D far-field request; returns box_n-independent
    static facts.  The combined image lattice needs the wall images (the
    free 1/ρ Stokeslet alone diverges over a 2-D lattice); polydisperse
    runs on the four radius-split channels (``poly`` is forwarded to the
    lattice builder by the callers)."""
    try:
        if len(box) != 2:
            raise ValueError
        lx, ly = (float(box[0]), float(box[1]))
    except (TypeError, ValueError, IndexError) as e:
        raise ValueError(
            f"box must be a (Lx, Ly) pair of in-plane periods, got {box!r}"
        ) from e
    if not (lx > 0 and ly > 0):
        raise ValueError(f"box periods must be positive, got {box!r}")
    if shells < 1:
        raise ValueError(
            "the pseudo-2D far field needs image_shells ≥ 1: the cyclic "
            "kernel lattice picks ONE signed representative per cell "
            "offset, so with no image sum pairs near the half-box seam "
            "are evaluated at the wrong-side image — a structurally "
            "different operator from the per-pair minimum-image sweep "
            "(use farfield_grid=None for minimum-image, or S ≥ 1 for the "
            "exact doubly-periodic operator; S=6 ≈ 1e-4 with the tail "
            "extrapolation)"
        )
    if not wall:
        raise ValueError(
            "the doubly-periodic far field needs wall=True — the free-"
            "space Stokeslet's in-plane lattice sum diverges; only the "
            "wall-screened (1/ρ³) combined kernel is summable"
        )
    if grid[0] < 4 or grid[1] < 4:
        # g >= 4 is a CORRECTNESS bound, not a quality knob: adjacent-cell
        # pairs (|offset| <= 1) span node displacements up to 2h, and the
        # near sweep evaluates them at the per-pair minimum image while
        # the lattice excludes the n=0 term of the signed representative
        # — the two agree only when 2h <= box/2, i.e. g >= 4.  At g=3 a
        # seam pair is double counted and its complementary image dropped
        # (measured 6.9e-2 relative operator error vs 4.4e-4 at g=4).
        raise ValueError(
            f"pseudo-2D far field needs ≥ 4 cells per periodic axis "
            f"(minimum-image/representative agreement for adjacent-cell "
            f"pairs), got {grid}"
        )


def _geometry_2p(x, grid, box_n, axis_name=None):
    """Pseudo-2D grid geometry: xy anchored at 0 with h·G == box (the
    cyclic convolution IS the periodicity), z from the dynamic bbox —
    mesh-wide (pmin/pmax over ``axis_name``) in the distributed path."""
    dtype = x.dtype
    zlo = jnp.min(x[:, 2:], axis=0)
    zhi = jnp.max(x[:, 2:], axis=0)
    if axis_name is not None:
        zlo = lax.pmin(zlo, axis_name)
        zhi = lax.pmax(zhi, axis_name)
    lo_z, h_z = _geometry_from_bounds(zlo, zhi, (grid[2],))
    lo = jnp.zeros((3,), dtype).at[2].set(lo_z[0])
    h = jnp.asarray([box_n[0] / grid[0], box_n[1] / grid[1], 0.0],
                    dtype).at[2].set(h_z[0])
    return lo, h


def _wrap_box(x, box_n):
    """Wrap positions (units of a) into the 2-D box: trajectories keep
    unwrapped coordinates, the periodic pair/grid structure sees box
    coordinates (z stays open — the wall geometry)."""
    bx = jnp.asarray([box_n[0], box_n[1], 0.0], x.dtype)
    return jnp.where(jnp.asarray([True, True, False]),
                     x - bx * jnp.floor(x / jnp.where(bx > 0, bx, 1.0)), x)


def _check_band(band_p, per):
    """Validate the band-tier order: 0 = off; otherwise ≥ 3 (a band at or
    below the FFT tier's typical order would ADD cost without accuracy).
    Pseudo-2D lattices are image-summed/cyclic — the band tier does not
    compose with them yet."""
    band_p = int(band_p)
    if band_p == 0:
        return 0
    if band_p < 3:
        raise ValueError(f"farfield_band_p must be 0 (off) or >= 3, got "
                         f"{band_p}")
    if per:
        raise ValueError(
            "farfield_band_p does not compose with the pseudo-2D (2-D "
            "box) far field yet — its lattices are cyclic/image-summed; "
            "use image_shells for accuracy there")
    return band_p


def prepare_geometry(r, a=1.0, eta=1.0, wall=False, grid=None, p=4,
                     max_nbr=None, h_floor=rpy.WALL_H_FLOOR, radii=None,
                     box=None, image_shells=8, band_p=0):
    """Build only the geometry tier (:class:`FarGeo`) for positions ``r``
    — pass the result as ``geo=`` to :func:`prepare` to share one kernel-
    lattice build across several nearby position sets.

    box: None (open domain) or (Lx, Ly) physical box — the pseudo-2D
    (doubly-periodic + wall) mode: cyclic xy convolution with COMBINED
    free+wall image-summed kernel lattices (:func:`_kernel_hat_2p`),
    image_shells deep with Richardson tail extrapolation."""
    r = jnp.asarray(r).reshape(-1, 3)
    n = r.shape[0]
    dtype = r.dtype
    poly = radii is not None
    grid, _ = _resolve(n, wall, grid, p, max_nbr, poly)
    x = r * jnp.asarray(1.0 / a, dtype)
    if box is not None:
        _check_2p(wall, poly, box, grid, int(image_shells))
        _check_band(band_p, True)
        box_n = tuple(b / a for b in box)
        lo, h = _geometry_2p(x, grid, box_n)
        return FarGeo(lo=lo, h=h, khat_free=None,
                      khat_wall=_kernel_hat_2p(lo[2], h, grid, p, dtype,
                                               h_floor, int(image_shells),
                                               poly=poly))
    band_p = _check_band(band_p, False)
    ne = _BAND_MAX if band_p else 1
    lo, h = _grid_geometry(x, grid)
    khat_free = _far_kernel_hat(h, grid, p, dtype, poly=poly, near_excl=ne)
    khat_wall = (_wall_kernel_hat(lo[2], h, grid, p, dtype, h_floor,
                                  poly=poly, near_excl=ne)
                 if wall else None)
    band_free = band_wall = None
    if band_p:
        band_free = _band_blocks_free(h, band_p, dtype, poly=poly)
        band_wall = (_band_blocks_wall(lo[2], h, grid, band_p, dtype,
                                       h_floor, poly=poly)
                     if wall else None)
    return FarGeo(lo=lo, h=h, khat_free=khat_free, khat_wall=khat_wall,
                  band_free=band_free, band_wall=band_wall)


def _resolve(n, wall, grid, p, max_nbr, poly):
    if grid is None:
        grid = auto_grid(n, p, wall, poly)
    if np.isscalar(grid):
        grid = (int(grid),) * 3
    grid = tuple(int(g) for g in grid)
    if max_nbr is None:
        max_nbr = default_max_nbr(n, grid, p)
    return grid, max_nbr


def prepare(r, a=1.0, eta=1.0, wall=False, grid=None, p=4, max_nbr=None,
            h_floor=rpy.WALL_H_FLOOR, radii=None, geo: FarCtx = None,
            box=None, image_shells=8, band_p=0):
    """Build the :class:`FarCtx` for positions ``r`` (same kwargs as
    :func:`mobility_apply`).

    geo: reuse a previous ctx's geometry tier (lo/h/kernel lattices) —
    valid for position sets within ~a cell fraction of the one that
    built it (the grid map stays consistent; blobs just outside the box
    clip to edge cells and extrapolate the Chebyshev basis mildly).
    box/image_shells: pseudo-2D mode — see :func:`prepare_geometry`.
    """
    r = jnp.asarray(r).reshape(-1, 3)
    n = r.shape[0]
    dtype = r.dtype
    poly = radii is not None
    grid, max_nbr = _resolve(n, wall, grid, p, max_nbr, poly)
    per = box is not None
    box_n = None
    if per:
        _check_2p(wall, poly, box, grid, int(image_shells))
        box_n = tuple(b / a for b in box)
    band_p = _check_band(band_p, per)
    ahat = None
    if poly:
        ahat = jnp.asarray(radii, dtype).reshape(-1) * jnp.asarray(
            1.0 / a, dtype)
    b = rpy.damping_factors(r, a, radii=radii) if wall else None

    x = r * jnp.asarray(1.0 / a, dtype)                      # units of a
    if per:
        x = _wrap_box(x, box_n)
    geo_bad = None
    band_free = band_wall = None
    if geo is not None:
        lo, h = geo.lo, geo.h
        khat_free, khat_wall = geo.khat_free, geo.khat_wall
        band_free, band_wall = geo.band_free, geo.band_wall
        # Reused geometry is only valid while positions stay within ~a cell
        # fraction of the bounding box that built it: blobs past the edge
        # clip to edge cells and the Chebyshev basis extrapolates SILENTLY
        # (accuracy degrades with no error signal, unlike neighbor
        # overflow).  Poison the apply like overflow does, so a large dt /
        # strong forcing surfaces through the stepper's rejection path.
        # Pseudo-2D: xy wraps (never excursions), so guard z only.
        u = (x - lo) / h
        if per:
            excur = jnp.maximum(jnp.max(-u[:, 2]),
                                jnp.max(u[:, 2] - grid[2]))
        else:
            excur = jnp.maximum(jnp.max(-u),
                                jnp.max(u - jnp.asarray(grid, dtype)))
        geo_bad = excur > jnp.asarray(0.5, dtype)
    elif per:
        lo, h = _geometry_2p(x, grid, box_n)
        khat_free = None
        khat_wall = _kernel_hat_2p(lo[2], h, grid, p, dtype, h_floor,
                                   int(image_shells), poly=poly)
    else:
        ne = _BAND_MAX if band_p else 1
        lo, h = _grid_geometry(x, grid)
        khat_free = _far_kernel_hat(h, grid, p, dtype, poly=poly,
                                    near_excl=ne)
        khat_wall = (_wall_kernel_hat(lo[2], h, grid, p, dtype, h_floor,
                                      poly=poly, near_excl=ne)
                     if wall else None)
        if band_p:
            band_free = _band_blocks_free(h, band_p, dtype, poly=poly)
            band_wall = (_band_blocks_wall(lo[2], h, grid, band_p, dtype,
                                           h_floor, poly=poly)
                         if wall else None)
    ci, cid = _cell_indices(x, lo, h, grid)
    t3 = (x - lo) / h - ci.astype(dtype)
    W3 = _blob_weights(t3, _cheb_nodes(p))                   # (N, p³)
    W6 = _blob_weights(t3, _cheb_nodes(band_p)) if band_p else None

    order = tiles.cell_snake_order(ci, grid)
    t = -(-n // TILE)
    pad = t * TILE - n
    # pad the partial tile with the LAST sorted entry: its cell coincides
    # with the tile's final real cell, so the tile bbox (and hence the
    # neighbor-list width) stays as tight as the unpadded case
    x_s = jnp.concatenate([x[order], jnp.broadcast_to(x[order[-1:]],
                                                      (pad, 3))])
    ci_s = jnp.concatenate([ci[order], jnp.broadcast_to(ci[order[-1:]],
                                                        (pad, 3))])
    id_s = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    ah_s = None
    if poly:
        # pad with 1.0: padded entries are masked out, but 0 would divide
        # by zero inside the coefficient fields
        ah_s = jnp.concatenate([ahat[order], jnp.ones((pad,), dtype)])
    nbr, overflow = _near_neighbor_lists(
        ci_s, t, max_nbr, wrap_xy=(grid[0], grid[1]) if per else None)
    if geo_bad is not None:
        overflow = overflow | geo_bad
    self_diag = _self_diag_field(n, dtype, ahat, wall, r[:, 2], a,
                                 h_floor, radii)
    return FarCtx(lo=lo, h=h, khat_free=khat_free, khat_wall=khat_wall,
                  b=b, ahat=ahat, cid=cid, W3=W3, self_diag=self_diag,
                  order=order, x_s=x_s, ci_s=ci_s, id_s=id_s, ah_s=ah_s,
                  nbr=nbr, overflow=overflow, W6=W6, band_free=band_free,
                  band_wall=band_wall)


def mobility_apply(F, r, a=1.0, eta=1.0, wall=False, grid=None, p=4,
                   max_nbr=None, h_floor=rpy.WALL_H_FLOOR, radii=None,
                   ctx: FarCtx = None, box=None, image_shells=8,
                   use_pallas=True, band_p=0):
    """U = M(r)·F via near-exact + proxy-grid far field.

    box: None (open/wall domain, as before) or (Lx, Ly) physical box —
    the pseudo-2D doubly-periodic wall mode: cyclic xy convolution with
    image-summed combined kernel lattices (exact in-plane periodicity at
    Chebyshev-p + shell-tail accuracy, O(N) per apply — vs the exact
    image sweep's O((2S+1)²·N²), ``rpy.mobility_apply(image_shells=…)``).

    F: (N, 3) or (k, N, 3).  grid: int or (Gx, Gy, Gz) supercells (auto ≈
    cells of ~CELL_TARGET blobs at uniform density; wall-bounded slabs
    should pass an anisotropic grid with small Gz); p: Chebyshev nodes
    per dim.
    radii: optional (N,) per-blob physical radii — polydisperse RPY via
    the radius-split kernel lattices (module docstring); near pairs use
    :func:`rigid_body_light_tpu.ops.rpy._free_coeffs_poly` and the
    geometric-mean a_eff wall convention, exactly like the O(N²) sweeps.
    Same normalization/contract as :func:`rigid_body_light_tpu.ops.rpy.
    mobility_apply`: self term included; ``wall`` adds the Swan–Brady
    correction (near pairs exact, far pairs via the image-kernel
    lattices) and the B·M·B damping sandwich.

    ctx: a :func:`prepare` result for THIS ``r`` (same kwargs) — pass it
    when applying the operator repeatedly at fixed positions (Krylov
    loops) so the kernel-lattice build and sort/neighbor setup run once
    per solve instead of once per iteration (see
    :func:`rigid_body_light_tpu.ops.saddle.hoist_positions`).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    multi = jnp.asarray(F).ndim == 3
    Fs = jnp.asarray(F, r.dtype)
    Fs = Fs if multi else Fs[None]
    k, n = Fs.shape[0], r.shape[0]
    dtype = r.dtype
    poly = radii is not None
    grid, max_nbr = _resolve(n, wall, grid, p, max_nbr, poly)
    per = box is not None
    if per:
        _check_2p(wall, poly, box, grid, int(image_shells))
    band_p = _check_band(band_p, per)
    if ctx is None:
        ctx = prepare(r, a=a, eta=eta, wall=wall, grid=grid, p=p,
                      max_nbr=max_nbr, h_floor=h_floor, radii=radii,
                      box=box, image_shells=image_shells, band_p=band_p)

    if wall:
        Fs = Fs * ctx.b[None, :, None]

    band = ((ctx.W6, band_p, ctx.band_free, ctx.band_wall)
            if band_p else None)
    U_far = _far_part(Fs, ctx.ahat, ctx.W3, ctx.cid, grid, ctx.h,
                      ctx.lo[2], p, wall, h_floor,
                      khat_free=ctx.khat_free, khat_wall=ctx.khat_wall,
                      per=per, band=band)

    # ---- near: cell-snake equal-population tiles, cell-offset mask
    t = -(-n // TILE)
    pad = t * TILE - n
    order = ctx.order
    F_s = jnp.concatenate([Fs[:, order], jnp.zeros((k, pad, 3), dtype)],
                          axis=1)
    box_n = None if not per else tuple(b / a for b in box)
    wrap_xy = (grid[0], grid[1]) if per else None
    pallas_near = False
    if (use_pallas and dtype == jnp.float32 and k <= 2
            and _pallas_available()):
        from rigid_body_light_tpu.ops import rpy_pallas

        pallas_near = rpy_pallas.near_sweep_fits(ctx.nbr)
    if pallas_near:
        # the near sweep was the far-field apply's bottleneck on chip —
        # XLA's gather-based pair fields run ~8x below the Pallas pair
        # kernel (measured 250 ms of a 286 ms wall apply at 102.4k,
        # BENCH_NOTES); the neighbor-tile kernel runs the identical
        # adjacent-cell partition at pair-kernel throughput
        U_near_s = rpy_pallas.near_sweep(
            ctx.x_s, ctx.ci_s, ctx.id_s >= 0, F_s, ctx.nbr, wall,
            h_floor, box_over_a=box_n, wrap_cells=wrap_xy,
            ahat_s=ctx.ah_s)[:, :n]
    else:
        U_near_s = _near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s, F_s, ctx.ah_s,
                               ctx.nbr, ctx.nbr.shape[1], wall, h_floor,
                               0, t, box_n=box_n, wrap_xy=wrap_xy)[:, :n]
    U_near = jnp.zeros_like(Fs).at[:, order, :].set(U_near_s)
    U_near = jnp.where(ctx.overflow, jnp.nan, U_near)

    U = U_near + U_far + ctx.self_diag * Fs
    if wall:
        U = U * ctx.b[None, :, None]
    U = U * jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)
    return U if multi else U[0]


def _far_part(Fs, ahat, W3, cid, grid, h, lo_z, p, wall, h_floor,
              psum_fn=None, khat_free=None, khat_wall=None, per=False,
              band=None):
    """Moment channels → spread → kernel-lattice convolution → interpolate.

    Shared by the single-device and distributed paths; in distributed mode
    ``Fs``/``W3``/``cid`` are the local shard and ``psum_fn`` closes the
    (tiny) node-grid moments over the mesh.  ahat: None (monodisperse) or
    (N, ) normalized radii — â^m-weighted forces ride the same spread/FFT
    batch as extra RHS channels, read back with â^m output weights.

    band: optional (W6, band_p, band_free, band_wall) — the high-order
    band tier (cell offsets 2.._BAND_MAX, see the band-tier section); its
    moments psum over the mesh exactly like Q, so the distributed path
    rides along.
    """
    poly = ahat is not None
    k, n = Fs.shape[0], Fs.shape[1]
    if poly:
        mom_scales = [None, ahat, ahat * ahat] if wall else [None,
                                                             ahat * ahat]
    else:
        mom_scales = [None]
    nm = len(mom_scales)
    Fm = jnp.concatenate([Fs if s is None else Fs * s[None, :, None]
                          for s in mom_scales])              # (nm·k, N, 3)
    ncell = grid[0] * grid[1] * grid[2]
    Q = _p2m(W3, cid, Fm, ncell, p)
    if psum_fn is not None:
        Q = psum_fn(Q)
    Q = Q.reshape(nm, k, ncell, -1)
    if per:
        # pseudo-2D: combined (free + wall-image) cyclic lattices
        Up = _far_2p(Q, lo_z, h, grid, p, h_floor, khat_wall)
        if not poly:
            return _l2p(W3, cid, Up[0], p)
        L = _l2p(W3, cid, Up.reshape(3 * k, -1, Up.shape[-1]),
                 p).reshape(3, k, n, 3)                  # weights 1, âᵢ², âᵢ
        return (L[0] + (ahat * ahat)[None, :, None] * L[1]
                + ahat[None, :, None] * L[2])
    Qm_free = jnp.stack([Q[0], Q[nm - 1]]) if poly else Q    # [F, â²F]
    Un = _far_free(Qm_free, h, grid, p, khat=khat_free)      # (nf, k, nc, B)
    Uw = (_far_wall(Q, lo_z, h, grid, p, h_floor, khat=khat_wall)
          if wall else None)
    U_far = _combine_channels(Un, Uw, W3, cid, p, ahat, wall)
    if band is not None:
        W6, bp, band_free, band_wall = band
        Qb = _p2m(W6, cid, Fm, ncell, bp)
        if psum_fn is not None:
            Qb = psum_fn(Qb)
        Qb = Qb.reshape(nm, k, ncell, -1)
        Qb_free = jnp.stack([Qb[0], Qb[nm - 1]]) if poly else Qb
        Unb = _band_apply_free(band_free, Qb_free, grid)
        Uwb = _band_apply_wall(band_wall, Qb, grid) if wall else None
        U_far = U_far + _combine_channels(Unb, Uwb, W6, cid, bp, ahat,
                                          wall)
    return U_far


def _combine_channels(Un, Uw, W, cid, p, ahat, wall):
    """Interpolate far-tier output channels back to blobs with the
    [1] (mono) / [1, âᵢ², âᵢ] (poly) output weights — shared by the FFT
    and band tiers (identical channel conventions)."""
    poly = ahat is not None
    if not poly:
        Unodes = Un[0] if Uw is None else Un[0] + Uw[0]
        return _l2p(W, cid, Unodes, p)
    k, n = Un.shape[1], W.shape[0]
    ch_1 = Un[0] if Uw is None else Un[0] + Uw[0]            # weight 1
    ch_a2 = Un[1] if Uw is None else Un[1] + Uw[2]           # weight âᵢ²
    chans = [ch_1, ch_a2] + ([Uw[1]] if wall else [])        # (+ weight âᵢ)
    L = _l2p(W, cid, jnp.concatenate(chans), p).reshape(
        len(chans), k, n, 3)
    U = L[0] + (ahat * ahat)[None, :, None] * L[1]
    if wall:
        U = U + ahat[None, :, None] * L[2]
    return U


def _self_diag_field(n, dtype, ahat, wall, rz, a, h_floor, radii):
    """Per-blob self-mobility diagonal (units of 1/(8πηa))."""
    self_diag = jnp.full((n, 3), _SELF_COEF, dtype)
    if ahat is not None:
        self_diag = self_diag / ahat[:, None]
    if wall:
        self_diag = self_diag + rpy.wall_self_diag(rz, a, dtype,
                                                   h_floor=h_floor,
                                                   radii=radii)
    return self_diag


def _near_sweep(x_s, ci_s, id_s, F_s, ah_s, nbr, max_nbr, wall, h_floor,
                t0, nt, box_n=None, wrap_xy=None):
    """Exact adjacent-cell pair sweep for the sorted tile range
    [t0, t0+nt): rows are the range's blobs, columns its neighbor tiles.

    x_s/ci_s/id_s (t·TILE, …) sorted padded arrays, F_s (k, t·TILE, 3),
    ah_s optional (t·TILE,) normalized radii (polydisperse), nbr (t,
    max_nbr) neighbor-tile lists (−1 = empty).  Returns (k, nt·TILE, 3)
    pair velocities in sorted order — no self term, scaling or damping.
    ``t0``/``nt`` are static; the single-device caller passes (0, t), the
    distributed one its device's tile slice.
    box_n/wrap_xy: pseudo-2D mode — (Lx, Ly) in units of a / (gx, gy):
    pair displacements are minimum-imaged and cell adjacency wraps, so
    near pairs across the box seam are swept exactly.
    """
    dtype = x_s.dtype
    poly = ah_s is not None
    t = nbr.shape[0]
    k = F_s.shape[0]
    nbr_ix = jnp.maximum(nbr, 0)
    ch = _chunk_rows(nt, max_nbr, k)
    xt = x_s.reshape(t, TILE, 3)
    ct = ci_s.reshape(t, TILE, 3)
    it = id_s.reshape(t, TILE)
    Ft = F_s.reshape(k, t, TILE, 3)
    if poly:
        at = ah_s.reshape(t, TILE)

    def chunk_fn(c0):
        z = jnp.zeros((), c0.dtype)
        rows_x = lax.dynamic_slice(xt, (c0, z, z), (ch, TILE, 3))
        rows_c = lax.dynamic_slice(ct, (c0, z, z), (ch, TILE, 3))
        rows_id = lax.dynamic_slice(it, (c0, z), (ch, TILE))
        nb = lax.dynamic_slice(nbr_ix, (c0, z), (ch, max_nbr))
        nb_live = lax.dynamic_slice(nbr, (c0, z), (ch, max_nbr)) >= 0
        cols_x = xt[nb].reshape(ch, max_nbr * TILE, 3)
        cols_c = ct[nb].reshape(ch, max_nbr * TILE, 3)
        cols_id = jnp.where(nb_live[..., None], it[nb],
                            -1).reshape(ch, max_nbr * TILE)
        cols_F = Ft[:, nb].transpose(1, 0, 2, 3, 4).reshape(
            ch, k, max_nbr * TILE, 3)

        d = rows_x[:, :, None, :] - cols_x[:, None, :, :]
        dc = rows_c[:, :, None, :] - cols_c[:, None, :, :]
        if box_n is not None:
            d = rpy._wrap_xy(d, box_n)
            # integer min-image of the cell offsets in the periodic plane
            for ax, g in ((0, wrap_xy[0]), (1, wrap_xy[1])):
                w = jnp.mod(dc[..., ax] + g // 2, g) - g // 2
                dc = dc.at[..., ax].set(w)
        r2 = jnp.sum(d * d, axis=-1)
        adj = jnp.all(jnp.abs(dc) <= 1, axis=-1)
        keep = adj & (cols_id[:, None, :] >= 0) & (
            rows_id[:, :, None] != cols_id[:, None, :])
        r2 = jnp.where(keep, r2, 16.0)  # harmless masked distance
        if poly:
            rows_a = lax.dynamic_slice(at, (c0, z), (ch, TILE))
            cols_a = at[nb].reshape(ch, max_nbr * TILE)
            alpha, beta = rpy._free_coeffs_poly(
                r2, rows_a[:, :, None], cols_a[:, None, :], dtype)
        else:
            alpha, beta = rpy._free_coeffs(r2, dtype)
        alpha = jnp.where(keep, alpha, 0.0)
        beta = jnp.where(keep, beta, 0.0)
        dF = jnp.einsum("cpnx,cknx->ckpn", d, cols_F)
        out = (jnp.einsum("cpn,cknx->ckpx", alpha, cols_F)
               + jnp.einsum("ckpn,cpn,cpnx->ckpx", dF, beta, d))
        if wall and poly:
            # geometric-mean a_eff convention of rpy._pair_tile: evaluate
            # in units of a_eff = √(aᵢaⱼ) and scale the result by 1/a_eff
            inv_ae = lax.rsqrt(rows_a[:, :, None] * cols_a[:, None, :])
            zi = rows_x[:, :, 2][:, :, None] * inv_ae
            zj = cols_x[:, :, 2][:, None, :] * inv_ae
            if h_floor > 0:
                zi = jnp.maximum(zi, h_floor)
                zj = jnp.maximum(zj, h_floor)
            d_img = (d * inv_ae[..., None]).at[:, :, :, 2].set(zi + zj)
            f1, f2, f3, f4, f5, invR = rpy._wall_coeffs(d_img, zj)
            f1, f2, f3, f4, f5 = (f * inv_ae for f in (f1, f2, f3, f4, f5))
        elif wall:
            zi = rows_x[:, :, 2]
            zj = cols_x[:, :, 2]
            if h_floor > 0:
                zi = jnp.maximum(zi, h_floor)
                zj = jnp.maximum(zj, h_floor)
            d_img = d.at[:, :, :, 2].set(zi[:, :, None] + zj[:, None, :])
            f1, f2, f3, f4, f5, invR = rpy._wall_coeffs(d_img, zj[:, None, :])
        if wall:
            keepf = keep.astype(dtype)
            f1, f2, f3, f4, f5 = (f * keepf for f in (f1, f2, f3, f4, f5))
            e = d_img * invR[..., None]
            eF = jnp.einsum("cpnx,cknx->ckpn", e, cols_F)
            Fz = cols_F[:, :, :, 2]
            out = out + jnp.einsum("cpn,cknx->ckpx", f1, cols_F)
            out = out + jnp.einsum("ckpn,cpn,cpnx->ckpx", eF, f2, e)
            out = out + jnp.einsum("cpn,ckn,cpnx->ckpx", f3, Fz, e)
            z_part = (jnp.einsum("cpn,ckpn->ckp", f4, eF)
                      + jnp.einsum("cpn,ckn->ckp", f5, Fz))
            out = out.at[:, :, :, 2].add(z_part)
        return out

    starts = t0 + jnp.arange(nt // ch, dtype=jnp.int32) * ch
    U_pad = lax.map(chunk_fn, starts)
    return U_pad.reshape(nt, k, TILE, 3).transpose(1, 0, 2, 3).reshape(
        k, nt * TILE, 3)


# ------------------------------------------------------------- distributed
def mobility_apply_local(F_l, r_l, n_devices: int, axis_name: str, a=1.0,
                         eta=1.0, wall=False, grid=None, p=4, max_nbr=None,
                         h_floor=rpy.WALL_H_FLOOR, radii_l=None,
                         ctx: FarCtx = None, box=None, image_shells=8,
                         use_pallas=True, band_p=0):
    """Local-shard proxy-grid mobility for use INSIDE ``shard_map``.

    Multi-chip far field (the O(N) analogue of
    :func:`rigid_body_light_tpu.parallel.sharding.ring_pair_sum_local`):
    blobs are sharded over ``axis_name``; per-blob O(N·p³) work — spread
    weights, anterpolation, interpolation — runs on the LOCAL shard only,
    the tiny node-grid moments close with one ``psum``, the (cheap,
    G³·p⁶) kernel-lattice convolution is computed redundantly-replicated,
    and the dominant adjacent-cell near sweep is sharded by equal tile
    slices over a one-shot ``all_gather`` of the (N, 3) positions/forces
    (O(N) bytes against O(N·ρ/D) local flops; at 1M blobs the gathered
    arrays are ~24 MB while the Krylov state — the actual memory wall,
    handled by the distributed solver — stays sharded).

    F_l, r_l: (N_local, 3) (or F_l (k, N_local, 3)) local shards; returns
    the local rows of M·F with the same normalization/contract as
    :func:`mobility_apply`.  radii_l: optional (N_local,) local radii
    shard (polydisperse).  N_local must be equal on every device (pad at
    the caller if needed); tile slices are padded internally.

    box/image_shells: pseudo-2D (doubly-periodic wall) mode, same contract
    as :func:`mobility_apply` — the image-summed cyclic lattice build is
    replicated (it depends on mesh-wide z bounds only), the near sweep
    wraps across the seam on every device's tile slice.
    """
    r_l = jnp.asarray(r_l).reshape(-1, 3)
    multi = jnp.asarray(F_l).ndim == 3
    Fs = jnp.asarray(F_l, r_l.dtype)
    Fs = Fs if multi else Fs[None]
    k, n_l = Fs.shape[0], r_l.shape[0]
    n = n_l * n_devices
    dtype = r_l.dtype
    poly = radii_l is not None
    grid, max_nbr, t, t_pad = _resolve_local(n, wall, grid, p, max_nbr,
                                             poly, n_devices)
    per = box is not None
    if per:
        _check_2p(wall, poly, box, grid, int(image_shells))
    band_p = _check_band(band_p, per)
    if ctx is None:
        ctx = prepare_local(r_l, n_devices, axis_name, a=a, eta=eta,
                            wall=wall, grid=grid, p=p, max_nbr=max_nbr,
                            h_floor=h_floor, radii_l=radii_l, box=box,
                            image_shells=image_shells, band_p=band_p)

    if wall:
        Fs = Fs * ctx.b[None, :, None]

    # far part: local spread, psum'd node moments, replicated convolution,
    # local interpolation — identical numbers on every device (the band
    # tier's moments psum along with Q)
    band = ((ctx.W6, band_p, ctx.band_free, ctx.band_wall)
            if band_p else None)
    U_far = _far_part(Fs, ctx.ahat, ctx.W3, ctx.cid, grid, ctx.h,
                      ctx.lo[2], p, wall, h_floor,
                      psum_fn=lambda q: lax.psum(q, axis_name),
                      khat_free=ctx.khat_free, khat_wall=ctx.khat_wall,
                      per=per, band=band)

    # near part: gather the global forces once per apply (the sorted tile
    # structure comes prebuilt from the ctx), sweep only this device's
    # tile slice, and regather the slices
    idx = lax.axis_index(axis_name)
    F_all = lax.all_gather(Fs, axis_name, axis=1, tiled=True)
    pad = t_pad * TILE - n
    F_s = jnp.concatenate([F_all[:, ctx.order],
                           jnp.zeros((k, pad, 3), dtype)], axis=1)
    nt = t_pad // n_devices
    box_n = None if not per else tuple(b / a for b in box)
    wrap_xy = (grid[0], grid[1]) if per else None
    pallas_near = False
    if (use_pallas and dtype == jnp.float32 and k <= 2
            and _pallas_available()):
        from rigid_body_light_tpu.ops import rpy_pallas

        pallas_near = rpy_pallas.near_sweep_fits(ctx.nbr)
    if pallas_near:
        U_slice = rpy_pallas.near_sweep(
            ctx.x_s, ctx.ci_s, ctx.id_s >= 0, F_s, ctx.nbr, wall, h_floor,
            box_over_a=box_n, wrap_cells=wrap_xy, ahat_s=ctx.ah_s,
            t0=idx * nt, nt=nt)                              # (k, nt·TILE, 3)
    else:
        U_slice = _near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s, F_s, ctx.ah_s,
                              ctx.nbr, max_nbr, wall, h_floor,
                              idx * nt, nt, box_n=box_n, wrap_xy=wrap_xy)
    U_sorted = lax.all_gather(U_slice, axis_name, axis=1,
                              tiled=True)[:, :n]
    U_near_g = jnp.zeros((k, n, 3), dtype).at[:, ctx.order, :].set(U_sorted)
    U_near = lax.dynamic_slice_in_dim(U_near_g, idx * n_l, n_l, axis=1)
    U_near = jnp.where(ctx.overflow, jnp.nan, U_near)

    U = U_near + U_far + ctx.self_diag * Fs
    if wall:
        U = U * ctx.b[None, :, None]
    U = U * jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)
    return U if multi else U[0]


def _resolve_local(n, wall, grid, p, max_nbr, poly, n_devices):
    """Static shapes of the distributed applier: grid, the neighbor-list
    width (widened so the isolated-cell pad tiles can't overflow it), the
    real and device-padded tile counts."""
    grid, max_nbr = _resolve(n, wall, grid, p, max_nbr, poly)
    t = -(-n // TILE)
    t_pad = -(-t // n_devices) * n_devices
    # pad tiles share one isolated cell, so each sees (pad-tile count)
    # neighbors — widen the list to cover them (their rows are masked
    # anyway, but an overflow there would NaN-poison the whole apply)
    max_nbr = min(t_pad, max(max_nbr, t_pad - t + 1))
    return grid, max_nbr, t, t_pad


def prepare_geometry_local(r_l, n_devices: int, axis_name: str, a=1.0,
                           eta=1.0, wall=False, grid=None, p=4,
                           max_nbr=None, h_floor=rpy.WALL_H_FLOOR,
                           radii_l=None, box=None, image_shells=8,
                           band_p=0):
    """Distributed analogue of :func:`prepare_geometry`: the grid bounding
    box closes over the mesh (pmin/pmax); the kernel-hat lattices are
    computed replicated (identical on every device)."""
    r_l = jnp.asarray(r_l).reshape(-1, 3)
    n = r_l.shape[0] * n_devices
    dtype = r_l.dtype
    poly = radii_l is not None
    grid, _, _, _ = _resolve_local(n, wall, grid, p, max_nbr, poly,
                                   n_devices)
    x = r_l * jnp.asarray(1.0 / a, dtype)
    if box is not None:
        _check_2p(wall, poly, box, grid, int(image_shells))
        box_n = tuple(b / a for b in box)
        lo, h = _geometry_2p(x, grid, box_n, axis_name=axis_name)
        return FarGeo(lo=lo, h=h, khat_free=None,
                      khat_wall=_kernel_hat_2p(lo[2], h, grid, p, dtype,
                                               h_floor, int(image_shells),
                                               poly=poly))
    band_p = _check_band(band_p, False)
    ne = _BAND_MAX if band_p else 1
    lo = lax.pmin(jnp.min(x, axis=0), axis_name)
    hi = lax.pmax(jnp.max(x, axis=0), axis_name)
    lo, h = _geometry_from_bounds(lo, hi, grid)
    khat_free = _far_kernel_hat(h, grid, p, dtype, poly=poly, near_excl=ne)
    khat_wall = (_wall_kernel_hat(lo[2], h, grid, p, dtype, h_floor,
                                  poly=poly, near_excl=ne)
                 if wall else None)
    band_free = band_wall = None
    if band_p:
        band_free = _band_blocks_free(h, band_p, dtype, poly=poly)
        band_wall = (_band_blocks_wall(lo[2], h, grid, band_p, dtype,
                                       h_floor, poly=poly)
                     if wall else None)
    return FarGeo(lo=lo, h=h, khat_free=khat_free, khat_wall=khat_wall,
                  band_free=band_free, band_wall=band_wall)


def prepare_local(r_l, n_devices: int, axis_name: str, a=1.0, eta=1.0,
                  wall=False, grid=None, p=4, max_nbr=None,
                  h_floor=rpy.WALL_H_FLOOR, radii_l=None, geo=None,
                  box=None, image_shells=8, band_p=0):
    """Build the F-independent setup of :func:`mobility_apply_local` once
    — the distributed :class:`FarCtx` analogue, hoistable out of Krylov /
    Lanczos loops exactly like the single-device ``prepare`` (without it
    the kernel-lattice build re-runs EVERY iteration inside the
    ``while`` body; measured ~160 ms/iteration single-device).

    geo: reuse a :func:`prepare_geometry_local` result across nearby
    position sets (same validity contract and excursion poisoning as the
    single-device path)."""
    r_l = jnp.asarray(r_l).reshape(-1, 3)
    n_l = r_l.shape[0]
    n = n_l * n_devices
    dtype = r_l.dtype
    poly = radii_l is not None
    grid, max_nbr, t, t_pad = _resolve_local(n, wall, grid, p, max_nbr,
                                             poly, n_devices)
    per = box is not None
    box_n = None
    if per:
        _check_2p(wall, poly, box, grid, int(image_shells))
        box_n = tuple(b / a for b in box)
    band_p = _check_band(band_p, per)
    ahat = None
    if poly:
        ahat = jnp.asarray(radii_l, dtype).reshape(-1) * jnp.asarray(
            1.0 / a, dtype)
    b = rpy.damping_factors(r_l, a, radii=radii_l) if wall else None

    x = r_l * jnp.asarray(1.0 / a, dtype)                    # units of a
    if per:
        x = _wrap_box(x, box_n)
    geo_bad = None
    band_free = band_wall = None
    if geo is not None:
        lo, h = geo.lo, geo.h
        khat_free, khat_wall = geo.khat_free, geo.khat_wall
        band_free, band_wall = geo.band_free, geo.band_wall
        # pseudo-2D: xy wraps (never excursions), so guard z only
        u = (x - lo) / h
        if per:
            excur = jnp.maximum(jnp.max(-u[:, 2]),
                                jnp.max(u[:, 2] - grid[2]))
        else:
            excur = jnp.maximum(jnp.max(-u),
                                jnp.max(u - jnp.asarray(grid, dtype)))
        geo_bad = lax.pmax(excur, axis_name) > jnp.asarray(0.5, dtype)
    elif per:
        lo, h = _geometry_2p(x, grid, box_n, axis_name=axis_name)
        khat_free = None
        khat_wall = _kernel_hat_2p(lo[2], h, grid, p, dtype, h_floor,
                                   int(image_shells), poly=poly)
    else:
        # global grid geometry: bbox closes over the mesh with pmin/pmax
        ne = _BAND_MAX if band_p else 1
        lo = lax.pmin(jnp.min(x, axis=0), axis_name)
        hi = lax.pmax(jnp.max(x, axis=0), axis_name)
        lo, h = _geometry_from_bounds(lo, hi, grid)
        khat_free = _far_kernel_hat(h, grid, p, dtype, poly=poly,
                                    near_excl=ne)
        khat_wall = (_wall_kernel_hat(lo[2], h, grid, p, dtype, h_floor,
                                      poly=poly, near_excl=ne)
                     if wall else None)
        if band_p:
            band_free = _band_blocks_free(h, band_p, dtype, poly=poly)
            band_wall = (_band_blocks_wall(lo[2], h, grid, band_p, dtype,
                                           h_floor, poly=poly)
                         if wall else None)
    ci, cid = _cell_indices(x, lo, h, grid)
    t3 = (x - lo) / h - ci.astype(dtype)
    W3 = _blob_weights(t3, _cheb_nodes(p))                   # (N_l, p³)
    W6 = _blob_weights(t3, _cheb_nodes(band_p)) if band_p else None

    # sorted tile structure, built redundantly from one gather of the
    # global positions (O(N log N) sort + O(t²) adjacency — trivial next
    # to the pair sweep, and now amortized over the whole solve)
    x_all = lax.all_gather(x, axis_name, tiled=True)         # (N, 3)
    ci_all = lax.all_gather(ci, axis_name, tiled=True)
    order = tiles.cell_snake_order(ci_all, grid)
    pad = t_pad * TILE - n
    # pad rows: the partial tile keeps the LAST sorted entry's cell (tight
    # bbox, as in mobility_apply); whole pad tiles sit at an isolated
    # out-of-range cell so they link to no real tile (adjacency gap ≥ 2)
    # and cost no neighbor-list width
    pad_part = min(pad, t * TILE - n)
    iso = jnp.asarray(grid, jnp.int32) + 2
    ci_pad = jnp.concatenate([
        jnp.broadcast_to(ci_all[order[-1:]], (pad_part, 3)),
        jnp.broadcast_to(iso, (pad - pad_part, 3)),
    ]) if pad else ci_all[:0]
    x_s = jnp.concatenate([x_all[order], jnp.broadcast_to(
        x_all[order[-1:]], (pad, 3))])
    ci_s = jnp.concatenate([ci_all[order], ci_pad])
    id_s = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    if poly:
        ah_all = lax.all_gather(ahat, axis_name, tiled=True)
        ah_s = jnp.concatenate([ah_all[order], jnp.ones((pad,), dtype)])
    else:
        ah_s = None
    nbr, overflow = _near_neighbor_lists(
        ci_s, t_pad, max_nbr,
        wrap_xy=(grid[0], grid[1]) if per else None)
    if geo_bad is not None:
        overflow = overflow | geo_bad
    self_diag = _self_diag_field(n_l, dtype, ahat, wall, r_l[:, 2], a,
                                 h_floor, radii_l)
    return FarCtx(lo=lo, h=h, khat_free=khat_free, khat_wall=khat_wall,
                  b=b, ahat=ahat, cid=cid, W3=W3, self_diag=self_diag,
                  order=order, x_s=x_s, ci_s=ci_s, id_s=id_s, ah_s=ah_s,
                  nbr=nbr, overflow=overflow, W6=W6, band_free=band_free,
                  band_wall=band_wall)
