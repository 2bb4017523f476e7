"""Gridded (PME-style) Ewald wave part: the k-sum as cell-spectral FFTs.

The balanced-splitting periodic mode (``ewald_rc``) shifts work from the
O(N²) real sweep to the wave sum — but the dense wave evaluation
(:func:`rigid_body_light_tpu.ops.ewald.wave_space_apply`) costs O(N·K)
with K ∝ N at fixed rc, so the total stayed quadratic and measurably
LOST to the all-pairs Pallas sweep at every size (BENCH_NOTES round 4).
This module supplies the missing piece: a particle-mesh evaluation of
the same k-sum at O(N·p³ + G³·p³·log G) — the composition

    M_per·F = real_cells(rc) + A_self·F + wave_grid(F)

is the at-scale periodic operator.

Structure (riding the proxy-grid far-field machinery of
:mod:`rigid_body_light_tpu.ops.farfield` — Chebyshev nodes per cell,
separable Lagrange P2M/L2P):

1. Fold positions into the box, anterpolate F onto p³ Chebyshev nodes
   per cell of a (Gx, Gy, Gz) grid that tiles the box exactly (P2M).
2. 3-D real FFT of the node moments over the CELL axes.  Because node
   x = (c + s_u)·h and k = 2πn/L, the plane-wave phase factorizes as
   e^{ik·x} = e^{2πi n·c/G} · e^{2πi n·s_u/G}: the cell factor is the
   DFT basis at frequency n mod G, the node factor a per-dim p-vector.
3. THE KEY PROPERTY: with the grid oversampled past Nyquist
   (G_d ≥ 2·nmax_d + 2), every spectral bin m holds AT MOST ONE
   wavevector (its minimum-imaged n), so the wave kernel is DIAGONAL
   over bins and rank-3 inside each: per bin,
   û(m) = wk·φ_u(k)·(I − k̂k̂)·Σ_{u'} φ̄_{u'}(k)·Q̂(m)_{u'}
   — six tiny per-dim phase contractions instead of a (3p³)² block
   lattice.  Storage O(G³), apply O(G³·p³); no kernel lattice at all.
4. Inverse FFT, interpolate node velocities back to blobs (L2P).

The ONLY approximation is Chebyshev interpolation of the plane waves
e^{ik·x} within a cell — worst-case argument κ = π·nmax/G per dim, and
the Gaussian-screened weights wk crush the large-k (large-κ) modes, so
the measured operator error sits far below the κ^p/(2^{p-1}·p!) bound
(tests/test_ewald_pme.py pins it: p=4 ≈ 1e-4, p=6 ≈ 1e-6 relative at
oversample 2).  Because P2M and L2P use the SAME basis, the gridded
wave operator is exactly symmetric positive semi-definite
(M_wave = Pᵀ·diag⁺·P), so the full periodic mobility stays SPD —
Lanczos M^{1/2} draws remain valid.

Polydisperse: the wave symbol sinc(kaᵢ)·sinc(kaⱼ) FACTORIZES per
particle per wavevector, so per-blob radii become species-split grids —
spread each species onto its own node-moment field, weight each
species' spectrum by its per-bin sinc(|k|a_s) table, sum into one
plane-wave amplitude, and interpolate each blob from its own species'
(sinc-weighted) synthesis grid.  Cost S× the FFT/P2M work for S
distinct radii (mixtures have a handful); exactness and the SPD
structure are unchanged (M_wave = Pᵀ·diag⁺·P with P now carrying the
species sinc weights).  Build with ``make_grid(..., radii=)``.
Reference counterpart: none — the reference is open-domain O(N²) only
(``c_rigid_obj.cpp:413-459``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu.ops import ewald, farfield, fftsafe


class EwaldGrid(NamedTuple):
    """Static spectral-bin tables (numpy, jit-closable; all O(G³))."""

    grid: tuple           # (Gx, Gy, Gz) cells — tiles the box exactly
    p: int                # Chebyshev nodes per dim per cell
    wk_bin: np.ndarray    # (Gx, Gy, Gz//2+1) wave weight × ΠG (irfft norm);
    #                       0 on bins holding no wavevector (incl. k = 0)
    khat_bin: np.ndarray  # (Gx, Gy, Gz//2+1, 3) unit k̂ (0 where wk_bin=0)
    phi_x: np.ndarray     # (Gx, p) complex e^{2πi·n(m)·s_u/Gx} node phases
    phi_y: np.ndarray     # (Gy, p)
    phi_z: np.ndarray     # (Gz//2+1, p)
    sidx: np.ndarray = None      # polydisperse: (N,) int32 species per blob
    sinc_bin: np.ndarray = None  # (S, Gx, Gy, Gz//2+1) sinc(|k|·a_s) —
    #                              wk_bin then carries wk_raw (no sinc²)


def _next_fast(n: int) -> int:
    """Smallest 2^a·3^b·5^c ≥ n (FFT-friendly grid sizes)."""
    m = n
    while True:
        k = m
        for f in (2, 3, 5):
            while k % f == 0:
                k //= f
        if k == 1:
            return m
        m += 1


def _signed_freq(g: int) -> np.ndarray:
    o = np.arange(g)
    return np.where(o <= g // 2, o, o - g).astype(np.int64)


def make_grid(params: "ewald.EwaldParams", p: int = 4,
              oversample: float = 2.0, radii=None) -> EwaldGrid:
    """Build the spectral-bin tables for ``params``' wavevector set.

    The grid size per dim is the FFT-friendly round-up of
    ``oversample · (2·nmax_d + 1)`` (≥ 2·nmax_d + 2, so minimum-imaging
    spectral bins is unambiguous and each bin holds at most one k).
    Larger oversample shrinks the per-cell phase argument (better
    interpolation at fixed p) at O(oversample³) FFT cost.

    radii: optional concrete (N,) per-blob radii — builds the
    species-split tables (``sidx``/``sinc_bin``) and the sinc-free
    ``wk_bin``; the apply then runs one spread/interp grid per distinct
    radius (see module docstring).
    """
    if params.nvecs is None:
        raise ValueError("make_grid needs params.nvecs (ewald.make_params)")
    if p < 2:
        raise ValueError(f"ewald grid needs p >= 2 nodes per dim, got {p}")
    if oversample < 1.0:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    box = params.box
    nmax = np.abs(params.nvecs).max(axis=0).astype(int)      # (3,)
    grid = tuple(
        _next_fast(max(int(np.ceil(oversample * (2 * nm + 1))), 2 * nm + 2, 4))
        for nm in nmax)
    gx, gy, gz = grid
    gzh = gz // 2 + 1
    # the exact keep-predicate of make_params: k ≠ 0 and |k| ≤ kmax
    kmax2 = float((params.kvecs ** 2).sum(axis=1).max()) * (1 + 1e-12)
    NX, NY, NZ = np.meshgrid(_signed_freq(gx), _signed_freq(gy),
                             np.arange(gzh), indexing="ij")
    n_bin = np.stack([NX, NY, NZ], axis=-1)                  # (gx,gy,gzh,3)
    kvec = 2 * np.pi * n_bin / np.asarray(box)
    k2 = np.sum(kvec**2, axis=-1)
    keep = (k2 > 0) & (k2 <= kmax2) & np.all(np.abs(n_bin) <= nmax, axis=-1)
    wk_raw, wk = ewald.wave_weights(kvec, params.a, params.eta, box,
                                    params.xi)
    sidx = sinc_bin = None
    if radii is not None:
        rad = np.asarray(radii, np.float64)         # concrete (host tables)
        uniq, sidx = np.unique(rad, return_inverse=True)
        sidx = sidx.astype(np.int32)
        kk = np.sqrt(np.maximum(k2, 1e-300))
        ka = kk[None] * uniq[:, None, None, None]    # (S, gx, gy, gzh)
        sinc_bin = np.where(keep[None], np.sinc(ka / np.pi), 0.0)
        wk = wk_raw                                  # sinc² moves per-species
    wk_bin = np.where(keep, wk, 0.0) * float(gx * gy * gz)
    khat = np.where(keep[..., None],
                    kvec / np.sqrt(np.maximum(k2, 1e-300))[..., None], 0.0)
    nodes = farfield._cheb_nodes(p)                          # (p,) in (0,1)

    def phases(g, freqs):
        return np.exp(2j * np.pi * np.outer(freqs, nodes) / g)

    return EwaldGrid(
        grid=grid, p=int(p), wk_bin=wk_bin, khat_bin=khat,
        phi_x=phases(gx, _signed_freq(gx)),
        phi_y=phases(gy, _signed_freq(gy)),
        phi_z=phases(gz, np.arange(gzh)),
        sidx=sidx, sinc_bin=sinc_bin,
    )


def _analysis_tensors(g: EwaldGrid):
    """Per-axis spectral contraction tensors on FLAT node layouts.

    The node-moment spectrum Q̂ lives on the q = ((a·p+b)·p+c)·3+t flat
    axis (B = 3p³ minor — TPU lane layout pads the two minor dims of
    every buffer to (8, 128), so an (..., p, p, p, 3) op boundary
    inflates ~85× at production grids; see farfield._flat_outer).  The
    per-bin plane-wave amplitude Ĝ = φ̄ᵀQ̂ therefore runs as two batched
    GEMMs with kron-structured selector tensors:

      Tz  (Gz/2+1, 3p³, 3p²):  contract c     — kron(I_{p²}, φ̄z ⊗ I₃)
      Txy (Gx, Gy, 3p², 3):    contract a, b  — kron(φ̄x ⊗ φ̄y, I₃)

    Synthesis (spread Ĝ back onto node spectra) is the conjugate pair.
    Both are numpy constants, O(G·p³) bytes total.
    """
    p = g.p
    gx, gy, _ = g.grid
    I3 = np.eye(3)
    pz = np.conj(g.phi_z)                                    # (gzh, p)
    Tz = np.einsum("ik,zc,tu->zictku",
                   np.eye(p * p), pz, I3).reshape(
                       pz.shape[0], 3 * p ** 3, 3 * p * p)
    pxy = np.einsum("xa,yb->xyab", np.conj(g.phi_x),
                    np.conj(g.phi_y)).reshape(gx, gy, p * p)
    Txy = np.einsum("xys,tu->xystu", pxy, I3).reshape(gx, gy, 3 * p * p, 3)
    return Tz, Txy


def wave_space_apply_grid(F, r, params: "ewald.EwaldParams", g: EwaldGrid):
    """U_wave = Σ_{k≠0} wk(I − k̂k̂) e^{ik·(rᵢ−rⱼ)} F_j via the cell grid.

    Drop-in for :func:`ewald.wave_space_apply`: includes the i = j wave
    self term, symmetric PSD by construction.  F (N, 3) single RHS or
    (k, N, 3) multi-RHS (shared P2M weights and spectrum batch — the
    fused 2-RHS Lanczos noise path).  Grids built with ``radii=`` run
    the species-split polydisperse path (S spread/interp fields folded
    into the RHS batch axis; one shared spectral kernel).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    single = jnp.ndim(F) == 2
    Fs = jnp.asarray(F, r.dtype).reshape(-1, r.shape[0], 3)
    dtype = r.dtype
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    gx, gy, gz = g.grid
    p = g.p
    ncell = gx * gy * gz
    k = Fs.shape[0]
    poly = g.sidx is not None
    S = int(g.sinc_bin.shape[0]) if poly else 1
    box = jnp.asarray(params.box, dtype)
    h = box / jnp.asarray(g.grid, dtype)
    xf = r - box * jnp.floor(r / box)                        # fold into box
    lo = jnp.zeros(3, dtype)
    ci, cid = farfield._cell_indices(xf, lo, h, g.grid)
    t3 = jnp.clip(xf / h - ci.astype(dtype), 0.0, 1.0)       # intra-cell
    W3 = farfield._blob_weights(t3, farfield._cheb_nodes(p))  # (N, p³)
    if poly:
        # species-split spread fields, folded into the RHS batch axis
        onehot = jnp.asarray(
            np.arange(S)[:, None] == g.sidx[None, :], dtype)  # (S, N)
        Fs = (Fs[:, None] * onehot[None, :, :, None]).reshape(
            k * S, -1, 3)
    Q = farfield._p2m(W3, cid, Fs, ncell, p)             # (k·S, ncell, 3p³)
    B = 3 * p ** 3
    # Everything below keeps the node axis FLAT (B or 3p² minor) and the
    # per-bin 3-vector amplitude in a (k, 3, gx, gy, gzh) MAJOR-t layout:
    # TPU lane padding inflates any (..., p, p, p, 3)-shaped boundary
    # ~85× at production grids (see _analysis_tensors).
    Tz, Txy = _analysis_tensors(g)
    Tz = jnp.asarray(Tz, cdtype)
    Txy = jnp.asarray(Txy, cdtype)
    Qh = fftsafe.rfftn_lanes(Q.reshape(k * S, gx, gy, gz, B), axes=(1, 2, 3))
    # analysis: Ĝ(bin) = φ̄ᵀQ̂ — z-stage GEMM then xy-stage GEMM
    A1 = jnp.einsum("kxyzq,zqs->kxyzs", Qh, Tz)            # (k·S,x,y,zh,3p²)
    A = jnp.einsum("kxyzs,xysv->kvxyz", A1, Txy)           # (k·S,3,x,y,zh)
    kh = jnp.asarray(np.moveaxis(g.khat_bin, -1, 0), dtype)  # (3,x,y,zh)
    wkb = jnp.asarray(g.wk_bin, dtype)
    if poly:
        # Σ_s sinc_s·Â_s — one plane-wave amplitude per bin, then fan the
        # kernelled amplitude back out with the same per-species weights
        sc = jnp.asarray(g.sinc_bin, dtype)[None, :, None]   # (1,S,1,x,y,zh)
        A = jnp.sum(A.reshape(k, S, 3, gx, gy, gz // 2 + 1) * sc, axis=1)
    A = wkb * (A - kh * jnp.sum(kh * A, axis=1, keepdims=True))
    if poly:
        A = (A[:, None] * sc).reshape(k * S, 3, gx, gy, gz // 2 + 1)
    # synthesis: V̂_u = φ_u·Ĝ — conjugate tensors, reverse order
    V1 = jnp.einsum("kvxyz,xysv->kxyzs", A, jnp.conj(Txy))
    V = jnp.einsum("kxyzs,zqs->kxyzq", V1, jnp.conj(Tz))   # (k·S,x,y,zh,B)
    Un = fftsafe.irfftn_lanes(V, s=(gx, gy, gz), axes=(1, 2, 3)).astype(dtype)
    U = farfield._l2p(W3, cid, Un.reshape(k * S, ncell, B), p)
    if poly:
        # each blob reads its own species' sinc-weighted synthesis field
        U = jnp.einsum("ksnx,sn->knx", U.reshape(k, S, -1, 3), onehot)
    return U[0] if single else U
