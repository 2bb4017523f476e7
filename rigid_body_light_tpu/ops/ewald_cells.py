"""Sorted-tile neighbor sweep for the balanced-splitting Ewald real part.

With ``make_params(..., rc=...)`` the real-space scalars truncate at a
cutoff rc ≪ min(L)/2, so the O(N²) all-pairs sweep
(:func:`rigid_body_light_tpu.ops.ewald.real_space_apply`) is wasted work.
This module sweeps only blob pairs that can be within rc, at
O(N·ρ·rc³) cost, while the (now larger) wave-space part stays dense MXU
matmuls (k-chunked in ``ewald.wave_space_apply``).

Data structure — equal-POPULATION tiles, not equal-volume cells: blobs
are folded into the box, sorted by Morton code, and partitioned into
tiles of ``TILE`` consecutive blobs.  A uniform cell grid with a static
per-cell capacity fails on exactly the data this framework exists for —
rigid multiblob bodies cluster hundreds of blobs at body scale, so any
affordable capacity overflows while most cells sit empty.  Population
tiles self-balance: dense regions produce spatially small tiles, dilute
regions large ones, and the tile size never depends on the data.

Sweep: per-tile AABBs (folded coords; the Morton sort keeps tiles off
the periodic seam) → tile-pair adjacency via minimum-image box distance
≤ rc → each row tile gathers a PADDED list of ``max_nbr`` neighbor-tile
ids (the only static bound; it caps *spatial extent per population*,
which the equal-population construction keeps ~uniform) and computes
exact pair fields against their blobs, identical scalars and masks to
the all-pairs sweep.  Neighbor-list overflow cannot reallocate under
jit, so it is LOUD: velocities are NaN-poisoned (caught by the
stepper's validity guards) and ``max_nbr`` should be raised
(``SimulationConfig.ewald_nbr_tiles``).

Reference counterpart: none — the reference is open-domain only
(``c_rigid_obj.cpp:413-459``); this transcends it the same way
``ops/ewald.py`` does, at linear instead of quadratic cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rigid_body_light_tpu.ops import ewald

TILE = 128
_MORTON_BITS = 8  # 256³ Morton grid — finer than any practical tiling


def default_max_nbr(n: int, params: "ewald.EwaldParams") -> int:
    """Static neighbor-list width: 4× the uniform-density estimate + 8.

    Estimate = tiles whose volume a (rc + tile diameter) ball covers at
    uniform density; equal-population tiles keep the actual count near
    this even for clustered data (see module docstring).
    """
    t = -(-n // TILE)
    v = float(np.prod(params.box))
    tile_r = (v / t) ** (1.0 / 3.0) * 0.87  # half diagonal of a mean cube
    ball = 4.19 * (params.rc + 2 * tile_r) ** 3
    est = ball / (v / t)
    return int(min(t, np.ceil(4.0 * est) + 8))


def _morton(ci, cj, ck):
    """Interleave three _MORTON_BITS-wide ints into a Morton code."""
    code = jnp.zeros_like(ci)
    for b in range(_MORTON_BITS):
        bit = jnp.int32(1 << b)
        code = (code
                | ((ci & bit) << (2 * b))
                | ((cj & bit) << (2 * b + 1))
                | ((ck & bit) << (2 * b + 2)))
    return code


def _sort_tiles(r, params):
    """Fold, Morton-sort and pad. Returns (order, r_pad, t) with r_pad
    (t·TILE, 3) folded positions (pads duplicate blob 0) and t tiles."""
    n = r.shape[0]
    lx, ly, lz = params.box
    fx = r[:, 0] - lx * jnp.floor(r[:, 0] / lx)
    fy = r[:, 1] - ly * jnp.floor(r[:, 1] / ly)
    fz = r[:, 2] - lz * jnp.floor(r[:, 2] / lz)
    g = (1 << _MORTON_BITS) - 1
    ci = jnp.clip((fx * ((g + 1) / lx)).astype(jnp.int32), 0, g)
    cj = jnp.clip((fy * ((g + 1) / ly)).astype(jnp.int32), 0, g)
    ck = jnp.clip((fz * ((g + 1) / lz)).astype(jnp.int32), 0, g)
    order = jnp.argsort(_morton(ci, cj, ck))
    t = -(-n // TILE)
    pad = t * TILE - n
    rf = jnp.stack([fx, fy, fz], axis=1)[order]
    r_pad = jnp.concatenate([rf, jnp.broadcast_to(rf[:1], (pad, 3))])
    return order, r_pad, t


def _tile_adjacency(r_pad, t, params):
    """(t, t) bool: can any pair between the two tiles be within rc?

    Minimum-image distance between tile AABBs, via wrapped center deltas
    minus summed half-extents (valid while extents < L/2 — guaranteed
    off-seam by the folded Morton sort).
    """
    rt = r_pad.reshape(t, TILE, 3)
    lo = jnp.min(rt, axis=1)
    hi = jnp.max(rt, axis=1)
    c = 0.5 * (lo + hi)
    e = 0.5 * (hi - lo)
    d = ewald._wrap3(c[:, None, :] - c[None, :, :], params.box)
    gap = jnp.maximum(jnp.abs(d) - (e[:, None, :] + e[None, :, :]), 0.0)
    return jnp.sum(gap * gap, axis=-1) <= jnp.asarray(params.rc, r_pad.dtype) ** 2


def _neighbor_lists(adj, max_nbr):
    """Pack each row's adjacent tile ids into (t, max_nbr) (-1 = unused).

    Overflow flag = any row with more than max_nbr neighbors.
    """
    t = adj.shape[0]
    cols = jnp.arange(t, dtype=jnp.int32)
    key = jnp.where(adj, cols, t + cols)          # adjacents sort first
    packed = jnp.sort(key, axis=1)[:, :max_nbr]
    counts = jnp.sum(adj, axis=1)
    overflow = jnp.any(counts > max_nbr)
    nbr = jnp.where(packed < t, packed, -1)
    return nbr, overflow


def _chunk_rows(t: int, max_nbr: int, nrhs: int) -> int:
    """Largest divisor of t keeping a chunk's pair fields ≤ ~96 MB."""
    budget = 96 * 2**20
    per_tile = max_nbr * TILE * TILE * 4 * (6 + 3 * nrhs)
    best = 1
    for d in range(1, t + 1):
        if t % d == 0 and d * per_tile <= budget:
            best = d
    return best


def real_space_apply_cells(F, r, params: "ewald.EwaldParams", max_nbr=None):
    """U_real = Σ_{j≠i, r_ij ≤ rc} [A·I + B·r̂r̂]·F_j via sorted tiles.

    F: (N, 3) or (k, N, 3); monodisperse only.  Returns U shaped like F,
    NaN-poisoned on neighbor-list overflow (see module docstring).
    """
    if params.rc is None:
        raise ValueError("tile sweep needs params built with rc= "
                         "(balanced splitting)")
    dtype = r.dtype
    multi = F.ndim == 3
    Fs = F if multi else F[None]
    k, n = Fs.shape[0], r.shape[0]
    if max_nbr is None:
        max_nbr = default_max_nbr(n, params)
    order, r_pad, t = _sort_tiles(r, params)
    pad = t * TILE - n
    ids_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    F_pad = jnp.concatenate(
        [Fs[:, order, :], jnp.zeros((k, pad, 3), dtype)], axis=1)

    adj = _tile_adjacency(r_pad, t, params)
    nbr, overflow = _neighbor_lists(adj, max_nbr)
    nbr_ix = jnp.maximum(nbr, 0)

    ch = _chunk_rows(t, max_nbr, k)
    a = jnp.asarray(params.a, dtype)
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    rc = jnp.asarray(params.rc, dtype)
    rt = r_pad.reshape(t, TILE, 3)
    it = ids_pad.reshape(t, TILE)
    Ft = F_pad.reshape(k, t, TILE, 3)

    def chunk_fn(c0):
        z = jnp.zeros((), c0.dtype)
        rows_r = lax.dynamic_slice(rt, (c0, z, z), (ch, TILE, 3))
        rows_id = lax.dynamic_slice(it, (c0, z), (ch, TILE))
        nb = lax.dynamic_slice(nbr_ix, (c0, z), (ch, max_nbr))
        nb_live = lax.dynamic_slice(nbr, (c0, z), (ch, max_nbr)) >= 0
        cols_r = rt[nb].reshape(ch, max_nbr * TILE, 3)
        cols_id = jnp.where(nb_live[..., None], it[nb],
                            -1).reshape(ch, max_nbr * TILE)
        cols_F = Ft[:, nb].transpose(1, 0, 2, 3, 4).reshape(
            ch, k, max_nbr * TILE, 3)

        d = ewald._wrap3(rows_r[:, :, None, :] - cols_r[:, None, :, :],
                         params.box)               # (ch, TILE, M·TILE, 3)
        r2 = jnp.sum(d * d, axis=-1)
        pair_ok = (cols_id[:, None, :] >= 0) & (
            rows_id[:, :, None] != cols_id[:, None, :])
        rr = jnp.sqrt(jnp.where(pair_ok, jnp.maximum(r2, 1e-24), 1.0))
        if dtype == jnp.float32:
            A, B = ewald._cheb_ab(rr, params.cheb_bounds, params.cheb_A,
                                  params.cheb_B)
        else:
            A, B = ewald.real_space_ab(rr, a, xi, eta)
        keep = pair_ok & (rr <= rc)
        A = jnp.where(keep, A, 0.0)
        B = jnp.where(keep, B, 0.0)
        e = d / rr[..., None]
        eF = jnp.einsum("cpnx,cknx->ckpn", e, cols_F)
        return (jnp.einsum("cpn,cknx->ckpx", A, cols_F)
                + jnp.einsum("ckpn,cpn,cpnx->ckpx", eF, B, e))

    starts = jnp.arange(t // ch, dtype=jnp.int32) * ch
    U_pad = lax.map(chunk_fn, starts)              # (t/ch, ch, k, TILE, 3)
    U_s = U_pad.reshape(t, k, TILE, 3).transpose(1, 0, 2, 3).reshape(
        k, t * TILE, 3)[:, :n]
    U = jnp.zeros_like(Fs).at[:, order, :].set(U_s)
    U = jnp.where(overflow, jnp.nan, U)
    return U if multi else U[0]
