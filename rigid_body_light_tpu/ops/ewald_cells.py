"""Sorted-tile neighbor sweep for the balanced-splitting Ewald real part.

With ``make_params(..., rc=...)`` the real-space scalars truncate at a
cutoff rc ≪ min(L)/2, so the O(N²) all-pairs sweep
(:func:`rigid_body_light_tpu.ops.ewald.real_space_apply`) is wasted work.
This module sweeps only blob pairs that can be within rc, at
O(N·ρ·rc³) cost, while the (now larger) wave-space part stays dense MXU
matmuls (k-chunked in ``ewald.wave_space_apply``).

Structure (shared machinery: :mod:`rigid_body_light_tpu.ops.tiles`):
fold into the box → serpentine equal-population tiles → AABB adjacency
at radius rc (minimum-image) → per-row-tile padded neighbor lists →
exact pair fields against neighbor blobs, identical scalars and masks
to the all-pairs sweep.  Neighbor-list overflow cannot reallocate under
jit, so it is LOUD: velocities are NaN-poisoned (caught by the
stepper's validity guards) and the width should be raised
(``SimulationConfig.ewald_nbr_tiles``).

Reference counterpart: none — the reference is open-domain only
(``c_rigid_obj.cpp:413-459``); this transcends it the same way
``ops/ewald.py`` does, at linear instead of quadratic cost.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from rigid_body_light_tpu.ops import ewald, tiles

TILE = tiles.TILE


def default_max_nbr(n: int, params: "ewald.EwaldParams") -> int:
    return tiles.default_max_nbr(n, float(np.prod(params.box)), params.rc)


def _fold(r, params):
    lx, ly, lz = params.box
    fx = r[:, 0] - lx * jnp.floor(r[:, 0] / lx)
    fy = r[:, 1] - ly * jnp.floor(r[:, 1] / ly)
    fz = r[:, 2] - lz * jnp.floor(r[:, 2] / lz)
    return jnp.stack([fx, fy, fz], axis=1)


def _chunk_rows(t: int, max_nbr: int, nrhs: int) -> int:
    """Largest divisor of t keeping a chunk's pair fields ≤ ~96 MB."""
    budget = 96 * 2**20
    per_tile = max_nbr * TILE * TILE * 4 * (6 + 3 * nrhs)
    best = 1
    for d in range(1, t + 1):
        if t % d == 0 and d * per_tile <= budget:
            best = d
    return best


def real_space_apply_cells(F, r, params: "ewald.EwaldParams", max_nbr=None,
                           radii=None, poly_tables=None):
    """U_real = Σ_{j≠i, r_ij ≤ rc} [A·I + B·r̂r̂]·F_j via sorted tiles.

    F: (N, 3) or (k, N, 3).  Returns U shaped like F, NaN-poisoned on
    neighbor-list overflow (see module docstring).

    radii: optional (N,) per-blob radii — exact polydisperse scalars via
    the same per-species-pair machinery as the all-pairs sweep (f32:
    masked Chebyshev fits from ``poly_tables`` — built on the fly from
    concrete radii if not given; f64: closed forms with per-pair shifts).
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
    if radii is not None and dtype == jnp.float32 and poly_tables is None:
        poly_tables = ewald.make_poly_tables(params, radii)
    rf = _fold(r, params)
    order = tiles.serpentine_order(
        rf, tiles.column_width(n, float(np.prod(params.box))))
    t = -(-n // TILE)
    pad = t * TILE - n
    rf_s = rf[order]
    r_pad = jnp.concatenate([rf_s, jnp.broadcast_to(rf_s[:1], (pad, 3))])
    ids_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    F_pad = jnp.concatenate(
        [Fs[:, order, :], jnp.zeros((k, pad, 3), dtype)], axis=1)
    pp = _poly_pad(radii, poly_tables, order, pad, dtype)

    adj = tiles.bbox_adjacency(r_pad, t, params.rc, box=params.box)
    nbr, overflow = tiles.pack_neighbor_lists(adj, max_nbr)

    U_s = _cell_sweep(r_pad, ids_pad, F_pad, nbr, max_nbr, params,
                      0, t, poly=pp)[:, :n]
    U = jnp.zeros_like(Fs).at[:, order, :].set(U_s)
    U = jnp.where(overflow, jnp.nan, U)
    return U if multi else U[0]


def _poly_pad(radii, poly_tables, order, pad, dtype):
    """Sorted/padded polydisperse sidecar for :func:`_cell_sweep`.

    Returns None (monodisperse) or ``(rad_pad, sidx_pad, poly_tables)``
    in the sweep's sorted order — pads carry radius 1 / species 0 and are
    masked out by the id = −1 pair mask either way.
    """
    if radii is None:
        return None
    rad_s = jnp.asarray(radii, dtype)[order]
    rad_pad = jnp.concatenate([rad_s, jnp.ones((pad,), dtype)])
    sidx_pad = None
    if poly_tables is not None:
        sidx_s = jnp.asarray(poly_tables.sidx, jnp.int32)[order]
        sidx_pad = jnp.concatenate([sidx_s, jnp.zeros((pad,), jnp.int32)])
    return rad_pad, sidx_pad, poly_tables


def _cell_sweep(r_pad, ids_pad, F_pad, nbr, max_nbr, params, t0, nt,
                poly=None):
    """Cutoff pair sweep for the sorted tile range [t0, t0+nt).

    r_pad/ids_pad (t·TILE, …) folded sorted padded arrays, F_pad
    (k, t·TILE, 3), nbr (t, max_nbr) neighbor-tile lists.  Returns
    (k, nt·TILE, 3) pair terms in sorted order.  ``t0`` may be traced
    (the distributed caller passes its device's slice start).
    ``poly``: optional ``(rad_pad, sidx_pad, poly_tables)`` sidecar from
    :func:`_poly_pad` — per-pair polydisperse scalars.
    """
    dtype = r_pad.dtype
    t = nbr.shape[0]
    k = F_pad.shape[0]
    nbr_ix = jnp.maximum(nbr, 0)
    ch = _chunk_rows(nt, max_nbr, k)
    a = jnp.asarray(params.a, dtype)
    xi = jnp.asarray(params.xi, dtype)
    eta = jnp.asarray(params.eta, dtype)
    rc = jnp.asarray(params.rc, dtype)
    rt = r_pad.reshape(t, TILE, 3)
    it = ids_pad.reshape(t, TILE)
    Ft = F_pad.reshape(k, t, TILE, 3)
    radt = sixt = pt = None
    if poly is not None:
        rad_pad, sidx_pad, pt = poly
        radt = rad_pad.reshape(t, TILE)
        sixt = None if sidx_pad is None else sidx_pad.reshape(t, TILE)

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
        if poly is not None and dtype == jnp.float32:
            # masked per-species-pair Chebyshev sweeps (ewald.PolyTables)
            si = lax.dynamic_slice(sixt, (c0, z), (ch, TILE))[:, :, None]
            sj = sixt[nb].reshape(ch, max_nbr * TILE)[:, None, :]
            pair = jnp.asarray(pt.pair_map, jnp.int32)[si, sj]
            A = jnp.zeros_like(rr)
            B = jnp.zeros_like(rr)
            for pi in range(pt.bounds.shape[0]):
                Ap, Bp = ewald._cheb_ab(rr, pt.bounds[pi], pt.coefA[pi],
                                        pt.coefB[pi])
                m = pair == pi
                A = jnp.where(m, Ap, A)
                B = jnp.where(m, Bp, B)
        elif poly is not None:
            ai = lax.dynamic_slice(radt, (c0, z), (ch, TILE))[:, :, None]
            aj = radt[nb].reshape(ch, max_nbr * TILE)[:, None, :]
            A, B = ewald.real_space_ab(rr, a, xi, eta, ai=ai, aj=aj)
        elif dtype == jnp.float32:
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

    starts = t0 + jnp.arange(nt // ch, dtype=jnp.int32) * ch
    U_pad = lax.map(chunk_fn, starts)              # (nt/ch, ch, k, TILE, 3)
    return U_pad.reshape(nt, k, TILE, 3).transpose(1, 0, 2, 3).reshape(
        k, nt * TILE, 3)


def real_space_apply_cells_local(F_l, r_l, params: "ewald.EwaldParams",
                                 n_devices: int, axis_name: str,
                                 max_nbr=None, radii_l=None,
                                 poly_tables=None):
    """Local-shard cutoff real sweep for use INSIDE ``shard_map``.

    The distributed form of :func:`real_space_apply_cells` — the same
    slice pattern as the proxy-grid far field's near sweep: gather the
    (N, 3) arrays once, build the folded sorted-tile structure
    redundantly (O(N log N) sort + O(t²) AABB adjacency — trivial next
    to the sweep), sweep only this device's equal tile slice at
    O(N·ρ·rc³/D), and regather the slices.  Closes the
    ``mobility_apply_local`` caveat that balanced-splitting configs paid
    an all-pairs ring.  F_l: (N_l, 3) or (k, N_l, 3).  radii_l: optional
    (N_l,) local per-blob radii (polydisperse; f32 needs ``poly_tables``
    built from the GLOBAL radii — a host-side constant, so the shard_map
    closure carries it).
    """
    multi = F_l.ndim == 3
    Fs = F_l if multi else F_l[None]
    k, n_l = Fs.shape[0], r_l.shape[0]
    n = n_l * n_devices
    dtype = r_l.dtype
    if max_nbr is None:
        max_nbr = default_max_nbr(n, params)
    if radii_l is not None and dtype == jnp.float32 and poly_tables is None:
        raise ValueError("distributed f32 polydisperse cells sweep needs "
                         "poly_tables=make_poly_tables(params, radii) built "
                         "from the global radii outside shard_map")
    idx = lax.axis_index(axis_name)
    rf = _fold(r_l, params)
    rf_all = lax.all_gather(rf, axis_name, tiled=True)        # (N, 3)
    F_all = lax.all_gather(Fs, axis_name, axis=1, tiled=True)
    rad_all = (None if radii_l is None else
               lax.all_gather(jnp.asarray(radii_l, dtype), axis_name,
                              tiled=True))
    order = tiles.serpentine_order(
        rf_all, tiles.column_width(n, float(np.prod(params.box))))
    t = -(-n // TILE)
    t_pad = -(-t // n_devices) * n_devices
    pad = t_pad * TILE - n
    rf_s = rf_all[order]
    # pad rows sit at blob 0's folded position (periodic wrap means there
    # is no "far away"); they are masked by id −1, and the whole pad
    # tiles they form are mutually adjacent plus adjacent to tiles near
    # blob 0 — widen the neighbor list to absorb that (overflow there
    # would NaN-poison the apply)
    max_nbr = min(t_pad, max_nbr + (t_pad - t))
    r_pad = jnp.concatenate([rf_s, jnp.broadcast_to(rf_s[:1], (pad, 3))])
    ids_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    F_pad = jnp.concatenate(
        [F_all[:, order, :], jnp.zeros((k, pad, 3), dtype)], axis=1)
    pp = _poly_pad(rad_all, poly_tables, order, pad, dtype)

    adj = tiles.bbox_adjacency(r_pad, t_pad, params.rc, box=params.box)
    nbr, overflow = tiles.pack_neighbor_lists(adj, max_nbr)
    nt = t_pad // n_devices
    U_slice = _cell_sweep(r_pad, ids_pad, F_pad, nbr, max_nbr, params,
                          idx * nt, nt, poly=pp)   # (k, nt·TILE, 3)
    U_sorted = lax.all_gather(U_slice, axis_name, axis=1,
                              tiled=True)[:, :n]
    U_g = jnp.zeros((k, n, 3), dtype).at[:, order, :].set(U_sorted)
    U = lax.dynamic_slice_in_dim(U_g, idx * n_l, n_l, axis=1)
    U = jnp.where(overflow, jnp.nan, U)
    return U if multi else U[0]
