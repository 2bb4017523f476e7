"""Equal-population spatial tiles with deterministically tight extents.

Shared machinery for the cutoff-limited pair sweeps (periodic Ewald real
part, open-domain far-field near part): blobs are sorted so that every
run of ``TILE`` consecutive blobs is spatially compact, then swept
against a padded per-tile neighbor list.

The sort is a 3-D serpentine (boustrophedon) column order, not a Morton
curve: columns of side h ≈ (V·TILE/N)^{1/3} in xy, serpentine across
columns, z sorted within each column with alternating direction so runs
crossing a column boundary stay at the same z end.  Measured against
Morton order on uniform clouds: mean tile half-extent drops from ~2.2×
to ~1.0× the ideal cube and the max/mean neighbor-count ratio from ~4×
to ~1.3× — Morton runs over random points are loose generically and
pathological at curve discontinuities, which is exactly what a STATIC
neighbor-list width cannot absorb.

Equal population (not equal volume) is the load-bearing property: rigid
multiblob bodies cluster hundreds of blobs at body scale, which
overflows any affordable per-cell capacity, while tile population is
data-independent by construction — dense regions simply produce
spatially smaller tiles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TILE = 32


def column_width(n: int, volume_est) -> float:
    """Column side h ≈ (V·TILE/N)^{1/3} — cubes of ~TILE blobs at uniform
    density.  volume_est may be a traced scalar (open-domain bbox)."""
    return jnp.maximum(
        (volume_est * TILE / max(n, 1)) ** (1.0 / 3.0), 1e-6)


def serpentine_order(x, h):
    """Sorting permutation (N,) for tight equal-population tiles.

    x: (N, 3) positions (pre-folded for periodic domains); h: column
    side (static or traced scalar — it only shapes the sort key).
    """
    h = jnp.asarray(h, x.dtype)
    lo = jnp.min(x, axis=0)
    cx = ((x[:, 0] - lo[0]) / h).astype(jnp.int32)
    cy = ((x[:, 1] - lo[1]) / h).astype(jnp.int32)
    ymax = jnp.max(cy) + 1
    cy_s = jnp.where(cx % 2 == 0, cy, ymax - 1 - cy)
    zdir = jnp.where((cx + cy) % 2 == 0, 1.0, -1.0).astype(x.dtype)
    o1 = jnp.argsort(x[:, 2] * zdir, stable=True)
    col = cx * jnp.int32(1 << 16) + cy_s
    return o1[jnp.argsort(col[o1], stable=True)]


def cell_snake_order(ci, grid):
    """Sorting permutation (N,) following a serpentine walk over the CELL
    lattice itself (x-major, y snaked per x-slab, z snaked per column).

    For sweeps whose near/far partition is defined by cell adjacency
    (:mod:`rigid_body_light_tpu.ops.farfield`), ordering blobs by their
    cell's snake position keeps every ``TILE``-blob run inside a few
    *consecutive, face-adjacent* cells, so per-tile cell bounding boxes
    stay at extent 1–2 per dim.  Measured vs the geometry-only serpentine
    sort at the 40k bench case (cells of ~TILE blobs): max neighbor-tile
    count 135 → 54.

    ci: (N, 3) int cell indices in [0, grid); grid: static (gx, gy, gz).
    """
    gx, gy, gz = grid
    cx, cy, cz = ci[:, 0], ci[:, 1], ci[:, 2]
    cy_s = jnp.where(cx % 2 == 0, cy, gy - 1 - cy)
    colpos = cx * gy + cy_s
    cz_s = jnp.where(colpos % 2 == 0, cz, gz - 1 - cz)
    return jnp.argsort(colpos * gz + cz_s, stable=True)


def bbox_adjacency(r_pad, t, radius, box=None):
    """(t, t) bool: can any pair between two tiles be within ``radius``?

    Per-tile AABBs; distance via center deltas minus summed half-extents
    (minimum-image wrapped when ``box`` is given — valid while extents
    < L/2, which the serpentine sort guarantees off-seam).
    """
    rt = r_pad.reshape(t, TILE, 3)
    lo = jnp.min(rt, axis=1)
    hi = jnp.max(rt, axis=1)
    c = 0.5 * (lo + hi)
    e = 0.5 * (hi - lo)
    d = c[:, None, :] - c[None, :, :]
    if box is not None:
        L = jnp.asarray(box, r_pad.dtype)
        d = d - L * jnp.round(d / L)
    gap = jnp.maximum(jnp.abs(d) - (e[:, None, :] + e[None, :, :]), 0.0)
    return jnp.sum(gap * gap, axis=-1) <= jnp.asarray(
        radius, r_pad.dtype) ** 2


def pack_neighbor_lists(adj, max_nbr):
    """Pack each row's adjacent tile ids into (t, max_nbr) (-1 unused).

    Returns (nbr, overflow): overflow = some row exceeded max_nbr (the
    caller must poison its output — silent truncation would be silently
    wrong physics).
    """
    t = adj.shape[0]
    cols = jnp.arange(t, dtype=jnp.int32)
    key = jnp.where(adj, cols, t + cols)
    packed = jnp.sort(key, axis=1)[:, :max_nbr]
    overflow = jnp.any(jnp.sum(adj, axis=1) > max_nbr)
    return jnp.where(packed < t, packed, -1), overflow


def default_max_nbr(n: int, volume: float, radius: float) -> int:
    """Static neighbor-list width: 2.2× the AABB-ball estimate + 8.

    Estimate: tiles are ~cubes of side s = (V·TILE/N)^{1/3}; two tiles
    are adjacent within cutoff + the sum of their half-extents (≈ s).
    The 2.2 margin covers the measured max/mean ratio (~1.35 on uniform
    clouds) with clustering headroom; overflow still poisons loudly
    rather than truncating.
    """
    t = max(1, -(-n // TILE))
    s = (volume * TILE / max(n, 1)) ** (1.0 / 3.0)
    est = 4.19 * (radius + s) ** 3 / (volume / t)
    return int(min(t, np.ceil(2.2 * est) + 8))
