"""In-jit state validation — the sanitizer layer.

The reference "handles" invalid states by killing the host process from
library code (blob overlap → ``exit(EXIT_FAILURE)``, ``c_rigid_obj.cpp:53-58``;
singular KᵀK → ``:313-316``) or throwing mid-assembly (below-wall,
``:95-97``).  Neither works under jit.  Here validation is split:

  - :func:`diagnose` — pure, jittable; returns scalar diagnostics (min blob
    separation, below-wall count, worst quaternion norm error) computable
    inside a scan without materializing the O(N²) distance matrix.
  - :func:`assert_valid` — host-side; raises RuntimeError with the
    reference-compatible messages.

Drivers can scan ``diagnose`` alongside the trajectory and act on flags
(e.g. abort, shrink dt) without leaving the device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class StateDiagnostics(NamedTuple):
    min_separation: jax.Array   # smallest blob-blob distance (units of a)
    n_below_wall: jax.Array     # blobs with z < 0
    max_quat_err: jax.Array     # max | |q| − 1 |


def diagnose(positions, Q, a=1.0, row_tile=512, box=None) -> StateDiagnostics:
    """Compute state diagnostics; jittable, O(tile·N) memory.

    box: optional (Lx, Ly) — measure separations through the same
    minimum-image wrap the mobility uses, so blobs coincident modulo the
    box are caught.
    """
    r = positions.reshape(-1, 3)
    n = r.shape[0]
    dtype = r.dtype
    inv_a = jnp.asarray(1.0 / a, dtype)

    tile = min(row_tile, n)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    r_pad = jnp.pad(r, ((0, n_pad - n), (0, 0)), constant_values=1e30)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def tile_min(start):
        ri = lax.dynamic_slice(r_pad, (start, jnp.int32(0)), (tile, 3))
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        d = ri[:, None, :] - r[None, :, :]
        if box is not None:
            from rigid_body_light_tpu.ops.rpy import _wrap_xy

            d = _wrap_xy(d, box)
        dist2 = jnp.sum(d * d, axis=-1)
        self_mask = ids[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
        dist2 = jnp.where(self_mask, big, dist2)
        return jnp.min(dist2)

    if n_tiles == 1:
        min_d2 = tile_min(jnp.int32(0))
    else:
        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        min_d2 = jnp.min(lax.map(tile_min, starts))
    min_sep = jnp.sqrt(min_d2) * inv_a

    n_below = jnp.sum((r[:, 2] < 0.0).astype(jnp.int32))
    qerr = jnp.max(jnp.abs(jnp.linalg.norm(Q, axis=-1) - 1.0))
    return StateDiagnostics(
        min_separation=min_sep, n_below_wall=n_below, max_quat_err=qerr
    )


def assert_valid(diag: StateDiagnostics, wall: bool = False,
                 min_separation: float = 1e-6) -> None:
    """Host-side check of diagnostics; raises the reference's error contract."""
    if float(diag.min_separation) < min_separation:
        raise RuntimeError(
            f"TWO BLOBS ARE OVERLAPPING OR TOO CLOSELY POSITIONED "
            f"(min separation {float(diag.min_separation):.3e} a)"
        )
    if wall and int(diag.n_below_wall) > 0:
        raise RuntimeError(
            "A blob has its center below the wall (z<0). Cannot compute "
            "mobility- check your configuration."
        )
    if float(diag.max_quat_err) > 1e-3:
        raise RuntimeError(
            f"Quaternions have drifted from unit norm (max err "
            f"{float(diag.max_quat_err):.3e})"
        )


def check_box_geometry(box, ref_cfg, a) -> None:
    """Raise if a periodic box is too small for the body geometry.

    Correctness bound of the minimum-image wrap: intra-body blob pair
    displacements must never wrap, i.e. body diameter (max blob-center
    distance + 2a) < min(Lx, Ly)/2 — otherwise the wrapped mobility is
    inconsistent with the (unwrapped) rigid constraint geometry K and the
    saddle solve silently returns garbage.  Eager numpy, run once at
    construction / driver setup.
    """
    if box is None:
        return
    import numpy as np

    r = np.asarray(ref_cfg).reshape(-1, 3)
    diam = 2.0 * float(a)
    if len(r) > 1:
        diam += float(
            np.sqrt(((r[:, None, :] - r[None, :, :]) ** 2).sum(-1)).max()
        )
    if diam >= min(box) / 2.0:
        raise ValueError(
            f"periodic box {tuple(box)} is too small for this body geometry: "
            f"body diameter {diam:.3f} must be < min(Lx, Ly)/2 = "
            f"{min(box) / 2.0:.3f}, or intra-body pair displacements wrap "
            "and the mobility becomes inconsistent with the rigid "
            "constraints"
        )
