"""Multi-chip distribution of the mobility matvec and the BD step.

The reference has no parallelism at all (single process, single thread —
SURVEY.md §2.5).  The TPU-native design shards the O(N²) blob-pair sweep —
the only operator that couples all blobs — row-wise across a 1-D device
mesh: each chip keeps its row tile of blobs resident, ``all_gather``s the
(N, 3) forces/positions over ICI once per matvec (O(N) bytes, vs O(N²/D)
flops of local work), and computes its rows with the same tiled kernel used
on one chip.  Everything else in a BD step (K/Kᵀ projections, 6×6 solves,
quaternion updates) is per-body-local and rides along replicated or
body-sharded under the same ``jit``.

Usage:
    mesh = make_mesh()
    mob = sharded_mobility_apply_fn(cfg, mesh)
    state, aux = jax.jit(lambda s, k, f: stochastic_step(geom, cfg, s, k, f,
                                                          mob_apply=mob))(...)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import rpy

try:  # jax>=0.4.31 moved shard_map
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


AXIS = "blobs"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_pair_sum(
    r, F, mesh: Mesh, a=1.0, wall=False, row_tile=512, axis_name=AXIS,
    use_pallas=False, h_floor=None, box=None,
):
    """Row-sharded Σ_j M_ij F_j (pair terms only) over the mesh.

    r, F: global (N, 3).  Pads N to a multiple of the mesh size; each device
    computes its padded row block against the full gathered columns — with
    the Pallas slab kernel on TPU (float32), else the XLA streamed sweep.
    """
    n = r.shape[0]
    d = mesh.shape[axis_name]
    n_pad = -(-n // d) * d
    pad = n_pad - n
    r_p = jnp.pad(r, ((0, pad), (0, 0)))
    F_p = jnp.pad(F, ((0, pad), (0, 0)))
    # padded columns carry F=0 → contribute nothing; padded rows are dropped.
    col_ids = jnp.arange(n_pad, dtype=jnp.int32)

    if use_pallas:
        from rigid_body_light_tpu.ops import rpy_pallas

        use_pallas = rpy_pallas.available() and r.dtype == jnp.float32

    def local(r_l, F_l):
        n_loc = r_l.shape[0]
        idx = lax.axis_index(axis_name)
        r_all = lax.all_gather(r_l, axis_name, tiled=True)
        F_all = lax.all_gather(F_l, axis_name, tiled=True)
        if use_pallas:
            from rigid_body_light_tpu.ops import rpy_pallas

            inv_a = jnp.float32(1.0 / a)
            boa = None if box is None else (box[0] / a, box[1] / a)
            return rpy_pallas.pair_sum_slab(
                r_l * inv_a, idx * n_loc, r_all * inv_a, F_all, wall,
                h_floor=h_floor, box_over_a=boa,
            )
        row_ids = idx * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        return rpy.pair_sum(
            r_l, row_ids, r_all, col_ids, F_all, a=a, wall=wall,
            row_tile=row_tile, box=box,
            **({} if h_floor is None else {"h_floor": h_floor}),
        )

    # check_vma=False: pallas_call's ShapeDtypeStruct carries no varying-
    # mesh-axes annotation, and jax>=0.9's shard_map rejects that under its
    # default validation — the slab kernel's output is trivially varying
    # over the row axis, which out_specs already declares
    U_p = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )(r_p, F_p)
    return U_p[:n]


def make_mesh_2d(shape, axis_names=("rows", "cols")) -> Mesh:
    """2-D device mesh, e.g. (2, 4) over 8 chips, for the SUMMA-style sweep."""
    devices = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devices, axis_names)


def sharded_pair_sum_2d(
    r, F, mesh: Mesh, a=1.0, wall=False, row_tile=512,
    axis_names=("rows", "cols"), use_pallas=False, h_floor=None, box=None,
):
    """2-D (SUMMA-style) sharded Σ_j M_ij F_j over a (Dr, Dc) mesh.

    Rows of the pair matrix are sharded over ``rows``, columns over ``cols``;
    each device computes its (N/Dr × N/Dc) slab against purely local data and
    the row sums close with one ``psum`` over the column axis — no
    ``all_gather`` of positions/forces at all.  Communication is O(N/Dr)
    per device instead of O(N), the right layout once N is large enough
    that gathering everything per matvec dominates.
    """
    ax_r, ax_c = axis_names
    n = r.shape[0]
    dr, dc = mesh.shape[ax_r], mesh.shape[ax_c]
    lcm = dr * dc // np.gcd(dr, dc)
    n_pad = -(-n // lcm) * lcm
    pad = n_pad - n
    r_p = jnp.pad(r, ((0, pad), (0, 0)))
    F_p = jnp.pad(F, ((0, pad), (0, 0)))

    n_loc_r = n_pad // dr
    n_loc_c = n_pad // dc

    if use_pallas:
        from rigid_body_light_tpu.ops import rpy_pallas

        use_pallas = rpy_pallas.available() and r.dtype == jnp.float32

    def local(r_rows, r_cols, F_cols):
        i = lax.axis_index(ax_r)
        j = lax.axis_index(ax_c)
        if use_pallas:
            from rigid_body_light_tpu.ops import rpy_pallas

            inv_a = jnp.float32(1.0 / a)
            boa = None if box is None else (box[0] / a, box[1] / a)
            part = rpy_pallas.pair_sum_slab(
                r_rows * inv_a, i * n_loc_r, r_cols * inv_a, F_cols, wall,
                col_offset=j * n_loc_c, h_floor=h_floor, box_over_a=boa,
            )
        else:
            row_ids = i * n_loc_r + jnp.arange(n_loc_r, dtype=jnp.int32)
            col_ids = j * n_loc_c + jnp.arange(n_loc_c, dtype=jnp.int32)
            # padded columns have F=0 → no contribution; masking via ids
            part = rpy.pair_sum(
                r_rows, row_ids, r_cols, col_ids, F_cols,
                a=a, wall=wall, row_tile=row_tile, box=box,
                **({} if h_floor is None else {"h_floor": h_floor}),
            )
        return lax.psum(part, ax_c)

    U_p = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax_r), P(ax_c), P(ax_c)),
        out_specs=P(ax_r),
        check_vma=False,  # see sharded_pair_sum
    )(r_p, r_p, F_p)
    return U_p[:n]


def sharded_mobility_apply_fn(
    cfg: SimulationConfig, mesh: Mesh, axis_name: str = AXIS
) -> Callable:
    """Build a drop-in ``mob_apply(F, r) → U`` whose pair sweep is sharded.

    Damping sandwich and self term are elementwise and applied outside the
    ``shard_map`` (XLA shards them for free).  Semantics identical to
    :func:`rigid_body_light_tpu.ops.rpy.mobility_apply`.
    """

    two_d = len(mesh.axis_names) == 2

    def apply(F, r):
        r = r.reshape(-1, 3)
        F = F.reshape(-1, 3)
        dtype = r.dtype
        Fd = F
        if cfg.wall:
            b = rpy.damping_factors(r, cfg.a)
            Fd = F * b[:, None]
        if two_d:
            U = sharded_pair_sum_2d(
                r, Fd, mesh, a=cfg.a, wall=cfg.wall,
                row_tile=cfg.matvec_row_tile, axis_names=mesh.axis_names,
                use_pallas=cfg.use_pallas, h_floor=cfg.wall_h_floor,
                box=cfg.box,
            )
        else:
            U = sharded_pair_sum(
                r, Fd, mesh, a=cfg.a, wall=cfg.wall,
                row_tile=cfg.matvec_row_tile, axis_name=axis_name,
                use_pallas=cfg.use_pallas, h_floor=cfg.wall_h_floor,
                box=cfg.box,
            )
        self_diag = jnp.full(r.shape, 4.0 / 3.0, dtype=dtype)
        if cfg.wall:
            self_diag = self_diag + rpy.wall_self_diag(
                r[:, 2], cfg.a, dtype, h_floor=cfg.wall_h_floor
            )
        U = U + self_diag * Fd
        U = U * jnp.asarray(1.0 / (8.0 * jnp.pi * cfg.eta * cfg.a), dtype)
        if cfg.wall:
            U = U * b[:, None]
        return U

    return apply
