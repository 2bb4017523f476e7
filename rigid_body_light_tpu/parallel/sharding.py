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
    use_pallas=False, h_floor=None, box=None, image_shells=0,
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
                image_shells=image_shells,
            )
        row_ids = idx * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        return rpy.pair_sum(
            r_l, row_ids, r_all, col_ids, F_all, a=a, wall=wall,
            row_tile=row_tile, box=box, image_shells=image_shells,
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
    image_shells=0,
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
                image_shells=image_shells,
            )
        else:
            row_ids = i * n_loc_r + jnp.arange(n_loc_r, dtype=jnp.int32)
            col_ids = j * n_loc_c + jnp.arange(n_loc_c, dtype=jnp.int32)
            # padded columns have F=0 → no contribution; masking via ids
            part = rpy.pair_sum(
                r_rows, row_ids, r_cols, col_ids, F_cols,
                a=a, wall=wall, row_tile=row_tile, box=box,
                image_shells=image_shells,
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
                box=cfg.box, image_shells=cfg.image_shells,
            )
        else:
            U = sharded_pair_sum(
                r, Fd, mesh, a=cfg.a, wall=cfg.wall,
                row_tile=cfg.matvec_row_tile, axis_name=axis_name,
                use_pallas=cfg.use_pallas, h_floor=cfg.wall_h_floor,
                box=cfg.box, image_shells=cfg.image_shells,
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


def ring_pair_sum_local(
    r_l, F_l, n_devices: int, axis_name: str, a=1.0, wall=False, row_tile=512,
    h_floor=None, box=None, use_pallas=False, radii_l=None,
    image_shells=0, image_tail=True,
):
    """Ring-pipelined Σ_j M_ij F_j for the LOCAL row shard (inside shard_map).

    Memory-scaling distribution: each device holds only its (N/D, 3) shard
    plus one in-flight block — no ``all_gather`` of the full arrays (the 1-D
    path's wall at large N).  The D-step ring rotates (positions, forces)
    blocks with ``ppermute`` while the current block's slab is computed —
    the ppermute for step s+1 is issued BEFORE step s's compute, so XLA's
    latency-hiding scheduler overlaps ICI transfer with the O(N²/D²) slab
    (the ring-attention pattern applied to the RPY pair sweep, SURVEY §5).

    r_l: (N_local, 3) local shard; F_l: (N_local, 3) or (k, N_local, 3)
    multi-RHS (shared pair fields).  radii_l: optional (N_local,) per-blob
    physical radii shard (polydisperse RPY) — rotates around the ring with
    the positions.  Returns matching-shape pair terms (no self term /
    scaling / damping — same contract as ``rpy.pair_sum``).

    image_shells: S ≥ 1 sums the exact doubly-periodic in-plane images of
    every pair (2-D ``box``, wall): each ring step's slab carries its own
    offset lattice (incl. i==i self-images, masked only at offset 0), and
    every global ordered pair rides exactly one ring step — so the ring
    assembles the same exact operator as the single-device image sweep.
    """
    n_l = r_l.shape[0]
    idx = lax.axis_index(axis_name)
    row_ids = idx * n_l + jnp.arange(n_l, dtype=jnp.int32)
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    if use_pallas:
        from rigid_body_light_tpu.ops import rpy_pallas

        use_pallas = rpy_pallas.available() and r_l.dtype == jnp.float32

    poly = radii_l is not None
    acc = jnp.zeros_like(F_l)
    blk_r, blk_F, blk_a = r_l, F_l, radii_l
    for s in range(n_devices):
        if s < n_devices - 1:
            nxt_r = lax.ppermute(blk_r, axis_name, perm)
            nxt_F = lax.ppermute(blk_F, axis_name, perm)
            nxt_a = lax.ppermute(blk_a, axis_name, perm) if poly else None
        src = (idx - s) % n_devices
        if use_pallas:
            from rigid_body_light_tpu.ops import rpy_pallas

            inv_a = jnp.float32(1.0 / a)
            boa = None if box is None else tuple(b / a for b in box)
            part = rpy_pallas.pair_sum_slab(
                r_l * inv_a, idx * n_l, blk_r * inv_a, blk_F, wall,
                col_offset=src * n_l, h_floor=h_floor, box_over_a=boa,
                ahat_rows=None if not poly else radii_l * inv_a,
                ahat_cols=None if not poly else blk_a * inv_a,
                image_shells=image_shells, image_tail=image_tail,
            )
        else:
            col_ids = src * n_l + jnp.arange(n_l, dtype=jnp.int32)
            part = rpy.pair_sum(
                r_l, row_ids, blk_r, col_ids, blk_F, a=a, wall=wall,
                row_tile=row_tile, box=box,
                radii_rows=radii_l, radii_cols=blk_a,
                image_shells=image_shells, image_tail=image_tail,
                **({} if h_floor is None else {"h_floor": h_floor}),
            )
        acc = acc + part
        if s < n_devices - 1:
            blk_r, blk_F = nxt_r, nxt_F
            blk_a = nxt_a
    return acc


def ring_mobility_apply_fn(cfg: SimulationConfig, n_devices: int,
                           axis_name: str = "bodies",
                           radii=None) -> Callable:
    """Local-view ``mob_apply(F_l, r_l) → U_l`` for use INSIDE ``shard_map``.

    The elementwise pieces (damping sandwich, self term, scaling) are
    per-blob-local; only the pair sweep rides the ring.  Drop-in for the
    ``mob_apply`` argument of the solver/stepper entry points when they run
    in distributed (``axis_name``) mode.  Accepts (N, 3) or multi-RHS
    (k, N, 3) — the latter shares pair fields across RHS, which the fused
    two-draw Lanczos noise path uses (``mob_multi``).
    """

    def apply(F, r):
        r = r.reshape(-1, 3)
        F = F if F.ndim == 3 else F.reshape(-1, 3)
        dtype = r.dtype
        Fd = F
        if cfg.wall:
            b = rpy.damping_factors(r, cfg.a, radii=radii)
            Fd = F * b[:, None]
        U = ring_pair_sum_local(
            r, Fd, n_devices, axis_name, a=cfg.a, wall=cfg.wall,
            row_tile=cfg.matvec_row_tile, h_floor=cfg.wall_h_floor,
            box=cfg.box, use_pallas=cfg.use_pallas, radii_l=radii,
            image_shells=cfg.image_shells,
        )
        self_diag = jnp.full(r.shape, 4.0 / 3.0, dtype=dtype)
        if radii is not None:
            self_diag = self_diag / (jnp.asarray(radii, dtype)[:, None]
                                     / cfg.a)
        if cfg.wall:
            self_diag = self_diag + rpy.wall_self_diag(
                r[:, 2], cfg.a, dtype, h_floor=cfg.wall_h_floor, radii=radii
            )
        U = U + self_diag * Fd
        U = U * jnp.asarray(1.0 / (8.0 * jnp.pi * cfg.eta * cfg.a), dtype)
        if cfg.wall:
            U = U * b[:, None]
        return U

    return apply


def farfield_mobility_apply_local_fn(cfg: SimulationConfig, n_devices: int,
                                     axis_name: str = "bodies") -> Callable:
    """Local-view proxy-grid ``mob_apply(F_l, r_l) → U_l`` INSIDE shard_map.

    The multi-chip O(N) far field (``cfg.farfield_grid`` set): per-blob
    spread/interpolation work stays on the local shard, node moments psum,
    the kernel-lattice convolution runs replicated, and the near sweep is
    sharded by tile slices — see
    :func:`rigid_body_light_tpu.ops.farfield.mobility_apply_local`.
    Drop-in for the ``mob_apply`` argument of the distributed stepper.
    """
    from rigid_body_light_tpu.ops import farfield

    grid = None if cfg.farfield_grid == "auto" else cfg.farfield_grid
    max_nbr = cfg.farfield_nbr_tiles if cfg.farfield_nbr_tiles > 0 else None
    kw = dict(a=cfg.a, eta=cfg.eta, wall=cfg.wall, grid=grid,
              p=cfg.farfield_p, max_nbr=max_nbr, h_floor=cfg.wall_h_floor,
              band_p=cfg.farfield_band_p)
    if cfg.box is not None:
        # pseudo-2D (doubly-periodic wall) distributed far field: the
        # image-summed cyclic lattices build replicated, the near sweep
        # wraps the seam on each device's tile slice
        kw.update(box=cfg.box, image_shells=cfg.image_shells)

    def apply(F, r, ctx=None):
        return farfield.mobility_apply_local(
            F, r, n_devices, axis_name, ctx=ctx,
            use_pallas=cfg.use_pallas, **kw)

    # same hoist surface as the single-device far-field apply-fn: the
    # stepper's pin_geometry shares one kernel-lattice build across the
    # step's position sets, and solve_saddle/Lanczos bind a prepared ctx
    # once per solve via hoist_positions — now on the distributed path too
    apply.prepare = lambda r, geo=None: farfield.prepare_local(
        r, n_devices, axis_name, geo=geo, **kw)
    apply.prepare_geometry = lambda r: farfield.prepare_geometry_local(
        r, n_devices, axis_name, **kw)
    return apply


def ewald_mobility_apply_local_fn(cfg: SimulationConfig, n_devices: int,
                                  axis_name: str = "bodies",
                                  radii_l=None) -> Callable:
    """Local-view triply-periodic Ewald ``mob_apply`` INSIDE shard_map.

    Distributed exact periodic operator (3-D ``cfg.box``): screened
    real-space sweep on the ppermute ring, wave-space k-moments psum'd —
    see :func:`rigid_body_light_tpu.ops.ewald.mobility_apply_local`.
    Without this dispatch a 3-D box in distributed mode would silently
    fall back to the ring's 3-D minimum-image RPY, which is NOT the
    operator the single-device path (and the physics) uses.

    radii_l: optional (N_local,) CONCRETE per-blob radii shard
    (polydisperse mixtures; needs ``ewald_rc > 0``).  Every device holds
    the same per-species block pattern, so the f32 species-pair tables
    are built host-side from the device-major tiled global radii.
    """
    from rigid_body_light_tpu.ops import ewald

    params = ewald.make_params(
        cfg.box, cfg.a, cfg.eta,
        xi=cfg.ewald_xi if cfg.ewald_xi > 0 else None, tol=cfg.ewald_tol,
        rc=cfg.ewald_rc if cfg.ewald_rc > 0 else None,
    )

    max_nbr = cfg.ewald_nbr_tiles if cfg.ewald_nbr_tiles > 0 else None
    pt = None
    if radii_l is not None and cfg.dtype == jnp.float32:
        pt = ewald.make_poly_tables(
            params, np.tile(np.asarray(radii_l), n_devices))

    def apply(F, r):
        return ewald.mobility_apply_local(
            F, r, params, n_devices, axis_name,
            row_tile=cfg.matvec_row_tile, max_nbr=max_nbr,
            radii_l=radii_l, poly_tables=pt,
        )

    return apply


def _local_mobility_fn(cfg: SimulationConfig, n_devices: int,
                       axis_name: str) -> Callable:
    """Distributed-stepper mobility dispatch: exact Ewald for 3-D periodic
    boxes, proxy-grid far field when configured, else the ring all-pairs
    sweep (open, wall, or 2-D minimum-image boxes — matching the
    single-device ``saddle.mobility_apply_fn`` routing)."""
    if cfg.box is not None and len(cfg.box) == 3:
        return ewald_mobility_apply_local_fn(cfg, n_devices, axis_name)
    if cfg.farfield_grid is not None:
        # incl. the pseudo-2D (2-D box + wall) mode — exact in-plane
        # periodicity distributes through the replicated image-summed
        # lattice + seam-wrapped sharded near sweep
        return farfield_mobility_apply_local_fn(cfg, n_devices, axis_name)
    # incl. image_shells >= 1: the ring slabs carry the exact
    # doubly-periodic image sum (see ring_pair_sum_local)
    return ring_mobility_apply_fn(cfg, n_devices, axis_name)


def make_distributed_step(geom, cfg: SimulationConfig, mesh: Mesh,
                          axis_name: str = None, deterministic: bool = False):
    """Fully-sharded BD step over a 1-D mesh: bodies sharded, NOTHING global.

    Unlike :func:`sharded_mobility_apply_fn` (which all_gathers the full
    (N, 3) arrays per matvec, so memory does not scale), every O(N) object —
    positions, forces, λ, the GMRES basis, the Lanczos basis — lives as a
    body shard; cross-device coupling is exactly the ring pair sweep plus
    scalar psums in the Krylov recurrences.  Max N therefore scales with
    the number of chips.

    Requires B % D == 0 (whole bodies per device — kinematics, PC blocks
    and commits stay device-local).  Returns
    ``step(state, key, force) → (state', StepAux)`` operating on GLOBAL
    arrays (shard_map handles the partitioning); the PRNG key is folded
    with the device index inside, so a distributed trajectory is valid but
    not bit-identical to the single-device one (deterministic=True runs
    kBT=0 steps, which ARE comparable to single-device runs directly).
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    mob_local = _local_mobility_fn(cfg, D, axis_name)

    from rigid_body_light_tpu.dynamics import stepper as stepper_mod
    from rigid_body_light_tpu.state import BodyState

    def local_step(X, Q, key, force):
        B_l = X.shape[0]
        state_l = BodyState(X=X, Q=Q)
        if deterministic:
            s2, aux = stepper_mod.deterministic_step(
                geom, cfg, state_l, force, mob_apply=mob_local,
                axis_name=axis_name,
            )
        else:
            s2, aux = stepper_mod.stochastic_step(
                geom, cfg, state_l, key, force, mob_apply=mob_local,
                axis_name=axis_name, mob_multi=mob_local,
            )
        return (s2.X, s2.Q, aux.U, aux.lam, aux.residual, aux.iters,
                jnp.zeros(()) if aux.noise_err is None else aux.noise_err)

    ax = axis_name
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P(ax)),
        out_specs=(P(ax), P(ax), P(ax), P(ax), P(), P(), P()),
        check_vma=False,
    )

    def step(state, key, force):
        B = state.X.shape[0]
        if B % D != 0:
            raise ValueError(
                f"distributed step needs n_bodies divisible by the mesh "
                f"size: B={B}, D={D}")
        X, Q, U, lam, res, iters, nerr = sharded(state.X, state.Q, key, force)
        return BodyState(X=X, Q=Q), stepper_mod.StepAux(
            U=U, lam=lam, residual=res, iters=iters, noise_err=nerr)

    return step


def make_distributed_run_bd(geom, cfg: SimulationConfig, mesh: Mesh,
                            n_steps: int, force_fn=None, slip_fn=None,
                            save_every: int = 1, axis_name: str = None):
    """Whole-trajectory distributed ``run_bd``: one ``lax.scan`` inside one
    ``shard_map`` — bodies sharded, Krylov/Lanczos bases sharded, ring pair
    sweep, per-chunk trajectory output sharded too.

    force_fn must be per-body-local (gravity, wall repulsion, traps); pair
    forces between bodies on different devices would need their own ring —
    gather body CENTERS (B, 3) yourself in a custom force_fn if needed
    (body count is tiny compared to blobs).  slip_fn (active squirmers)
    likewise: (local BodyState, step) → (N_local·n, 3) blob slip.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    mob_local = _local_mobility_fn(cfg, D, axis_name)

    from rigid_body_light_tpu.dynamics import stepper as stepper_mod
    from rigid_body_light_tpu.state import BodyState

    def local_run(X, Q, key):
        state_l = BodyState(X=X, Q=Q)
        final, traj = stepper_mod.run_bd(
            geom, cfg, state_l, key, n_steps, force_fn=force_fn,
            slip_fn=slip_fn, mob_apply=mob_local, save_every=save_every,
            axis_name=axis_name, mob_multi=mob_local,
        )
        return (final.X, final.Q, traj["X"], traj["Q"], traj["residual"],
                traj["iters"], traj["noise_err"])

    ax = axis_name
    sharded = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P()),
        out_specs=(P(ax), P(ax), P(None, ax), P(None, ax), P(), P(), P()),
        check_vma=False,
    )

    def run(state, key):
        B = state.X.shape[0]
        if B % D != 0:
            raise ValueError(
                f"distributed run needs n_bodies divisible by the mesh "
                f"size: B={B}, D={D}")
        X, Q, Xs, Qs, res, iters, nerr = sharded(state.X, state.Q, key)
        return BodyState(X=X, Q=Q), {
            "X": Xs, "Q": Qs, "residual": res, "iters": iters,
            "noise_err": nerr,
        }

    return run


def _local_mobility_multi_fn(cfg: SimulationConfig, n_devices: int,
                             axis_name: str, radii_l) -> Callable:
    """Per-domain LOCAL mixture mobility (radii_l: (N_local,) per-blob
    radii shard or None).  Same dispatch as :func:`_local_mobility_fn`;
    3-D boxes run the distributed exact polydisperse Ewald (balanced
    splitting required — the classic-split ring is monodisperse).
    """
    if cfg.box is not None and len(cfg.box) == 3:
        return ewald_mobility_apply_local_fn(cfg, n_devices, axis_name,
                                             radii_l=radii_l)
    if cfg.farfield_grid is not None:
        from rigid_body_light_tpu.ops import farfield

        grid = None if cfg.farfield_grid == "auto" else cfg.farfield_grid
        max_nbr = cfg.farfield_nbr_tiles if cfg.farfield_nbr_tiles > 0 else None
        kw = dict(a=cfg.a, eta=cfg.eta, wall=cfg.wall, grid=grid,
                  p=cfg.farfield_p, max_nbr=max_nbr,
                  h_floor=cfg.wall_h_floor, radii_l=radii_l,
                  band_p=cfg.farfield_band_p)

        def apply_ff(F, r, ctx=None):
            return farfield.mobility_apply_local(
                F, r, n_devices, axis_name, ctx=ctx, **kw)

        apply_ff.prepare = lambda r, geo=None: farfield.prepare_local(
            r, n_devices, axis_name, geo=geo, **kw)
        apply_ff.prepare_geometry = (
            lambda r: farfield.prepare_geometry_local(
                r, n_devices, axis_name, **kw))
        return apply_ff
    return ring_mobility_apply_fn(cfg, n_devices, axis_name, radii=radii_l)


def _local_radii_multi(mgeom, cfg: SimulationConfig, sizes_l, dtype):
    """Local shard of the mixture's per-blob radii (None if monodisperse)."""
    if not mgeom.is_poly():
        return None
    parts = [
        jnp.full((b * g.ref_cfg.shape[0],), a_s, dtype)
        for g, b, a_s in zip(mgeom.geoms, sizes_l, mgeom.species_a(cfg))
    ]
    return jnp.concatenate(parts)


def make_distributed_step_multi(mgeom, cfg: SimulationConfig, mesh: Mesh,
                                axis_name: str = None):
    """Fully-sharded mixture BD step: every species' bodies sharded over a
    1-D mesh (each ``B_s`` divisible by the mesh size), the concatenated
    blob space coupled by the per-domain local operator (polydisperse ring
    / sliced far field / distributed Ewald), Krylov/Lanczos recurrences
    psum'd — the mixture analogue of :func:`make_distributed_step`.

    Returns ``step(states, key, forces) → (states', MultiSolveResult)``
    on GLOBAL per-species arrays.
    """
    from rigid_body_light_tpu import multi as multi_mod
    from rigid_body_light_tpu.state import BodyState

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    ax = axis_name

    def local_step(Xs, Qs, key, forces):
        states_l = tuple(BodyState(X=x, Q=q) for x, q in zip(Xs, Qs))
        dtype = Xs[0].dtype
        sizes_l = tuple(x.shape[0] for x in Xs)
        radii_l = _local_radii_multi(mgeom, cfg, sizes_l, dtype)
        mob_local = _local_mobility_multi_fn(cfg, D, ax, radii_l)
        ss, res = multi_mod.stochastic_step_multi(
            mgeom, cfg, states_l, key, forces, mob_apply=mob_local,
            axis_name=ax, mob_multi=mob_local,
        )
        return (tuple(s.X for s in ss), tuple(s.Q for s in ss),
                res.lam, res.Us, res.residual, res.iters)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P(ax)),
        out_specs=(P(ax), P(ax), P(ax), P(ax), P(), P()),
        check_vma=False,
    )

    def step(states, key, forces):
        for s in states:
            if s.X.shape[0] % D != 0:
                raise ValueError(
                    f"distributed mixture step needs every species' body "
                    f"count divisible by the mesh size: "
                    f"B={s.X.shape[0]}, D={D}")
        Xs, Qs, lam, Us, res, iters = sharded(
            tuple(s.X for s in states), tuple(s.Q for s in states), key,
            tuple(forces))
        new_states = tuple(BodyState(X=x, Q=q) for x, q in zip(Xs, Qs))
        return new_states, multi_mod.MultiSolveResult(
            lam=lam, Us=Us, residual=res, iters=iters)

    return step


def make_distributed_run_bd_multi(mgeom, cfg: SimulationConfig, mesh: Mesh,
                                  n_steps: int, force_fn=None, slip_fn=None,
                                  save_every: int = 1,
                                  axis_name: str = None):
    """Whole distributed mixture trajectory — the multi-species analogue of
    :func:`make_distributed_run_bd`.  force_fn/slip_fn must be per-body /
    per-blob LOCAL (see that function's docstring).
    """
    from rigid_body_light_tpu import multi as multi_mod
    from rigid_body_light_tpu.state import BodyState

    if axis_name is None:
        axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    ax = axis_name

    def local_run(Xs, Qs, key):
        states_l = tuple(BodyState(X=x, Q=q) for x, q in zip(Xs, Qs))
        dtype = Xs[0].dtype
        sizes_l = tuple(x.shape[0] for x in Xs)
        radii_l = _local_radii_multi(mgeom, cfg, sizes_l, dtype)
        mob_local = _local_mobility_multi_fn(cfg, D, ax, radii_l)
        final, traj = multi_mod.run_bd_multi(
            mgeom, cfg, states_l, key, n_steps, force_fn=force_fn,
            slip_fn=slip_fn, mob_apply=mob_local, save_every=save_every,
            axis_name=ax, mob_multi=mob_local,
        )
        return (tuple(s.X for s in final), tuple(s.Q for s in final),
                traj["X"], traj["Q"], traj["residual"], traj["iters"])

    sharded = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(ax), P(ax), P()),
        out_specs=(P(ax), P(ax), P(None, ax), P(None, ax), P(), P()),
        check_vma=False,
    )

    def run(states, key):
        for s in states:
            if s.X.shape[0] % D != 0:
                raise ValueError(
                    f"distributed mixture run needs every species' body "
                    f"count divisible by the mesh size: "
                    f"B={s.X.shape[0]}, D={D}")
        Xs, Qs, tX, tQ, res, iters = sharded(
            tuple(s.X for s in states), tuple(s.Q for s in states), key)
        final = tuple(BodyState(X=x, Q=q) for x, q in zip(Xs, Qs))
        return final, {"X": tX, "Q": tQ, "residual": res, "iters": iters}

    return run
