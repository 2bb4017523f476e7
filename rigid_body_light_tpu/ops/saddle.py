"""Saddle-point operator and block preconditioner, fully fused on device.

The rigid multiblob saddle system (reference operators split across
``apply_saddle`` in Python, ``Rigid.py:73-80``, and four separate C++ calls):

    [ M   −K ] [λ]   [slip]
    [ Kᵀ   0 ] [U] = [−F  ]

Here one jitted function evaluates the whole left-hand side — the reference's
per-Krylov-iteration host round-trips (4 per matvec) collapse into a single
XLA computation.

The preconditioner follows the reference exactly (``apply_PC``,
``c_rigid_obj.cpp:589-616``): approximate M⁻¹ by a per-blob diagonal
(``diag_invM``, ``:489-543``) or per-body block inverse (``Block_diag_invM``,
``:461-487``), form per-body 6×6 Ñ⁻¹ = Kᵀ M̃⁻¹ K, Cholesky-factor it
(``get_blk_diag_lu``, ``:554-567``), then

    U  = Ñ solve of (−F − Kᵀ M̃⁻¹ slip)      (B batched 6×6 cho_solve)
    λ  = m_scale · M̃⁻¹ (slip + K U)

Everything is batched over bodies with vmapped dense algebra — no sparse
matrices, no factor caching protocol (rebuilding the PC is itself a jitted
op; callers close over it per configuration).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import rpy
from rigid_body_light_tpu.state import BodyState


class GeometryOps(NamedTuple):
    """Configuration-dependent kinematic quantities (rebuilt each step).

    offsets: (B, n, 3) world-frame blob offsets from body tracking points.
    positions: (B, n, 3) world-frame blob positions.
    ktkinv: (B, 6, 6) closed-form (KᵀK)⁻¹ blocks.
    rot: (B, 3, 3) body rotation matrices R(Q).
    """

    offsets: jax.Array
    positions: jax.Array
    ktkinv: jax.Array
    rot: jax.Array

    @property
    def flat_positions(self):
        return self.positions.reshape(-1, 3)


def geometry_ops(geom: kin.RefGeometry, state: BodyState) -> GeometryOps:
    from rigid_body_light_tpu.ops import quaternion as quat

    rot = quat.to_rotation_matrix(state.Q)
    offsets = jnp.einsum("bij,kj->bki", rot, geom.ref_cfg)
    return GeometryOps(
        offsets=offsets,
        positions=offsets + state.X[:, None, :],
        ktkinv=kin.ktk_inv(geom, state.Q),
        rot=rot,
    )


def body_K_blocks(offsets) -> jax.Array:
    """Dense per-blob K blocks (B, n, 3, 6): [ I | −[r]ₓ ].

    Column layout matches the reference triplets (``c_rigid_obj.cpp:369-383``).
    """
    B, n, _ = offsets.shape
    dtype = offsets.dtype
    rx, ry, rz = offsets[..., 0], offsets[..., 1], offsets[..., 2]
    zero = jnp.zeros_like(rx)
    neg_skew = jnp.stack(
        [
            jnp.stack([zero, rz, -ry], axis=-1),
            jnp.stack([-rz, zero, rx], axis=-1),
            jnp.stack([ry, -rx, zero], axis=-1),
        ],
        axis=-2,
    )  # (B, n, 3, 3) = −[r]ₓ
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, n, 3, 3))
    return jnp.concatenate([eye, neg_skew], axis=-1)


def mobility_apply_fn(cfg: SimulationConfig, radii=None):
    """The blob-space mobility product used by saddle/PC/noise paths.

    Dispatches to the Pallas TPU kernel when enabled and available, else the
    XLA streamed matvec.  Signature: (F (N,3), r (N,3)) → (N,3), with the
    damping sandwich applied iff ``cfg.wall``.  radii: optional (N,)
    per-blob physical radii closed over the returned fn (polydisperse RPY).
    A 3-D ``cfg.box`` routes to the triply-periodic Ewald operator
    (:mod:`rigid_body_light_tpu.ops.ewald`).
    """
    if cfg.box is not None and len(cfg.box) == 3:
        return _ewald_apply_fn(cfg, radii, multi=False)
    if cfg.farfield_grid is not None:
        return _farfield_apply_fn(cfg, radii)
    if cfg.use_pallas and cfg.dtype == jnp.float32:
        try:
            from rigid_body_light_tpu.ops import rpy_pallas

            if rpy_pallas.available():
                def apply_pallas(F, r):
                    return rpy_pallas.mobility_apply(
                        F, r, a=cfg.a, eta=cfg.eta, wall=cfg.wall,
                        h_floor=cfg.wall_h_floor, box=cfg.box, radii=radii,
                        image_shells=cfg.image_shells,
                    )

                return apply_pallas
        except ImportError:
            pass

    def apply_xla(F, r):
        return rpy.mobility_apply(
            F, r, a=cfg.a, eta=cfg.eta, wall=cfg.wall,
            row_tile=cfg.matvec_row_tile, h_floor=cfg.wall_h_floor,
            box=cfg.box, radii=radii, image_shells=cfg.image_shells,
        )

    return apply_xla


def _farfield_apply_fn(cfg: SimulationConfig, radii):
    """Proxy-grid near+far mobility (ops/farfield.py) — O(N) at fixed
    density.  Handles single- and multi-RHS (the module dispatches on
    F.ndim) and per-blob radii (radius-split kernel lattices), so it
    serves both apply-fn entry points and mixtures.

    The returned callable carries ``prepare``/``prepare_geometry``
    attributes — loop hosts hoist the kernel-lattice build and the
    sort/neighbor setup out of their iterations with
    :func:`hoist_positions`; steppers share one lattice build across a
    step's position sets with :func:`pin_geometry`."""
    from rigid_body_light_tpu.ops import farfield

    grid = None if cfg.farfield_grid == "auto" else cfg.farfield_grid
    max_nbr = cfg.farfield_nbr_tiles if cfg.farfield_nbr_tiles > 0 else None
    kw = dict(a=cfg.a, eta=cfg.eta, wall=cfg.wall, grid=grid,
              p=cfg.farfield_p, max_nbr=max_nbr, h_floor=cfg.wall_h_floor,
              radii=radii, band_p=cfg.farfield_band_p)
    if cfg.box is not None:
        # pseudo-2D: doubly-periodic wall far field (cyclic xy convolution
        # with image-summed combined kernel lattices, images to depth
        # image_shells >= 1 with two-ring tail extrapolation)
        kw.update(box=cfg.box, image_shells=cfg.image_shells)

    def apply(F, r, ctx=None):
        return farfield.mobility_apply(F, r, ctx=ctx,
                                       use_pallas=cfg.use_pallas, **kw)

    apply.prepare = lambda r, geo=None: farfield.prepare(r, geo=geo, **kw)
    apply.prepare_geometry = lambda r: farfield.prepare_geometry(r, **kw)
    return apply


def hoist_positions(mob, r):
    """Bind a mobility apply-fn's position-dependent setup for fixed ``r``.

    For operators with a ``prepare`` attribute (the proxy-grid far field),
    builds the :class:`~rigid_body_light_tpu.ops.farfield.FarCtx` ONCE and
    returns a same-signature callable that reuses it — call this at Krylov
    / Lanczos loop-host entry, where the ops it emits land OUTSIDE the
    ``while`` body (XLA cannot hoist the ``lax.map``-built kernel lattices
    itself).  The returned callable assumes every call passes the SAME
    ``r`` it was bound to.  Operators without ``prepare`` (dense sweeps,
    Pallas, Ewald) are returned unchanged.
    """
    prep = getattr(mob, "prepare", None)
    if prep is None:
        return mob
    ctx = prep(r)

    def bound(F, _r_ignored, ctx2=None):
        # the bound context is only valid at the pinned ``r`` — the
        # positions argument is deliberately ignored so misuse reads as
        # misuse at the call site (see docstring contract above)
        return mob(F, _r_ignored, ctx if ctx2 is None else ctx2)

    bound.prepare = prep
    gp = getattr(mob, "prepare_geometry", None)
    if gp is not None:
        bound.prepare_geometry = gp
    return bound


def pin_geometry(mob, r):
    """Share one kernel-lattice build across a step's position sets.

    Builds the geometry tier (grid origin/cell sizes/kernel lattices) from
    ``r`` and returns a same-signature apply-fn whose ``prepare`` reuses
    it, so the stepper's sub-solves (noise at the base configuration, the
    half-kick solve, RFD's displaced applies) each rebuild only the cheap
    position structures.  Valid while every position set stays within ~a
    cell fraction of ``r`` (RFD deltas and one dt of drift are orders of
    magnitude below that).  No-op for operators without geometry.
    """
    gp = getattr(mob, "prepare_geometry", None)
    if gp is None:
        return mob
    geo = gp(r)
    base_prep = mob.prepare

    def pinned(F, r2, ctx=None):
        return mob(F, r2, base_prep(r2, geo) if ctx is None else ctx)

    pinned.prepare = lambda r2, g=None: base_prep(r2, geo if g is None
                                                  else g)
    pinned.prepare_geometry = lambda r2: geo
    return pinned


def _ewald_apply_fn(cfg: SimulationConfig, radii, multi: bool):
    from rigid_body_light_tpu.ops import ewald

    params = ewald.make_params(
        cfg.box, cfg.a, cfg.eta,
        xi=cfg.ewald_xi if cfg.ewald_xi > 0 else None, tol=cfg.ewald_tol,
        rc=cfg.ewald_rc if cfg.ewald_rc > 0 else None,
    )
    max_nbr = cfg.ewald_nbr_tiles if cfg.ewald_nbr_tiles > 0 else None
    grid = None
    if cfg.ewald_grid_p:
        from rigid_body_light_tpu.ops import ewald_pme

        grid = ewald_pme.make_grid(params, p=cfg.ewald_grid_p, radii=radii)
    # monodisperse f32: real-space sweep on the Pallas kernel (in-kernel
    # Clenshaw — same piecewise-Chebyshev fit, no VJP; see ops/ewald_pallas).
    # Balanced-splitting (rc) configs skip it: the linked-cell sweep beats
    # the all-pairs kernel once pairs are cutoff-limited.
    if (cfg.use_pallas and cfg.dtype == jnp.float32 and radii is None
            and params.rc is None):
        try:
            from rigid_body_light_tpu.ops import ewald_pallas

            if ewald_pallas.available():
                if multi:
                    def apply_multi_k(Fs, r):
                        return ewald_pallas.mobility_apply_multi(Fs, r, params)

                    return apply_multi_k

                def apply_k(F, r):
                    return ewald_pallas.mobility_apply(F, r, params)

                return apply_k
        except ImportError:
            pass
    # build the f32 polydisperse species-pair tables once per closure (radii
    # here are concrete species constants, never tracers)
    pt = (ewald.make_poly_tables(params, radii)
          if radii is not None and cfg.dtype == jnp.float32 else None)
    if multi:
        def apply_multi(Fs, r):
            return ewald.mobility_apply_multi(
                Fs, r, params, row_tile=cfg.matvec_row_tile, radii=radii,
                poly_tables=pt, max_nbr=max_nbr, grid=grid)

        return apply_multi

    def apply(F, r):
        return ewald.mobility_apply(F, r, params,
                                    row_tile=cfg.matvec_row_tile, radii=radii,
                                    poly_tables=pt, max_nbr=max_nbr,
                                    grid=grid)

    return apply


def mobility_apply_multi_fn(cfg: SimulationConfig, radii=None):
    """Multi-RHS mobility product (Fs (k,N,3), r (N,3)) → (k,N,3).

    Shares pair coefficient fields across RHS — used to fuse the stochastic
    stepper's two M^{1/2}W Lanczos recurrences into one sweep per iteration.
    """
    if cfg.box is not None and len(cfg.box) == 3:
        return _ewald_apply_fn(cfg, radii, multi=True)
    if cfg.farfield_grid is not None:
        return _farfield_apply_fn(cfg, radii)
    if cfg.use_pallas and cfg.dtype == jnp.float32:
        try:
            from rigid_body_light_tpu.ops import rpy_pallas

            if rpy_pallas.available():
                def apply_pallas(Fs, r):
                    return rpy_pallas.mobility_apply_multi(
                        Fs, r, a=cfg.a, eta=cfg.eta, wall=cfg.wall,
                        h_floor=cfg.wall_h_floor, box=cfg.box, radii=radii,
                        image_shells=cfg.image_shells,
                    )

                return apply_pallas
        except ImportError:
            pass

    def apply_xla(Fs, r):
        return rpy.mobility_apply_multi(
            Fs, r, a=cfg.a, eta=cfg.eta, wall=cfg.wall,
            row_tile=cfg.matvec_row_tile, h_floor=cfg.wall_h_floor,
            box=cfg.box, radii=radii, image_shells=cfg.image_shells,
        )

    return apply_xla


def apply_saddle(lam, U, ops: GeometryOps, cfg: SimulationConfig, mob_apply=None):
    """One saddle matvec: (λ (N,3), U (B,6)) → (Mλ − KU (N,3), Kᵀλ (B,6)).

    Collapses reference call stack §3.2 (4 host crossings + dense assembly,
    ``Rigid.py:73-80`` / ``c_rigid_obj.cpp:641-659``) into one fused op.
    """
    if mob_apply is None:
        mob_apply = mobility_apply_fn(cfg)
    B, n, _ = ops.offsets.shape
    lam_b = lam.reshape(B, n, 3)
    slip = mob_apply(lam.reshape(-1, 3), ops.flat_positions)
    slip = slip.reshape(B, n, 3) - kin.K_dot(U, ops.offsets)
    F = kin.KT_dot(lam_b, ops.offsets)
    return slip.reshape(-1, 3), F


class PCData(NamedTuple):
    """Cached preconditioner factors for one configuration.

    inv_m_diag: (N, 3, 3) per-blob inverse self mobilities (diag PC) or None.
    inv_m_block: (B, 3n, 3n) per-body inverse mobility blocks (block PC) or None.
    n_mat: (B, 6, 6) Ñ⁻¹ = Kᵀ M̃⁻¹ K blocks (solved per application by LU —
      robust to the indefiniteness the Swan–Brady correction develops for
      blobs deep below z ≈ 0.56a, where a Cholesky would NaN and poison the
      whole trajectory; the reference has the identical indefiniteness but
      Eigen's LLT fails silently instead, ``c_rigid_obj.cpp:554-567``).
    minv_ref / n_ref: rotation-frame constants of the ``block_free`` PC —
      the free-space per-body mobility inverse (3n, 3n) and body-mobility
      N̂ = (K̂ᵀ M̂⁻¹ K̂)⁻¹ (6, 6) computed ONCE in the body reference frame.
      M̂ is rotation-equivariant (free space, shared geometry), so the world-
      frame inverse is R̃ M̂⁻¹ R̃ᵀ: per-step build cost is ZERO and
      application is two rotations + one matmul.  Measured on the 10k-blob
      wall suspension: full block PC cuts GMRES 80→15 iterations but pays
      a ~0.3 s per-step dense inverse; block_free keeps most of the
      iteration win at no build cost.
    """

    inv_m_diag: Optional[jax.Array]
    inv_m_block: Optional[jax.Array]
    n_mat: Optional[jax.Array]
    minv_ref: Optional[jax.Array] = None
    n_ref: Optional[jax.Array] = None
    # --- RAS (restricted additive Schwarz) halo coupling, pc_mode="ras":
    # per-body overlapping clusters = the body's own blobs + up to H
    # other-body blobs within pc_halo·a, solved exactly via a Woodbury
    # split around the STATIC body-frame core above (A = minv_ref — zero
    # build cost), with only the body's own rows kept (RAS).  Built per
    # solve by build_pc_ras; None for the body-diagonal PC flavors.
    halo_idx: Optional[jax.Array] = None   # (B, H) global blob ids
    halo_w: Optional[jax.Array] = None     # (B, 3n, 3H)  W = A⁻¹C
    halo_sinv: Optional[jax.Array] = None  # (B, 3H, 3H)  (D − CᵀA⁻¹C)⁻¹
    n_full: Optional[jax.Array] = None     # (6B, 6B) consistent Ñ =
                                           # (Kᵀ M̃⁻¹ K)⁻¹ (dense, coupled)


# Floor (relative to the free-space 4/3 self mobility) applied to the PC's
# per-blob self blocks so the approximate M̃⁻¹ stays positive even when a
# blob sinks below the Swan–Brady validity region.  Affects ONLY the
# preconditioner (convergence), never the operator (physics).
_PC_SELF_FLOOR = 0.05


def _rot6(rot):
    """Block-diagonal 6×6 rotations diag(R, R), shape (B, 6, 6)."""
    B = rot.shape[0]
    R6 = jnp.zeros((B, 6, 6), rot.dtype)
    R6 = R6.at[:, 0:3, 0:3].set(rot)
    R6 = R6.at[:, 3:6, 3:6].set(rot)
    return R6


def grand_body_mobility(ops: GeometryOps, cfg: SimulationConfig, n_ref,
                        include_rot: bool = True) -> jax.Array:
    """Coupled (6B, 6B) far-field grand body mobility (Stokesian-dynamics
    far field): exact single-body diagonal blocks + RPY-at-Rh_eff pair
    blocks (wall-corrected trans-trans; free-space rotlet couplings when
    ``include_rot``).

    **Measured negative result (round 3, ``scripts/pc_dense_study.py``):**
    used as the U-block Ñ of the saddle preconditioner while M̃⁻¹ stays
    body-diagonal, this makes convergence dramatically WORSE (dispersed
    9→30 iters, settled 13→35): with a block-diagonal M̃ the exact Schur
    inverse is itself block-diagonal, so injecting coupling only at the
    Schur level breaks the PC's exact-inverse structure — Ñ must stay
    consistent with M̃ (the inconsistent-Ñ Neumann variant shows the same
    failure, 38 vs 15 iters).  Kept for the study harness and as the
    documented dead end; it is NOT wired into ``build_pc``.
    """
    from rigid_body_light_tpu.ops import rpy

    rot = ops.rot
    B = rot.shape[0]
    dtype = rot.dtype
    # effective hydrodynamic radius from the exact single-body mobility:
    # n_ref[:3,:3] ≈ I/(6πη·Rh_eff)
    mu_t = jnp.trace(n_ref[0:3, 0:3]) / 3.0
    rh = 1.0 / (6.0 * jnp.pi * cfg.eta * mu_t)
    X = ops.positions[:, 0, :] - ops.offsets[:, 0, :]  # (B, 3) tracking points

    # trans-trans: body-level wall-corrected RPY at radius Rh_eff
    m_tt = rpy.mobility_matrix(
        X, a=rh, eta=cfg.eta, wall=cfg.wall, h_floor=cfg.wall_h_floor,
        box=cfg.box,
    ).reshape(B, 3, B, 3)

    grand = jnp.zeros((B, 6, B, 6), dtype)
    grand = grand.at[:, 0:3, :, 0:3].set(m_tt)

    if include_rot and B > 1:
        d = (X[:, None, :] - X[None, :, :]) / rh
        box_n = None if cfg.box is None else (cfg.box[0] / rh, cfg.box[1] / rh)
        d = rpy._wrap_xy(d, box_n)
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
        rcl = jnp.maximum(r, 2.0)  # clamp at contact: 2·Rh_eff
        e = d / r[..., None]
        # normalized by rh: physical r_phys = r·rh
        g = 1.0 / (8.0 * jnp.pi * cfg.eta * (rcl * rh) ** 2)  # (B, B)
        ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
        zero = jnp.zeros_like(ex)
        skew = jnp.stack(
            [
                jnp.stack([zero, -ez, ey], axis=-1),
                jnp.stack([ez, zero, -ex], axis=-1),
                jnp.stack([-ey, ex, zero], axis=-1),
            ],
            axis=-2,
        )  # (B, B, 3, 3) = [e]ₓ
        c_ut = -g[..., None, None] * skew
        grr = 1.0 / (16.0 * jnp.pi * cfg.eta * (rcl * rh) ** 3)
        eye3 = jnp.eye(3, dtype=dtype)
        c_rr = grr[..., None, None] * (
            3.0 * e[..., :, None] * e[..., None, :] - eye3
        )
        grand = grand.at[:, 0:3, :, 3:6].set(c_ut.transpose(0, 2, 1, 3))
        grand = grand.at[:, 3:6, :, 0:3].set(c_ut.transpose(0, 2, 1, 3))
        grand = grand.at[:, 3:6, :, 3:6].set(c_rr.transpose(0, 2, 1, 3))

    # zero all diagonal blocks, then set the exact single-body mobility
    R6 = _rot6(rot)
    diag = jnp.einsum("bij,jk,blk->bil", R6, n_ref, R6)  # (B, 6, 6)
    idx = jnp.arange(B)
    grand = grand.at[idx, :, idx, :].set(diag)
    return grand.reshape(6 * B, 6 * B)


def build_pc(ops: GeometryOps, cfg: SimulationConfig) -> PCData:
    B, n, _ = ops.offsets.shape
    mode = cfg.pc_mode or ("block" if cfg.block_diag_pc else "diag")
    if mode not in ("diag", "block", "block_free", "ras"):
        raise ValueError(f"unknown pc_mode {mode!r}; use diag, block, "
                         "block_free or ras")
    if mode == "ras":
        # the STATIC tier of the RAS PC is exactly block_free (body-frame
        # constants, built once per trajectory); the configuration-dependent
        # halo coupling is attached per solve by build_pc_ras (solve_saddle
        # does this automatically when cfg.pc_mode == "ras")
        mode = "block_free"
    if mode == "block_free":
        # body-frame constants: loop-invariant under scan/jit (XLA hoists),
        # recovered from body 0's rotation so no geometry handle is needed
        ref = jnp.einsum("ji,kj->ki", ops.rot[0], ops.offsets[0])  # (n, 3)
        m_ref = rpy.mobility_matrix(ref, cfg.a, cfg.eta, wall=False)
        minv_ref = jnp.linalg.inv(m_ref)
        kb_ref = body_K_blocks(ref[None])[0].reshape(3 * n, 6)
        ninv_ref = kb_ref.T @ minv_ref @ kb_ref
        n_ref = jnp.linalg.inv(ninv_ref)
        return PCData(inv_m_diag=None, inv_m_block=None, n_mat=None,
                      minv_ref=minv_ref, n_ref=n_ref)
    Kb = body_K_blocks(ops.offsets)  # (B, n, 3, 6)
    if mode == "block":
        # per-body dense RPY of the body's own blobs (wall-corrected iff wall),
        # inverted — reference Block_diag_invM (c_rigid_obj.cpp:461-487)
        def body_inv(pos_b):
            M = rpy.mobility_matrix(
                pos_b, cfg.a, cfg.eta, cfg.wall, h_floor=cfg.wall_h_floor,
                box=cfg.box,
            )
            return jnp.linalg.inv(M)

        inv_m_block = jax.vmap(body_inv)(ops.positions)  # (B, 3n, 3n)
        Kb_flat = Kb.reshape(B, 3 * n, 6)
        ninv = jnp.einsum("bia,bij,bjc->bac", Kb_flat, inv_m_block, Kb_flat)
        pc = PCData(inv_m_diag=None, inv_m_block=inv_m_block, n_mat=ninv)
    else:
        # per-blob 3×3 self mobility (incl. wall self term), inverted —
        # reference diag_invM (c_rigid_obj.cpp:489-543).  Self blocks are
        # diagonal; floor them at a small positive value so the PC stays SPD
        # for blobs below the wall-correction validity region.
        self_blocks = rpy.self_mobility_blocks(
            ops.flat_positions, cfg.a, cfg.eta, cfg.wall,
            h_floor=cfg.wall_h_floor,
        )  # (N, 3, 3) — diagonal
        dtype = self_blocks.dtype
        floor = jnp.asarray(
            _PC_SELF_FLOOR * (4.0 / 3.0) / (8.0 * jnp.pi * cfg.eta * cfg.a), dtype
        )
        eye3 = jnp.eye(3, dtype=dtype)
        diag = jnp.maximum(jnp.diagonal(self_blocks, axis1=-2, axis2=-1), floor)
        inv_m_diag = jnp.einsum("ni,ij->nij", 1.0 / diag, eye3).reshape(B, n, 3, 3)
        ninv = jnp.einsum("bkia,bkij,bkjc->bac", Kb, inv_m_diag, Kb)
        pc = PCData(
            inv_m_diag=inv_m_diag.reshape(B * n, 3, 3),
            inv_m_block=None,
            n_mat=ninv,
        )
    return pc


# Matmul precision of RAS build/apply ingredients.  bf16-input matmuls
# (Precision.DEFAULT) were measured ~3x faster on the build's W/Ñ einsums
# but cost 2.3 extra GMRES iterations on the settled checkpoint
# (9.24 → 11.57 mean, 8.41 → 8.19 steps/s): the ~1e-3 PC error is the
# same order as the halo coupling it adds.  The PC only steers Krylov
# convergence, but here quality IS the payoff — keep f32-"highest".
_RAS_PRECISION = jax.lax.Precision.HIGHEST


def _ns_inverse(S, iters: int):
    """Batched Newton–Schulz inverse X_{k+1} = X_k(2I − S·X_k) with the
    Pan–Reif init X₀ = Sᵀ/(‖S‖₁‖S‖∞) (spectral radius of I − X₀S < 1 for
    any nonsingular S).  Pure matmuls — no LU/triangular solves, which
    run orders of magnitude below the MXU on TPU (the measured 237 ms
    block-PC trap was exactly batched LU).  Preconditioner-grade
    accuracy: quadratic convergence to ~1e-3 well within ``iters`` for
    the cluster Schur/body-mobility conditioning seen in practice; an
    under-converged inverse degrades iteration count, never correctness.
    """
    from jax import lax

    m = S.shape[-1]
    eye = jnp.eye(m, dtype=S.dtype)
    n1 = jnp.max(jnp.sum(jnp.abs(S), axis=-2), axis=-1)
    ninf = jnp.max(jnp.sum(jnp.abs(S), axis=-1), axis=-1)
    X = jnp.swapaxes(S, -1, -2) / (n1 * ninf)[..., None, None]

    def body(_, X):
        SX = jnp.matmul(S, X, precision=_RAS_PRECISION)
        return jnp.matmul(X, 2.0 * eye - SX, precision=_RAS_PRECISION)

    return lax.fori_loop(0, iters, body, X)


# Measured on the settled checkpoint (scripts/tpu_settled_variants.py,
# *_ns variant): 14/18 reproduces 30/40's iteration counts and residuals
# exactly (9.18 vs 9.19 mean iters) at ~3 ms/step less build time —
# Newton-Schulz is quadratic, and preconditioner-grade accuracy arrives
# well before the old conservative counts.
_NS_ITERS_S = 14      # halo Schur inverses (B, 3H, 3H)
_NS_ITERS_N = 18      # coupled body matrix (6B, 6B)


def _ras_core_apply(minv_ref, rot, v):
    """Static body-frame core A⁻¹·v = R̃ M̂⁻¹ R̃ᵀ v; v (..., B, n, 3)."""
    B, n = v.shape[-3], v.shape[-2]
    v_body = jnp.einsum("bji,...bnj->...bni", rot, v)
    v_body = v_body.reshape(*v.shape[:-3], B, 3 * n)
    w = jnp.einsum("pq,...bq->...bp", minv_ref, v_body,
                   precision=_RAS_PRECISION)
    w = w.reshape(*v.shape[:-3], B, n, 3)
    return jnp.einsum("bij,...bnj->...bni", rot, w)


def _ras_apply(v, minv_ref, rot, halo_idx, W, S_inv, v_full=None):
    """RAS M̃⁻¹·v: per-body Woodbury solve of [[A, C], [Cᵀ, D]], own rows
    kept.  v (..., N, 3) → (..., N, 3); all cluster algebra is batched
    matmuls (MXU).

    v_full: array the (global) ``halo_idx`` indexes into — defaults to
    ``v`` itself; the distributed PC passes the all-gathered blob vector
    while ``v`` stays the local body shard.
    """
    if v_full is None:
        v_full = v
    B, H = halo_idx.shape
    N = v.shape[-2]
    n = N // B
    lead = v.shape[:-2]
    v1 = v.reshape(*lead, B, n, 3)
    y_core = _ras_core_apply(minv_ref, rot, v1)            # A⁻¹ v1
    v2 = v_full[..., halo_idx.reshape(-1), :].reshape(
        *lead, B, 3 * H)                                   # halo values
    v1f = v1.reshape(*lead, B, 3 * n)
    t = v2 - jnp.einsum("bph,...bp->...bh", W, v1f,
                        precision=_RAS_PRECISION)          # v2 − Cᵀ A⁻¹ v1
    y2 = jnp.einsum("bhg,...bg->...bh", S_inv, t,
                    precision=_RAS_PRECISION)              # Schur solve
    y = y_core.reshape(*lead, B, 3 * n) - jnp.einsum(
        "bph,...bh->...bp", W, y2, precision=_RAS_PRECISION)
    return y.reshape(*v.shape[:-2], N, 3)


def build_pc_ras(ops: GeometryOps, cfg: SimulationConfig,
                 static_pc: PCData = None, axis_name=None) -> PCData:
    """Attach the configuration-dependent RAS halo coupling to the static
    block_free core — the settled-dense-suspension preconditioner.

    Design (measured in ``scripts/pc_schwarz_study.py``): the deep-settled
    iteration growth comes from INTER-BODY near-field coupling, which no
    body-diagonal PC captures (round-2/3 negative results), and which must
    NOT be injected by truncating the off-diagonal mobility (a sparsified
    mobility is indefinite — hard or tapered truncation ballooned 13 → 22–58
    iters).  The SPD-safe construction is overlapping clusters: per body,
    an exact solve of the PRINCIPAL SUBMATRIX of the damped wall mobility
    on {body blobs} ∪ {≤ H nearest other-body blobs within pc_halo·a},
    restricted to the body's own rows (RAS; 13 → 8–9 iters on the study
    system at halo 2–4a).

    TPU shape: the cluster solve is a Woodbury split around the STATIC
    rotation-equivariant free-space body core A (``minv_ref`` — the
    measured-equivalent stand-in for the exact wall body block, built once
    per trajectory): per solve this builds only the (3n × 3H) coupling
    W = A⁻¹C and the (3H)² Schur inverse (batched MXU matmuls + one small
    batched inverse), never a per-body (3n)² factorization — the 237 ms
    per-step dense-inverse trap of the wall block PC (BENCH_NOTES round 2)
    is avoided entirely.  Ñ is the CONSISTENT dense (6B)² body matrix
    (Kᵀ M̃⁻¹ K)⁻¹ — consistency is load-bearing (round-3 study: 15 vs 38
    iters).  Generalizes reference ``apply_PC`` (``c_rigid_obj.cpp:589-616``)
    to coupled clusters.

    Monodisperse (the mixture/polydisperse generalization lives in
    ``multi.build_pc_ras_multi`` — cross-species halos, Zuk coupling
    blocks).  Falls back to the bare static PC when B == 1 or
    pc_halo_max == 0.

    axis_name: distributed mode — ``ops`` is the LOCAL body shard inside
    ``shard_map``.  Halo clusters cross body shards, so the build
    all_gathers the blob positions and body offsets ONCE per solve (the
    same O(N)-bytes traffic class as one ring matvec), selects each local
    body's halo against the GLOBAL blob set, and builds the Woodbury
    factors for local bodies only.  The coupled consistent Ñ is assembled
    from per-device row blocks (each device applies its local RAS rows to
    all 6B K columns) and all-gathered to a replicated (6B)² matrix —
    the Newton–Schulz inverse is then redundantly replicated, which is
    cheap (6B ≪ N) and keeps ``_n_solve`` a local matvec.  The halo
    VALUES needed per application arrive via one (N, 3) all_gather in
    ``_inv_m_apply``.
    """
    B_l, n, _ = ops.offsets.shape
    if static_pc is None or static_pc.minv_ref is None:
        static_pc = build_pc(ops, cfg.replace(pc_mode="block_free"))
    from jax import lax

    D_ax = 1 if axis_name is None else lax.axis_size(axis_name)
    B = B_l * D_ax                                         # global bodies
    H = min(cfg.pc_halo_max, (B - 1) * n)
    if H <= 0 or B == 1:
        return static_pc
    pos_l = ops.flat_positions                             # (N_l, 3)
    if axis_name is None:
        pos = pos_l
        offsets_all = ops.offsets
        b0 = 0
    else:
        pos = lax.all_gather(pos_l, axis_name, tiled=True)     # (N, 3)
        offsets_all = lax.all_gather(ops.offsets, axis_name,
                                     tiled=True)               # (B, n, 3)
        b0 = lax.axis_index(axis_name) * B_l
    N = B * n
    dtype = pos.dtype

    # ---- halo selection: coarse top-2H by distance to the body center,
    # refined by exact distance to the body's nearest blob, cutoff-masked
    X = ops.positions[:, 0, :] - ops.offsets[:, 0, :]      # (B_l, 3) tracking
    body_of = jnp.repeat(jnp.arange(B), n)
    d_c = jnp.linalg.norm(pos[None, :, :] - X[:, None, :], axis=-1)
    d_c = jnp.where(body_of[None, :] == (b0 + jnp.arange(B_l))[:, None],
                    jnp.inf, d_c)                          # (B_l, N)
    K2 = min(2 * H, (B - 1) * n)
    _, cand = lax.top_k(-d_c, K2)                          # (B_l, K2)
    cand_pos = pos[cand.reshape(-1)].reshape(B_l, K2, 3)
    d_exact = jnp.min(jnp.linalg.norm(
        ops.positions[:, :, None, :] - cand_pos[:, None, :, :], axis=-1),
        axis=1)                                            # (B_l, K2)
    neg_d, sel = lax.top_k(-d_exact, H)
    halo_idx = jnp.take_along_axis(cand, sel, axis=1)      # (B_l, H) global
    mask = (-neg_d) < jnp.asarray(cfg.pc_halo * cfg.a, dtype)  # (B_l, H)
    halo_pos = pos[halo_idx.reshape(-1)].reshape(B_l, H, 3)

    # ---- coupling C (B, 3n, 3H) and halo block D (B, 3H, 3H): exact
    # damped wall pair blocks of the OPERATOR (masked columns → zero, so
    # an empty halo reduces the PC to block_free exactly)
    wall = cfg.wall
    mf = mask.astype(dtype)
    Cb = rpy.cross_mobility_blocks(ops.positions, halo_pos, cfg.a, cfg.eta,
                                   wall=wall, h_floor=cfg.wall_h_floor)
    Db = rpy.cross_mobility_blocks(halo_pos, halo_pos, cfg.a, cfg.eta,
                                   wall=wall, h_floor=cfg.wall_h_floor)
    if wall:
        b_all = rpy.damping_factors(pos, cfg.a)            # (N,) global
        b_body = rpy.damping_factors(pos_l, cfg.a).reshape(B_l, n)
        b_halo = b_all[halo_idx.reshape(-1)].reshape(B_l, H)
        Cb = Cb * (b_body[:, :, None] * b_halo[:, None, :])[..., None, None]
        Db = Db * (b_halo[:, :, None] * b_halo[:, None, :])[..., None, None]
    Cb = Cb * mf[:, None, :, None, None]
    Db = Db * (mf[:, :, None] * mf[:, None, :])[..., None, None]
    # halo self blocks (incl. wall self term and damping²); ghost slots
    # get an identity diagonal so the Schur block stays invertible
    selfb = rpy.self_mobility_blocks(
        halo_pos.reshape(-1, 3), cfg.a, cfg.eta, wall,
        h_floor=cfg.wall_h_floor).reshape(B_l, H, 3, 3)
    if wall:
        selfb = selfb * (b_halo * b_halo)[:, :, None, None]
    eye3 = jnp.eye(3, dtype=dtype)
    diag_blocks = jnp.where(mask[:, :, None, None], selfb, eye3)
    hh = jnp.arange(H)
    Db = Db.at[:, hh, hh].set(diag_blocks)
    C = Cb.transpose(0, 1, 3, 2, 4).reshape(B_l, 3 * n, 3 * H)
    D = Db.transpose(0, 1, 3, 2, 4).reshape(B_l, 3 * H, 3 * H)

    # ---- Woodbury factors: W = A⁻¹C (A = rotated static body core), and
    # the Schur inverse (D − CᵀW)⁻¹ — identity on ghost slots by the
    # masking above
    minv_ref, rot = static_pc.minv_ref, ops.rot
    W = _ras_core_apply(
        minv_ref, rot, C.reshape(B_l, n, 3, 3 * H).transpose(3, 0, 1, 2)
    ).transpose(1, 2, 3, 0).reshape(B_l, 3 * n, 3 * H)
    S = D - jnp.einsum("bph,bpg->bhg", C, W, precision=_RAS_PRECISION)
    S_inv = _ns_inverse(S, _NS_ITERS_S)

    # ---- consistent coupled Ñ = (Kᵀ M̃⁻¹ K)⁻¹, built by applying the RAS
    # inverse to all 6B K columns.  One batched apply when the column
    # block fits comfortably (a sequential lax.map over bodies is
    # latency-bound on TPU — 2B tiny dispatches); chunked otherwise.
    # Distributed: every device holds the full (6B, N, 3) K columns
    # (reconstructed from the gathered offsets — no extra traffic),
    # applies its LOCAL RAS rows, and the row blocks all_gather into the
    # replicated (6B)² matrix.
    Kb = body_K_blocks(ops.offsets)                        # (B_l, n, 3, 6)
    Kb_all = Kb if axis_name is None else body_K_blocks(offsets_all)
    cols_bytes = 6 * B * N * 3 * 4

    def local_rows(cols):
        """cols (c, N, 3) global K columns → (c, B_l, 6) = Kᵀ(M̃⁻¹cols)
        rows of the LOCAL bodies."""
        cols_l = (cols if axis_name is None else
                  lax.dynamic_slice_in_dim(cols, b0 * n, B_l * n, axis=1))
        y = _ras_apply(cols_l, minv_ref, rot, halo_idx, W, S_inv,
                       v_full=cols)
        return jnp.einsum("bnif,cbni->cbf", Kb,
                          y.reshape(-1, B_l, n, 3),
                          precision=_RAS_PRECISION)

    if cols_bytes <= 256 * 2**20:
        arr = jnp.zeros((B, 6, B, n, 3), dtype)
        idx = jnp.arange(B)
        arr = arr.at[idx, :, idx].set(Kb_all.transpose(0, 3, 1, 2))
        ninv = local_rows(arr.reshape(6 * B, N, 3))        # (6B, B_l, 6)
        if axis_name is not None:
            ninv = lax.all_gather(ninv, axis_name, axis=1, tiled=True)
        ninv = ninv.reshape(6 * B, 6 * B).T                # [p,q]=KₚᵀM̃⁻¹K_q
    else:
        def n_cols(j):
            cols = jnp.zeros((6, N, 3), dtype)
            cols = lax.dynamic_update_slice(
                cols, Kb_all[j].transpose(2, 0, 1), (0, j * n, 0))
            # (6, N, 3) → Kᵀy → (6, B_l, 6): rows p = (body, comp)
            return local_rows(cols)

        ninv = lax.map(n_cols, jnp.arange(B))              # (B, 6, B_l, 6)
        if axis_name is not None:
            ninv = lax.all_gather(ninv, axis_name, axis=2, tiled=True)
        ninv = ninv.reshape(6 * B, 6 * B).T
    n_full = _ns_inverse(ninv, _NS_ITERS_N)
    return static_pc._replace(halo_idx=halo_idx, halo_w=W, halo_sinv=S_inv,
                              n_full=n_full)


def _inv_m_apply(pc: PCData, v, ops: GeometryOps, axis_name=None):
    """M̃⁻¹ · v for any PC flavor; v, result (B, n, 3) — the LOCAL body
    shard in distributed (axis_name) mode, where the RAS flavor
    all_gathers the blob vector once to read its halo values."""
    B, n, _ = v.shape
    if pc.halo_w is not None:
        from jax import lax

        v_flat = v.reshape(B * n, 3)
        v_full = (v_flat if axis_name is None else
                  lax.all_gather(v_flat, axis_name, tiled=True))
        return _ras_apply(v_flat, pc.minv_ref, ops.rot,
                          pc.halo_idx, pc.halo_w, pc.halo_sinv,
                          v_full=v_full).reshape(B, n, 3)
    if pc.minv_ref is not None:
        v_body = jnp.einsum("bji,bnj->bni", ops.rot, v).reshape(B, 3 * n)
        w = jnp.einsum("pq,bq->bp", pc.minv_ref, v_body).reshape(B, n, 3)
        return jnp.einsum("bij,bnj->bni", ops.rot, w)
    if pc.inv_m_block is not None:
        vf = v.reshape(B, 3 * n)
        return jnp.einsum("bij,bj->bi", pc.inv_m_block, vf).reshape(B, n, 3)
    blocks = pc.inv_m_diag.reshape(B, n, 3, 3)
    return jnp.einsum("bkij,bkj->bki", blocks, v)


def _n_solve(pc: PCData, rhs, ops: GeometryOps, axis_name=None):
    """Solve Ñ⁻¹ U = rhs per body; rhs (B, 6) (local shard under
    axis_name — the RAS coupled Ñ gathers the tiny (B, 6) rhs, applies
    the replicated (6B)² matrix, and keeps the local rows)."""
    if pc.n_full is not None:
        # coupled consistent Ñ of the RAS PC: one dense (6B)² matvec
        B_l = rhs.shape[0]
        if axis_name is None:
            return (pc.n_full @ rhs.reshape(-1)).reshape(B_l, 6)
        from jax import lax

        rhs_all = lax.all_gather(rhs, axis_name, tiled=True)  # (B, 6)
        U_all = (pc.n_full @ rhs_all.reshape(-1)).reshape(-1, 6)
        b0 = lax.axis_index(axis_name) * B_l
        return lax.dynamic_slice_in_dim(U_all, b0, B_l, axis=0)
    if pc.n_ref is not None:
        f_b = jnp.einsum("bji,bj->bi", ops.rot, rhs[:, 0:3])
        t_b = jnp.einsum("bji,bj->bi", ops.rot, rhs[:, 3:6])
        u_body = jnp.einsum("pq,bq->bp", pc.n_ref,
                            jnp.concatenate([f_b, t_b], axis=-1))
        u = jnp.einsum("bij,bj->bi", ops.rot, u_body[:, 0:3])
        om = jnp.einsum("bij,bj->bi", ops.rot, u_body[:, 3:6])
        return jnp.concatenate([u, om], axis=-1)
    return jnp.linalg.solve(pc.n_mat, rhs[..., None])[..., 0]


def apply_pc(pc: PCData, slip, F, ops: GeometryOps, cfg: SimulationConfig,
             axis_name=None):
    """Apply the saddle preconditioner: (slip (N,3), F (B,6)) → (λ, U).

    Parity: reference ``apply_PC`` steady-state path
    (``c_rigid_obj.cpp:598-615``); the per-body 6×6 systems are solved by
    batched LU (see PCData docstring).  axis_name: distributed mode —
    inputs are the local body shard; only the RAS flavor communicates
    (see ``_inv_m_apply``/``_n_solve``), the body-diagonal PCs stay
    device-local.
    """
    B, n, _ = ops.offsets.shape
    slip_b = slip.reshape(B, n, 3)
    im_slip = _inv_m_apply(pc, slip_b, ops, axis_name=axis_name)
    rhs = -F - kin.KT_dot(im_slip, ops.offsets)
    U = _n_solve(pc, rhs, ops, axis_name=axis_name)
    lam = _inv_m_apply(pc, slip_b + kin.K_dot(U, ops.offsets), ops,
                       axis_name=axis_name)
    lam = jnp.asarray(cfg.m_scale, lam.dtype) * lam
    return lam.reshape(-1, 3), U
