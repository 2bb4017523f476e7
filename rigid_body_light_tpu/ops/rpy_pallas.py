"""Pallas TPU kernel for the matrix-free RPY pair sweep.

Replaces the XLA streamed path of :func:`rigid_body_light_tpu.ops.rpy.
mobility_apply` on TPU.  Same math (free-space RPY near/far branches +
Swan–Brady wall correction as scalar coefficient fields — see ``ops/rpy.py``
docstring), but hand-tiled:

  - packed VMEM-resident operands (8, N_pad): rows 0–2 = positions/a,
    rows 3–5 = (damped) forces, rows 6–7 zero.  Whole operands fit VMEM
    comfortably (8·N·4 B; the symmetric k=1 sweep is measured clean at
    409.6k blobs with ideal N² scaling — BENCH_NOTES.md), so every grid
    program reads its row tile and streams column tiles out of VMEM —
    zero HBM traffic in the inner loop.
  - grid over row tiles of TR=128; inner ``fori_loop`` over column tiles of
    TC=512; all pair fields are (TR, TC) f32 VPU tiles (8×128-aligned).
  - reductions along the lane (column) axis accumulate the output rows.
  - rows and columns are independent operands (rectangular slab), so the
    same kernel serves the single-chip square sweep and the ``shard_map``
    row-sharded sweep (local rows × gathered columns); a scalar row-id
    offset in SMEM keeps global self-pair masking correct.

Numerical note: this kernel is *more* accurate than the XLA path on TPU —
Mosaic lowers ``rsqrt``/division at full f32 precision, while XLA's fused
elementwise pipelines use approximate VPU reciprocals (~2e-3 relative),
which visibly floors GMRES convergence.  Measured: kernel ≈ 3e-7 relative
vs a float64 oracle, XLA path ≈ 2e-3 (BENCH_NOTES.md).

The kernel computes pair terms only (i≠j); the caller applies the self term,
1/(8πηa) scaling and the B·M·B damping sandwich — identical contract to
``rpy.pair_sum``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rigid_body_light_tpu.ops import rpy as rpy_xla

try:  # pallas import is safe everywhere; compilation is TPU-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TR = 128   # row tile (sublane-aligned multiples)
TC = 512   # column tile (lane-aligned)

# Square single-RHS sweeps use the symmetric unordered-pair kernel (each
# tile's coefficient fields computed once, applied forward + transposed).
# Measured on v5e @ 10,240 blobs: 1.15× over the ordered sweep at k=1
# (wall 4.51 vs 5.20 ms); at k=2 the doubled transpose-apply overhead
# cancels the field saving (6.29 vs 6.08 ms), so small-N k≥2 keeps the
# ordered kernel.  Flip off to force the ordered sweep everywhere.
USE_SYM = True

# Above this padded N, k≥2 square sweeps also route through the symmetric
# kernel: the ordered kernel keeps TWO packed (16, n_pad) operands + the
# output resident (~160 B/blob ≈ 16 MB at 100k blobs) and faults the TPU
# worker at ~102k blobs (observed), while the symmetric kernel's single
# operand (~96 B/blob at k=2) fits to ~170k.
_SYM_K2_MIN_NPAD = 65536

_SELF_COEF = 4.0 / 3.0
_R2_FLOOR = 1e-24


def available() -> bool:
    """True when the default backend is a TPU (incl. the 'axon' tunnel)."""
    if not _PALLAS_OK:
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


def _poly_coeffs(r2, invr, invr2, r, aR, aC):
    """Polydisperse RPY (α, β) fields — Zuk et al. 2014 branches, radii in
    units of the reference a (see ``rpy._free_coeffs_poly``)."""
    a2s = aR * aR + aC * aC
    asum = aR + aC
    adiff = aR - aC
    far = r >= asum
    deep = r < jnp.abs(adiff)
    alpha_far = (1.0 + (a2s * (1.0 / 3.0)) * invr2) * invr
    beta_far = (1.0 - a2s * invr2) * invr2 * invr
    invr3 = invr * invr2
    pref = (4.0 / 3.0) / jnp.maximum(aR * aC, _R2_FLOOR)
    g_i = (16.0 * r2 * r * asum - (adiff * adiff + 3.0 * r2) ** 2) * (
        invr3 * (1.0 / 32.0))
    g_e = 3.0 * (adiff * adiff - r2) ** 2 * (invr3 * (1.0 / 32.0))
    alpha_deep = _SELF_COEF / jnp.maximum(jnp.maximum(aR, aC), _R2_FLOOR)
    alpha = jnp.where(far, alpha_far,
                      jnp.where(deep, alpha_deep, pref * g_i))
    beta = jnp.where(far, beta_far,
                     jnp.where(deep, 0.0, pref * g_e * invr2))
    return alpha, beta


def _mono_coeffs(r, invr, invr2):
    """Monodisperse RPY (α, β) pair fields in units of a (overlap branch at
    r < 2; see ``rpy._free_coeffs``) — ONE definition shared by the
    ordered / symmetric / neighbor-tile kernels so the compiled paths
    cannot drift apart."""
    far = r >= 2.0
    alpha = jnp.where(
        far,
        (1.0 + (2.0 / 3.0) * invr2) * invr,
        _SELF_COEF * (1.0 - 0.28125 * r),
    )
    beta = jnp.where(
        far,
        (1.0 - 2.0 * invr2) * invr2 * invr,
        (_SELF_COEF * 0.09375) * invr,
    )
    return alpha, beta


def _wall_coeffs(dx, dy, zR, zC, *, h_floor, poly, aR=None, aC=None):
    """Swan–Brady wall-image coefficient fields for a (row, col) pair tile:
    returns (ex, ey, ez, f1..f5) with the image system
    C = f1·I + f2·e eᵀ + f3·z eᵀ + f4·e zᵀ + f5·z zᵀ (see
    ``rpy._pair_tile``, reference ``c_rigid_obj.cpp:105-141``).  Heights
    are floored at h_floor (units of a); polydisperse pairs evaluate in
    units of the pair-effective radius √(aᵢaⱼ) and scale back.  ONE
    definition shared by all three pair kernels."""
    if poly:
        inv_ae = jax.lax.rsqrt(jnp.maximum(aR * aC, _R2_FLOOR))
        dxw = dx * inv_ae
        dyw = dy * inv_ae
        zRs = zR * inv_ae
        zCs = zC * inv_ae
    else:
        dxw, dyw, zRs, zCs = dx, dy, zR, zC
    if h_floor > 0:
        zRw = jnp.maximum(zRs, h_floor)
        zCw = jnp.maximum(zCs, h_floor)
    else:
        zRw, zCw = zRs, zCs
    dzi = zRw + zCw
    R2 = jnp.maximum(dxw * dxw + dyw * dyw + dzi * dzi, _R2_FLOOR)
    invR = jax.lax.rsqrt(R2)
    ex = dxw * invR
    ey = dyw * invR
    ez = dzi * invR
    ez2 = ez * ez
    invR3 = invR * invR * invR
    invR5 = invR3 * invR * invR
    h_hat = zCw / jnp.maximum(dzi, 1e-12)
    hh = h_hat * (1.0 - h_hat)
    f1 = -(3.0 * (1.0 + 2.0 * hh * ez2) * invR
           + 2.0 * (1.0 - 3.0 * ez2) * invR3
           - 2.0 * (1.0 - 5.0 * ez2) * invR5) * (1.0 / 3.0)
    f2 = -(3.0 * (1.0 - 6.0 * hh * ez2) * invR
           - 6.0 * (1.0 - 5.0 * ez2) * invR3
           + 10.0 * (1.0 - 7.0 * ez2) * invR5) * (1.0 / 3.0)
    f3 = ez * (3.0 * h_hat * (1.0 - 6.0 * (1.0 - h_hat) * ez2) * invR
               - 6.0 * (1.0 - 5.0 * ez2) * invR3
               + 10.0 * (2.0 - 7.0 * ez2) * invR5) * (2.0 / 3.0)
    f4 = ez * (3.0 * h_hat * invR - 10.0 * invR5) * (2.0 / 3.0)
    f5 = -(3.0 * h_hat * h_hat * ez2 * invR
           + 3.0 * ez2 * invR3
           + (2.0 - 15.0 * ez2) * invR5) * (4.0 / 3.0)
    if poly:
        f1, f2, f3, f4, f5 = (f * inv_ae for f in (f1, f2, f3, f4, f5))
    return ex, ey, ez, f1, f2, f3, f4, f5


def _kernel(off_ref, rows_ref, cols_ref, out_ref, *, n_cols_valid: int,
            n_cols_pad: int, wall: bool, nrhs: int, h_floor: float,
            box_x: float = 0.0, box_y: float = 0.0, poly: bool = False,
            ar_row: int = 0, img_shells: int = 0, img_alpha: float = 0.0,
            img_beta: float = 0.0):
    i = pl.program_id(0)
    row_start = i * TR
    row_offset = off_ref[0]
    col_offset = off_ref[1]

    xR = rows_ref[0, pl.ds(row_start, TR)].reshape(TR, 1)
    yR = rows_ref[1, pl.ds(row_start, TR)].reshape(TR, 1)
    zR = rows_ref[2, pl.ds(row_start, TR)].reshape(TR, 1)
    row_ids = row_offset + row_start + jax.lax.broadcasted_iota(
        jnp.int32, (TR, 1), 0
    )
    aR = (rows_ref[ar_row, pl.ds(row_start, TR)].reshape(TR, 1)
          if poly else None)

    n_col_tiles = n_cols_pad // TC

    def col_tile(j, acc):
        c0 = j * TC
        xC = cols_ref[0, pl.ds(c0, TC)].reshape(1, TC)
        yC = cols_ref[1, pl.ds(c0, TC)].reshape(1, TC)
        zC = cols_ref[2, pl.ds(c0, TC)].reshape(1, TC)
        col_local = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
        col_ids = col_offset + col_local
        # pair validity: not self (compared on GLOBAL ids — row_offset /
        # col_offset place this slab in the full pair matrix), and the
        # column is a real blob (n_cols_valid bounds the LOCAL index).
        col_ok = col_local < n_cols_valid
        live = jnp.logical_and(row_ids != col_ids, col_ok)
        aC = (cols_ref[ar_row, pl.ds(c0, TC)].reshape(1, TC)
              if poly else None)

        dx0 = xR - xC
        dy0 = yR - yC
        dz = zR - zC
        if box_x > 0:
            # pseudo-periodic minimum image in the plane (units of a); the
            # wrapped dx/dy feed the wall image term below as well
            dx0 = dx0 - box_x * jnp.round(dx0 * (1.0 / box_x))
            dy0 = dy0 - box_y * jnp.round(dy0 * (1.0 / box_y))

        def pair_apply(dx, dy, mask, wt, acc):
            """Fields at displacement (dx, dy, dz) with validity mask and
            weight wt, accumulated into the row outputs.  All five wall
            coefficient fields are RHS-independent — computed once,
            applied to every RHS.  Heights floored at h_floor (the raw
            image terms diverge as h^-5 below the Swan–Brady validity
            region, see rpy.WALL_H_FLOOR); polydisperse pairs evaluate in
            pair-effective-radius units (see rpy._pair_tile)."""
            r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)
            invr = jax.lax.rsqrt(r2)
            invr2 = invr * invr
            r = r2 * invr  # = sqrt(r2), one less transcendental
            if poly:
                alpha, beta = _poly_coeffs(r2, invr, invr2, r, aR, aC)
            else:
                alpha, beta = _mono_coeffs(r, invr, invr2)
            alpha = jnp.where(mask, alpha, 0.0) * wt
            beta = jnp.where(mask, beta, 0.0) * wt

            if wall:
                ex, ey, ez, f1, f2, f3, f4, f5 = _wall_coeffs(
                    dx, dy, zR, zC, h_floor=h_floor, poly=poly, aR=aR,
                    aC=aC)
                f1 = jnp.where(mask, f1, 0.0) * wt
                f2 = jnp.where(mask, f2, 0.0) * wt
                f3 = jnp.where(mask, f3, 0.0) * wt
                f4 = jnp.where(mask, f4, 0.0) * wt
                f5 = jnp.where(mask, f5, 0.0) * wt

            new_acc = []
            for k in range(nrhs):
                ux, uy, uz = acc[3 * k], acc[3 * k + 1], acc[3 * k + 2]
                fx = cols_ref[3 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
                fy = cols_ref[4 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
                fz = cols_ref[5 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)

                dF = dx * fx + dy * fy + dz * fz
                bdF = beta * dF
                cx = alpha * fx + bdF * dx
                cy = alpha * fy + bdF * dy
                cz = alpha * fz + bdF * dz

                if wall:
                    eF = ex * fx + ey * fy + ez * fz
                    f2eF = f2 * eF
                    cx = cx + f1 * fx + f2eF * ex + f3 * fz * ex
                    cy = cy + f1 * fy + f2eF * ey + f3 * fz * ey
                    cz = (cz + f1 * fz + f2eF * ez + f3 * fz * ez
                          + f4 * eF + f5 * fz)

                new_acc.extend([
                    ux + jnp.sum(cx, axis=1, keepdims=True),
                    uy + jnp.sum(cy, axis=1, keepdims=True),
                    uz + jnp.sum(cz, axis=1, keepdims=True),
                ])
            return tuple(new_acc)

        acc = pair_apply(dx0, dy0, live, jnp.float32(1.0), acc)
        if img_shells > 0:
            # exact doubly-periodic image sum over the ordered slab: all
            # nonzero offsets of the wrapped displacement with the
            # two-ring tail weights.  Self pairs ARE kept (a blob
            # interacts with its own periodic images — only offset 0
            # masks them), matching the XLA _pair_tile convention, so the
            # ring/distributed sweep needs no separate diagonal term.
            side = 2 * img_shells + 1

            def img_body(m, acc):
                ix = m // side - img_shells
                iy = m % side - img_shells
                ring = jnp.maximum(jnp.abs(ix), jnp.abs(iy))
                wt = jnp.where(
                    ring == 0, 0.0,
                    1.0 + img_alpha * (ring == img_shells).astype(jnp.float32)
                    + img_beta * (ring == img_shells - 1).astype(jnp.float32))
                return pair_apply(dx0 + ix.astype(jnp.float32) * box_x,
                                  dy0 + iy.astype(jnp.float32) * box_y,
                                  col_ok, wt, acc)

            acc = jax.lax.fori_loop(0, side * side, img_body, acc)
        return acc

    zero = jnp.zeros((TR, 1), jnp.float32)
    acc = jax.lax.fori_loop(0, n_col_tiles, col_tile, (zero,) * (3 * nrhs))

    for k in range(nrhs):
        out_ref[3 * k + 0, :] = acc[3 * k + 0].reshape(1, TR)[0]
        out_ref[3 * k + 1, :] = acc[3 * k + 1].reshape(1, TR)[0]
        out_ref[3 * k + 2, :] = acc[3 * k + 2].reshape(1, TR)[0]
    out_ref[3 * nrhs : 8, :] = jnp.zeros((8 - 3 * nrhs, TR), jnp.float32)


def _kernel_sym(P_ref, out_ref, *, n_pad: int, wall: bool, nrhs: int,
                h_floor: float, box_x: float = 0.0, box_y: float = 0.0,
                poly: bool = False, ar_row: int = 0, img_shells: int = 0,
                img_alpha: float = 0.0, img_beta: float = 0.0):
    """Symmetric (unordered-pair) square sweep: each strict-upper tile's
    coefficient fields are computed ONCE and applied twice — forward
    (M_ij·F_j into rows i) and transposed (M_ijᵀ·F_i into columns j).

    The free-space RPY block is symmetric in its own right (α I + β d dᵀ
    with d entering quadratically), and the Swan–Brady wall block obeys
    C_ji = C_ijᵀ = f1 I + f2 e eᵀ + f3 z eᵀ + f4 e zᵀ + f5 z zᵀ — the same
    five fields with the f3/f4 roles swapped in the apply.  This cuts the
    dominant field computation from N² ordered pairs to N²/2 unordered
    ones (~1.4× fewer executed VPU ops at nrhs=1).

    Self pairs fall out for free: the strict-upper mask col>row excludes
    the diagonal.  Padded rows/columns carry zero force and live at the
    top indices, so the mask plus zero forces keep them inert (their
    outputs land in discarded slices).

    Output is one full-array VMEM accumulator revisited by every grid
    program (TPU grid programs execute sequentially, so += is race-free);
    program 0 zeroes it.
    """
    i = pl.program_id(0)
    row_start = i * TR

    xR = P_ref[0, pl.ds(row_start, TR)].reshape(TR, 1)
    yR = P_ref[1, pl.ds(row_start, TR)].reshape(TR, 1)
    zR = P_ref[2, pl.ds(row_start, TR)].reshape(TR, 1)
    row_ids = row_start + jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0)
    aR = (P_ref[ar_row, pl.ds(row_start, TR)].reshape(TR, 1)
          if poly else None)
    FR = [
        P_ref[3 + 3 * k + c, pl.ds(row_start, TR)].reshape(TR, 1)
        for k in range(nrhs) for c in range(3)
    ]

    @pl.when(i == 0)
    def _zero():
        out_ref[...] = jnp.zeros((8, n_pad), jnp.float32)

    n_col_tiles = n_pad // TC
    j_start = row_start // TC   # first column tile touching the diagonal

    def col_tile(j, acc):
        c0 = j * TC
        xC = P_ref[0, pl.ds(c0, TC)].reshape(1, TC)
        yC = P_ref[1, pl.ds(c0, TC)].reshape(1, TC)
        zC = P_ref[2, pl.ds(c0, TC)].reshape(1, TC)
        col_ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
        upper = col_ids > row_ids          # strict upper triangle only
        aC = (P_ref[ar_row, pl.ds(c0, TC)].reshape(1, TC) if poly else None)

        dx0 = xR - xC
        dy0 = yR - yC
        dz = zR - zC
        if box_x > 0:
            # minimum-image wrap is antisymmetric under i<->j, so the
            # forward + transposed application stays exact
            dx0 = dx0 - box_x * jnp.round(dx0 * (1.0 / box_x))
            dy0 = dy0 - box_y * jnp.round(dy0 * (1.0 / box_y))

        def pair_apply(dx, dy, wt, acc):
            """Fields at displacement (dx, dy, dz), weighted wt, masked to
            the strict upper triangle; forward into acc, transpose into
            out_ref columns.  wt=1 for the principal (wrapped) displacement,
            the ring-tail weight for image offsets (0 kills offset 0)."""
            r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)
            invr = jax.lax.rsqrt(r2)
            invr2 = invr * invr
            r = r2 * invr
            if poly:
                alpha, beta = _poly_coeffs(r2, invr, invr2, r, aR, aC)
            else:
                alpha, beta = _mono_coeffs(r, invr, invr2)
            alpha = jnp.where(upper, alpha, 0.0) * wt
            beta = jnp.where(upper, beta, 0.0) * wt

            if wall:
                # polydisperse: image system in pair-effective-radius units
                # — see the ordered kernel note; C_ji = C_ijT still holds
                # (the a_eff scaling is i<->j symmetric), so the transposed
                # apply below stays exact.
                ex, ey, ez, f1, f2, f3, f4, f5 = _wall_coeffs(
                    dx, dy, zR, zC, h_floor=h_floor, poly=poly, aR=aR,
                    aC=aC)
                f1 = jnp.where(upper, f1, 0.0) * wt
                f2 = jnp.where(upper, f2, 0.0) * wt
                f3 = jnp.where(upper, f3, 0.0) * wt
                f4 = jnp.where(upper, f4, 0.0) * wt
                f5 = jnp.where(upper, f5, 0.0) * wt

            new_acc = []
            for k in range(nrhs):
                ux, uy, uz = acc[3 * k], acc[3 * k + 1], acc[3 * k + 2]
                fx = P_ref[3 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
                fy = P_ref[4 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
                fz = P_ref[5 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)

                # forward: M_ij F_j accumulated into rows i
                dF = dx * fx + dy * fy + dz * fz
                bdF = beta * dF
                cx = alpha * fx + bdF * dx
                cy = alpha * fy + bdF * dy
                cz = alpha * fz + bdF * dz
                if wall:
                    eF = ex * fx + ey * fy + ez * fz
                    f2eF = f2 * eF
                    cx = cx + f1 * fx + f2eF * ex + f3 * fz * ex
                    cy = cy + f1 * fy + f2eF * ey + f3 * fz * ey
                    cz = (cz + f1 * fz + f2eF * ez + f3 * fz * ez
                          + f4 * eF + f5 * fz)
                new_acc.extend([
                    ux + jnp.sum(cx, axis=1, keepdims=True),
                    uy + jnp.sum(cy, axis=1, keepdims=True),
                    uz + jnp.sum(cz, axis=1, keepdims=True),
                ])

                # transpose: M_ijᵀ F_i accumulated into columns j (for an
                # image offset o this IS row j's image term at −o, so the
                # upper-triangle sweep covers the full ± offset lattice)
                fxR, fyR, fzR = FR[3 * k], FR[3 * k + 1], FR[3 * k + 2]
                dFr = dx * fxR + dy * fyR + dz * fzR
                bdFr = beta * dFr
                tx = alpha * fxR + bdFr * dx
                ty = alpha * fyR + bdFr * dy
                tz = alpha * fzR + bdFr * dz
                if wall:
                    eFr = ex * fxR + ey * fyR + ez * fzR
                    f2eFr = f2 * eFr
                    tx = tx + f1 * fxR + f2eFr * ex + f4 * fzR * ex
                    ty = ty + f1 * fyR + f2eFr * ey + f4 * fzR * ey
                    tz = tz + f1 * fzR + f2eFr * ez + f4 * fzR * ez \
                        + f3 * eFr + f5 * fzR
                out_ref[3 * k + 0, pl.ds(c0, TC)] += jnp.sum(tx, axis=0)
                out_ref[3 * k + 1, pl.ds(c0, TC)] += jnp.sum(ty, axis=0)
                out_ref[3 * k + 2, pl.ds(c0, TC)] += jnp.sum(tz, axis=0)
            return tuple(new_acc)

        acc = pair_apply(dx0, dy0, jnp.float32(1.0), acc)
        if img_shells > 0:
            # exact doubly-periodic image sum: every nonzero in-plane
            # lattice offset of the wrapped displacement, with the two-ring
            # Richardson tail weights folded in (rpy.tail_coeffs) — the
            # Pallas twin of the XLA _pair_tile image scan.  i==j images
            # are excluded by the upper mask and added outside the kernel
            # (rpy.self_image_sum).
            side = 2 * img_shells + 1

            def img_body(m, acc):
                ix = m // side - img_shells
                iy = m % side - img_shells
                ring = jnp.maximum(jnp.abs(ix), jnp.abs(iy))
                wt = jnp.where(
                    ring == 0, 0.0,
                    1.0 + img_alpha * (ring == img_shells).astype(jnp.float32)
                    + img_beta * (ring == img_shells - 1).astype(jnp.float32))
                return pair_apply(dx0 + ix.astype(jnp.float32) * box_x,
                                  dy0 + iy.astype(jnp.float32) * box_y,
                                  wt, acc)

            acc = jax.lax.fori_loop(0, side * side, img_body, acc)
        return acc

    zero = jnp.zeros((TR, 1), jnp.float32)
    acc = jax.lax.fori_loop(j_start, n_col_tiles, col_tile,
                            (zero,) * (3 * nrhs))
    for k in range(nrhs):
        for c in range(3):
            out_ref[3 * k + c, pl.ds(row_start, TR)] += (
                acc[3 * k + c].reshape(1, TR)[0]
            )


@functools.partial(
    jax.jit, static_argnames=("n_pad", "wall", "nrhs", "h_floor", "interpret",
                              "box_x", "box_y", "poly", "ar_row",
                              "img_shells", "img_alpha", "img_beta")
)
def _pair_sweep_sym(P, n_pad: int, wall: bool, nrhs: int = 1,
                    h_floor: float = 0.0, interpret: bool = False,
                    box_x: float = 0.0, box_y: float = 0.0,
                    poly: bool = False, ar_row: int = 0,
                    img_shells: int = 0, img_alpha: float = 0.0,
                    img_beta: float = 0.0):
    n_row_tiles = n_pad // TR
    n_img = (2 * img_shells + 1) ** 2 if img_shells else 1
    flops_per_pair = n_img * (
        (60 if wall else 25) + 2 * nrhs * (30 if wall else 15))
    kernel = functools.partial(
        _kernel_sym, n_pad=n_pad, wall=wall, nrhs=nrhs, h_floor=h_floor,
        box_x=box_x, box_y=box_y, poly=poly, ar_row=ar_row,
        img_shells=img_shells, img_alpha=img_alpha, img_beta=img_beta,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_row_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * flops_per_pair // 2,
            bytes_accessed=8 * n_pad * 4 * n_row_tiles,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(P)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cols_valid", "n_cols_pad", "n_rows_pad", "wall", "nrhs",
        "h_floor", "interpret", "box_x", "box_y", "poly", "ar_row",
        "img_shells", "img_alpha", "img_beta",
    ),
)
def _pair_sweep_packed(
    P_rows, P_cols, row_offset,
    n_cols_valid: int, n_cols_pad: int, n_rows_pad: int,
    wall: bool, nrhs: int = 1, h_floor: float = 0.0, interpret: bool = False,
    box_x: float = 0.0, box_y: float = 0.0, poly: bool = False,
    ar_row: int = 0, img_shells: int = 0, img_alpha: float = 0.0,
    img_beta: float = 0.0,
):
    n_row_tiles = n_rows_pad // TR
    n_img = (2 * img_shells + 1) ** 2 if img_shells else 1
    flops_per_pair = n_img * (
        (60 if wall else 25) + nrhs * (30 if wall else 15))
    kernel = functools.partial(
        _kernel, n_cols_valid=n_cols_valid, n_cols_pad=n_cols_pad, wall=wall,
        nrhs=nrhs, h_floor=h_floor, box_x=box_x, box_y=box_y, poly=poly,
        ar_row=ar_row, img_shells=img_shells, img_alpha=img_alpha,
        img_beta=img_beta,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_row_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_rows_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_rows_pad * n_cols_pad * flops_per_pair,
            bytes_accessed=8 * n_cols_pad * 4 * n_row_tiles,
            transcendentals=2 * n_rows_pad * n_cols_pad,
        ),
        interpret=interpret,
    )(row_offset, P_rows, P_cols)


def _pack(r_over_a, Fs, n_pad, ahat=None):
    """Pack positions + k force sets [+ radii] into (8·ceil(rows/8), n_pad).

    Layout: rows 0-2 positions/a, rows 3..3+3k-1 the k force sets, and —
    polydisperse only — row 3+3k the per-blob radii in units of a (padded
    entries 1.0 so the coefficient fields stay finite; padded columns carry
    zero force and contribute nothing regardless).
    """
    n = r_over_a.shape[0]
    k = Fs.shape[0]
    used = 3 + 3 * k + (1 if ahat is not None else 0)
    rows = 8 * (-(-used // 8))
    P = jnp.zeros((rows, n_pad), jnp.float32)
    P = P.at[0:3, :n].set(r_over_a.astype(jnp.float32).T)
    # padded column heights default to 1.0 (not 0) so the wall branch cannot
    # produce 0/0 NaNs; padded columns carry zero force so they contribute 0.
    P = P.at[2, n:].set(1.0)
    for i in range(k):
        P = P.at[3 + 3 * i : 6 + 3 * i, :n].set(Fs[i].astype(jnp.float32).T)
    if ahat is not None:
        P = P.at[3 + 3 * k, :n].set(jnp.asarray(ahat, jnp.float32))
        P = P.at[3 + 3 * k, n:].set(1.0)
    return P


def pair_sum(r_over_a, F, wall: bool, h_floor: float = None,
             interpret: bool = False, box_over_a=None, ahat=None,
             image_shells=0, image_tail=True):
    """Σ_{j≠i} M_ij F_j (unscaled, undamped pair terms).

    F: (N, 3) single RHS, or (k, N, 3) multi-RHS (k ≤ 2 on the compiled
    path) — pair coefficient fields are shared across RHS.
    r_over_a: positions already normalized by the blob radius.
    ahat: optional (N,) per-blob radii in units of a — polydisperse RPY.
    image_shells: S ≥ 1 adds the exact doubly-periodic in-plane image sum
    (incl. self-images, matching ``rpy.pair_sum``) — the in-kernel offset
    lattice with two-ring Richardson tail weights when ``image_tail``.
    """
    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    multi = F.ndim == 3
    Fk = F if multi else F[None]
    k = Fk.shape[0]
    n = r_over_a.shape[0]
    n_pad = -(-n // TC) * TC
    P = _pack(r_over_a, Fk, n_pad, ahat=ahat)
    poly = ahat is not None
    ar_row = 3 + 3 * k if poly else 0
    bx, by = (0.0, 0.0) if box_over_a is None else (
        float(box_over_a[0]), float(box_over_a[1]))
    if box_over_a is not None and (bx <= 0 or by <= 0):
        raise ValueError(f"periodic box lengths must be positive, got {box_over_a}")
    S = int(image_shells)
    if S and box_over_a is None:
        raise ValueError("image_shells needs a 2-D box_over_a")
    ia, ib = (rpy_xla.tail_coeffs(S) if (S and image_tail) else (0.0, 0.0))
    if USE_SYM and (k == 1 or n_pad >= _SYM_K2_MIN_NPAD):
        out = _pair_sweep_sym(P, n_pad, wall, k, h_floor, interpret,
                              box_x=bx, box_y=by, poly=poly, ar_row=ar_row,
                              img_shells=S, img_alpha=float(ia),
                              img_beta=float(ib))
        U = jnp.stack([out[3 * i : 3 * i + 3, :n].T for i in range(k)])
        if S:
            # the strict-upper kernel never visits i==i: add the
            # self-image diagonal (a blob interacts with its own images)
            U = U + rpy_xla.self_image_sum(
                r_over_a, Fk, wall, box_over_a, S, h_floor=h_floor,
                ahat=ahat, tail=image_tail).astype(U.dtype)
    else:
        off = jnp.zeros((2,), jnp.int32)
        out = _pair_sweep_packed(
            P, P, off, n, n_pad, n_pad, wall, k, h_floor, interpret,
            box_x=bx, box_y=by, poly=poly, ar_row=ar_row,
            img_shells=S, img_alpha=float(ia), img_beta=float(ib),
        )
        # the ordered kernel keeps self pairs at nonzero offsets — the
        # image sum arrives complete
        U = jnp.stack([out[3 * i : 3 * i + 3, :n].T for i in range(k)])
    return U if multi else U[0]


def pair_sum_slab(r_rows_over_a, row_offset, r_cols_over_a, F_cols, wall: bool,
                  n_cols_valid: int = None, col_offset=0,
                  h_floor: float = None, interpret: bool = False,
                  box_over_a=None, ahat_rows=None, ahat_cols=None,
                  image_shells=0, image_tail=True):
    """Rectangular slab sweep for the sharded paths: local rows × columns.

    row_offset / col_offset: global index of the first row / column blob —
    they place this slab inside the full pair matrix so self-pair masking
    stays correct.  The 1-D row-sharded sweep passes all columns
    (col_offset=0); the 2-D SUMMA sweep passes its local column block with
    col_offset = j·n_loc_c.  n_cols_valid bounds the LOCAL column index.
    F_cols: (N, 3) single RHS or (k, N, 3) multi-RHS (shared pair fields —
    the distributed fused 2-draw Lanczos noise path).
    image_shells: exact doubly-periodic image sum over the slab — each
    (row, col) pair contributes ALL its in-plane lattice images INCLUDING
    i == i self-images at nonzero offsets (masked only at offset 0), so a
    ring/SUMMA decomposition that visits every global ordered pair once
    assembles the exact operator with no separate diagonal term.
    """
    multi = F_cols.ndim == 3
    Fk = F_cols if multi else F_cols[None]
    k = Fk.shape[0]
    n_rows = r_rows_over_a.shape[0]
    n_cols = r_cols_over_a.shape[0]
    if n_cols_valid is None:
        n_cols_valid = n_cols
    n_rows_pad = -(-n_rows // TR) * TR
    n_cols_pad = -(-n_cols // TC) * TC
    zeros_k = jnp.zeros((k,) + r_rows_over_a.shape, r_rows_over_a.dtype)
    P_rows = _pack(r_rows_over_a, zeros_k, n_rows_pad, ahat=ahat_rows)
    P_cols = _pack(r_cols_over_a, Fk, n_cols_pad, ahat=ahat_cols)
    off = jnp.stack([
        jnp.asarray(row_offset, jnp.int32).reshape(()),
        jnp.asarray(col_offset, jnp.int32).reshape(()),
    ])
    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    bx, by = (0.0, 0.0) if box_over_a is None else (
        float(box_over_a[0]), float(box_over_a[1]))
    if box_over_a is not None and (bx <= 0 or by <= 0):
        raise ValueError(f"periodic box lengths must be positive, got {box_over_a}")
    S = int(image_shells)
    if S and box_over_a is None:
        raise ValueError("image_shells needs a 2-D box_over_a")
    ia, ib = (rpy_xla.tail_coeffs(S) if (S and image_tail) else (0.0, 0.0))
    out = _pair_sweep_packed(
        P_rows, P_cols, off, n_cols_valid, n_cols_pad, n_rows_pad, wall, k,
        h_floor, interpret, box_x=bx, box_y=by,
        poly=ahat_rows is not None, ar_row=3 + 3 * k,
        img_shells=S, img_alpha=float(ia), img_beta=float(ib),
    )
    U = jnp.stack([out[3 * i: 3 * i + 3, :n_rows].T for i in range(k)])
    return U if multi else U[0]


def mobility_apply_rows(F, r, row_start: int, row_len: int, a=1.0, eta=1.0,
                        wall=False, h_floor=None, interpret=False, box=None,
                        radii=None):
    """Rows [row_start, row_start + row_len) of :func:`mobility_apply`,
    computed WITHOUT materializing the full output or any square packing
    beyond one row slab — the streamed exact comparator for scales where
    holding the full exact sweep next to a proxy-grid context OOMs the
    chip (the ≥102k wall compare, BENCH_NOTES far-field table footnote).
    Exact same physics/normalization as ``mobility_apply`` restricted to
    the row block (damping sandwich, self term, 1/(8πηa)).  ``row_start``
    must be a static int (it offsets the self-pair masking).  Validation
    use; not differentiable.
    """
    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    F = jnp.asarray(F, jnp.float32).reshape(-1, 3)
    inv_a = jnp.float32(1.0 / a)
    ahat = None if radii is None else jnp.asarray(radii, jnp.float32) * inv_a
    rows = slice(row_start, row_start + row_len)
    rad_rows = None if radii is None else radii[rows]
    Fd = F
    if wall:
        b = rpy_xla.damping_factors(r, a, radii=radii)
        Fd = F * b[:, None]
    boa = None if box is None else (box[0] / a, box[1] / a)
    U = pair_sum_slab(
        r[rows] * inv_a, row_start, r * inv_a, Fd, wall, h_floor=h_floor,
        interpret=interpret, box_over_a=boa,
        ahat_rows=None if ahat is None else ahat[rows], ahat_cols=ahat)
    self_diag = jnp.full((row_len, 3), _SELF_COEF, jnp.float32)
    if ahat is not None:
        self_diag = self_diag / ahat[rows, None]
    if wall:
        self_diag = self_diag + rpy_xla.wall_self_diag(
            r[rows, 2], a, jnp.float32, h_floor=h_floor, radii=rad_rows)
    U = U + self_diag * Fd[rows]
    U = U * jnp.float32(1.0 / (8.0 * jnp.pi * eta * a))
    if wall:
        U = U * b[rows, None]
    return U


def mobility_apply(F, r, a=1.0, eta=1.0, wall=False, damp=None,
                   h_floor=None, interpret=False, box=None, radii=None,
                   image_shells=0, image_tail=True):
    """Drop-in for :func:`rigid_body_light_tpu.ops.rpy.mobility_apply` on TPU
    (float32): U = M·F, or B·M·B·F when ``wall``.

    Differentiable via a custom VJP (``pallas_call`` has no autodiff rule):
    the force cotangent reuses THIS kernel — the damped operator B·M·B is
    symmetric, so ∂F = B·M·B·∂U at full kernel speed and kernel accuracy
    (~3e-7 vs the XLA path's ~2e-3 on TPU); the position cotangent falls
    back to the XLA path's autodiff (∂M/∂r has no hand-written kernel).
    Force-only gradient flows — the common case in control/inverse problems
    over applied wrenches/slip — never leave the Pallas path.

    radii: optional (N,) per-blob physical radii (polydisperse RPY — see
    ``rpy._free_coeffs_poly``); treated as a non-differentiated constant
    (zero cotangent).
    """
    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    box = None if box is None else tuple(box)
    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    F = jnp.asarray(F, jnp.float32).reshape(-1, 3)
    if radii is None:
        radii = jnp.zeros((0,), jnp.float32)  # sentinel: monodisperse
    else:
        radii = jnp.asarray(radii, jnp.float32).reshape(-1)
    params = (float(a), float(eta), bool(wall), damp, float(h_floor),
              bool(interpret), box, int(image_shells), bool(image_tail))
    return _mobility_apply_diff(F, r, radii, params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mobility_apply_diff(F, r, radii, params):
    (a, eta, wall, damp, h_floor, interpret, box, image_shells,
     image_tail) = params
    return _mobility_apply_impl(F, r, a=a, eta=eta, wall=wall, damp=damp,
                                h_floor=h_floor, interpret=interpret, box=box,
                                radii=None if radii.shape[0] == 0 else radii,
                                image_shells=image_shells,
                                image_tail=image_tail)


def _mobility_diff_fwd(F, r, radii, params):
    return _mobility_apply_diff(F, r, radii, params), (F, r, radii)


def _mobility_diff_bwd(params, res, U_bar):
    (a, eta, wall, damp, h_floor, interpret, box, image_shells,
     image_tail) = params
    F, r, radii = res
    rad = None if radii.shape[0] == 0 else radii
    U_bar = jnp.asarray(U_bar, jnp.float32)
    # (B·M·B)ᵀ = B·M·B — the force cotangent is one more kernel sweep
    # (the image sum preserves the symmetry: offsets come in ± pairs)
    F_bar = _mobility_apply_impl(U_bar, r, a=a, eta=eta, wall=wall, damp=damp,
                                 h_floor=h_floor, interpret=interpret,
                                 box=box, radii=rad,
                                 image_shells=image_shells,
                                 image_tail=image_tail)
    _, pull = jax.vjp(
        lambda rr: rpy_xla.mobility_apply(
            F, rr, a=a, eta=eta, wall=wall, damp=damp, h_floor=h_floor,
            box=box, radii=rad, image_shells=image_shells,
            image_tail=image_tail),
        r,
    )
    (r_bar,) = pull(U_bar)
    return F_bar, r_bar, jnp.zeros_like(radii)


_mobility_apply_diff.defvjp(_mobility_diff_fwd, _mobility_diff_bwd)


def _mobility_apply_impl(F, r, a=1.0, eta=1.0, wall=False, damp=None,
                         h_floor=None, interpret=False, box=None, radii=None,
                         image_shells=0, image_tail=True):
    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    F = jnp.asarray(F, jnp.float32).reshape(-1, 3)
    use_damp = wall if damp is None else damp
    inv_a = jnp.float32(1.0 / a)
    ahat = None if radii is None else jnp.asarray(radii, jnp.float32) * inv_a

    Fd = F
    if use_damp:
        b = rpy_xla.damping_factors(r, a, radii=radii)
        Fd = F * b[:, None]

    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    boa = None if box is None else (box[0] / a, box[1] / a)
    U = pair_sum(r * inv_a, Fd, wall, h_floor=h_floor, interpret=interpret,
                 box_over_a=boa, ahat=ahat, image_shells=image_shells,
                 image_tail=image_tail)

    self_diag = jnp.full(r.shape, _SELF_COEF, jnp.float32)
    if radii is not None:
        self_diag = self_diag / ahat[:, None]
    if wall:
        self_diag = self_diag + rpy_xla.wall_self_diag(
            r[:, 2], a, jnp.float32, h_floor=h_floor, radii=radii
        )
    U = U + self_diag * Fd
    U = U * jnp.float32(1.0 / (8.0 * jnp.pi * eta * a))
    if use_damp:
        U = U * b[:, None]
    return U


def mobility_apply_multi(Fs, r, a=1.0, eta=1.0, wall=False, damp=None,
                         h_floor=None, interpret=False, box=None, radii=None,
                         image_shells=0, image_tail=True):
    """Multi-RHS variant: (k, N, 3) forces → (k, N, 3) velocities, sharing
    the pair coefficient fields across RHS (k ≤ 2 on the compiled path)."""
    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    Fs = jnp.asarray(Fs, jnp.float32)
    k = Fs.shape[0]
    Fs = Fs.reshape(k, -1, 3)
    use_damp = wall if damp is None else damp
    inv_a = jnp.float32(1.0 / a)
    ahat = None if radii is None else jnp.asarray(radii, jnp.float32) * inv_a

    Fd = Fs
    if use_damp:
        b = rpy_xla.damping_factors(r, a, radii=radii)
        Fd = Fs * b[None, :, None]

    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    boa = None if box is None else (box[0] / a, box[1] / a)
    U = pair_sum(r * inv_a, Fd, wall, h_floor=h_floor, interpret=interpret,
                 box_over_a=boa, ahat=ahat, image_shells=image_shells,
                 image_tail=image_tail)

    self_diag = jnp.full(r.shape, _SELF_COEF, jnp.float32)
    if radii is not None:
        self_diag = self_diag / ahat[:, None]
    if wall:
        self_diag = self_diag + rpy_xla.wall_self_diag(
            r[:, 2], a, jnp.float32, h_floor=h_floor, radii=radii
        )
    U = U + self_diag[None] * Fd
    U = U * jnp.float32(1.0 / (8.0 * jnp.pi * eta * a))
    if use_damp:
        U = U * b[None, :, None]
    return U


# ---------------------------------------------------- neighbor-tile sweep
# The proxy-grid far field's exact near part (ops/farfield._near_sweep)
# was the far-field apply's bottleneck on chip: XLA lowers its
# gather-based pair fields ~8x below this module's pair-kernel throughput
# (measured 250 ms of a 286 ms wall apply at 102.4k blobs,
# scripts/tpu_ffwall_profile.py).  This kernel runs the SAME sweep —
# sorted row tiles x their neighbor tiles, with the per-pair
# adjacent-cell mask that keeps the near/far split exact — at pair-kernel
# throughput.  The pair-field math is the SAME code as _kernel's — the
# shared _mono_coeffs/_poly_coeffs/_wall_coeffs helpers — so the three
# compiled kernels cannot drift apart.


def _kernel_nbr(t0_ref, nbr_ref, P_ref, out_ref, *, max_nbr: int,
                wall: bool, nrhs: int, h_floor: float, box_x: float,
                box_y: float, gx: float, gy: float, poly: bool,
                ar_row: int, f_row: int):
    """One row tile (TR sorted blobs) x its neighbor tiles.

    P_ref (rows, n_pad) packed: 0-2 positions/a, 3-5 cell indices (f32),
    6 live flag (1 real / 0 pad), f_row.. the k force sets, ar_row the
    radii row (poly).  nbr_ref: an (8, max_nbr) int32 block of the
    neighbor table (-1 = empty slot) — a BLOCKED SMEM input whose index
    map selects block (i + t0) // 8 of the (t_pad8, max_nbr) table and
    the kernel reads row (i + t0) % 8, so SMEM holds 8 rows per grid
    step (the whole-table scalar-prefetch layout blew v5e's 1 MiB SMEM
    at ~400-wide lists x 800 tiles; Mosaic requires the block's
    second-to-last dim divisible by 8, hence 8 rows).  Pairs are
    kept iff the CELL offset is within 1 per axis (cyclically in x/y for
    the pseudo-2D mode: gx/gy > 0) — identical partition to the XLA near
    sweep, so the far tier's near exclusion stays exact.  t0_ref:
    scalar-prefetched (1,) row-tile offset — the single-device sweep
    passes 0, the distributed sweep its device's tile-slice start
    (traced: lax.axis_index-derived).
    """
    i = pl.program_id(0) + t0_ref[0]
    nbr_row = jax.lax.rem(i, jnp.int32(8))
    row0 = i * TR
    xR = P_ref[0, pl.ds(row0, TR)].reshape(TR, 1)
    yR = P_ref[1, pl.ds(row0, TR)].reshape(TR, 1)
    zR = P_ref[2, pl.ds(row0, TR)].reshape(TR, 1)
    cxR = P_ref[3, pl.ds(row0, TR)].reshape(TR, 1)
    cyR = P_ref[4, pl.ds(row0, TR)].reshape(TR, 1)
    czR = P_ref[5, pl.ds(row0, TR)].reshape(TR, 1)
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0)
    aR = (P_ref[ar_row, pl.ds(row0, TR)].reshape(TR, 1) if poly else None)

    def slot(j, acc):
        tid = nbr_ref[nbr_row, j]
        slot_ok = tid >= 0
        c0 = jnp.maximum(tid, 0) * TR
        xC = P_ref[0, pl.ds(c0, TR)].reshape(1, TR)
        yC = P_ref[1, pl.ds(c0, TR)].reshape(1, TR)
        zC = P_ref[2, pl.ds(c0, TR)].reshape(1, TR)
        cxC = P_ref[3, pl.ds(c0, TR)].reshape(1, TR)
        cyC = P_ref[4, pl.ds(c0, TR)].reshape(1, TR)
        czC = P_ref[5, pl.ds(c0, TR)].reshape(1, TR)
        liveC = P_ref[6, pl.ds(c0, TR)].reshape(1, TR)
        col_ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, TR), 1)

        dx = xR - xC
        dy = yR - yC
        dz = zR - zC
        dcx = cxR - cxC
        dcy = cyR - cyC
        if box_x > 0:
            dx = dx - box_x * jnp.round(dx * (1.0 / box_x))
            dy = dy - box_y * jnp.round(dy * (1.0 / box_y))
            dcx = dcx - gx * jnp.round(dcx * (1.0 / gx))
            dcy = dcy - gy * jnp.round(dcy * (1.0 / gy))
        adj = jnp.logical_and(
            jnp.logical_and(jnp.abs(dcx) <= 1.5, jnp.abs(dcy) <= 1.5),
            jnp.abs(czR - czC) <= 1.5,
        )
        live = jnp.logical_and(
            jnp.logical_and(adj, liveC > 0.5),
            jnp.logical_and(row_ids != col_ids, slot_ok),
        )
        r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)
        invr = jax.lax.rsqrt(r2)
        invr2 = invr * invr
        r = r2 * invr
        if poly:
            aC = P_ref[ar_row, pl.ds(c0, TR)].reshape(1, TR)
            alpha, beta = _poly_coeffs(r2, invr, invr2, r, aR, aC)
        else:
            alpha, beta = _mono_coeffs(r, invr, invr2)
        alpha = jnp.where(live, alpha, 0.0)
        beta = jnp.where(live, beta, 0.0)

        if wall:
            ex, ey, ez, f1, f2, f3, f4, f5 = _wall_coeffs(
                dx, dy, zR, zC, h_floor=h_floor, poly=poly, aR=aR,
                aC=aC if poly else None)
            f1 = jnp.where(live, f1, 0.0)
            f2 = jnp.where(live, f2, 0.0)
            f3 = jnp.where(live, f3, 0.0)
            f4 = jnp.where(live, f4, 0.0)
            f5 = jnp.where(live, f5, 0.0)

        new_acc = []
        for k in range(nrhs):
            ux, uy, uz = acc[3 * k], acc[3 * k + 1], acc[3 * k + 2]
            fx = P_ref[f_row + 3 * k, pl.ds(c0, TR)].reshape(1, TR)
            fy = P_ref[f_row + 3 * k + 1, pl.ds(c0, TR)].reshape(1, TR)
            fz = P_ref[f_row + 3 * k + 2, pl.ds(c0, TR)].reshape(1, TR)

            dF = dx * fx + dy * fy + dz * fz
            bdF = beta * dF
            cx = alpha * fx + bdF * dx
            cy = alpha * fy + bdF * dy
            cz = alpha * fz + bdF * dz

            if wall:
                eF = ex * fx + ey * fy + ez * fz
                f2eF = f2 * eF
                cx = cx + f1 * fx + f2eF * ex + f3 * fz * ex
                cy = cy + f1 * fy + f2eF * ey + f3 * fz * ey
                cz = (cz + f1 * fz + f2eF * ez + f3 * fz * ez + f4 * eF
                      + f5 * fz)

            new_acc.extend([
                ux + jnp.sum(cx, axis=1, keepdims=True),
                uy + jnp.sum(cy, axis=1, keepdims=True),
                uz + jnp.sum(cz, axis=1, keepdims=True),
            ])
        return tuple(new_acc)

    zero = jnp.zeros((TR, 1), jnp.float32)
    acc = jax.lax.fori_loop(0, max_nbr, slot, (zero,) * (3 * nrhs))
    for k in range(nrhs):
        out_ref[3 * k + 0, :] = acc[3 * k + 0].reshape(1, TR)[0]
        out_ref[3 * k + 1, :] = acc[3 * k + 1].reshape(1, TR)[0]
        out_ref[3 * k + 2, :] = acc[3 * k + 2].reshape(1, TR)[0]
    out_ref[3 * nrhs : 8, :] = jnp.zeros((8 - 3 * nrhs, TR), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("wall", "nrhs", "h_floor", "nt", "interpret",
                     "box_x", "box_y", "gx", "gy", "poly"),
)
def _near_sweep_call(P, nbr_pad, t0, wall: bool, nrhs: int,
                     h_floor: float, nt: int, interpret: bool = False,
                     box_x: float = 0.0, box_y: float = 0.0,
                     gx: float = 0.0, gy: float = 0.0, poly: bool = False):
    n_pad = P.shape[1]
    max_nbr = nbr_pad.shape[1]
    f_row = 7
    ar_row = 7 + 3 * nrhs if poly else 0
    kernel = functools.partial(
        _kernel_nbr, max_nbr=max_nbr, wall=wall, nrhs=nrhs,
        h_floor=h_floor, box_x=box_x, box_y=box_y, gx=gx, gy=gy,
        poly=poly, ar_row=ar_row, f_row=f_row,
    )
    flops_per_pair = (60 if wall else 25) + nrhs * (30 if wall else 15)
    t = nbr_pad.shape[0]
    if t % 8:
        nbr_pad = jnp.pad(nbr_pad, ((0, 8 - t % 8), (0, 0)),
                          constant_values=-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, max_nbr),
                         lambda i, t0_ref: ((i + t0_ref[0]) // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TR), lambda i, t0_ref: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, nt * TR), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nt * TR * max_nbr * TR * flops_per_pair,
            bytes_accessed=P.shape[0] * n_pad * 4,
            transcendentals=2 * nt * TR * max_nbr * TR,
        ),
        interpret=interpret,
    )(jnp.asarray(t0, jnp.int32).reshape(1), nbr_pad, P)


# Per-block SMEM budget for one neighbor row (v5e SMEM is 1 MiB; the
# kernel streams one (1, max_nbr) int32 row per grid step — the old
# whole-table scalar prefetch hit the wall at ~1.26 MB).  Effectively
# unbounded for physical densities; the guard survives as a backstop.
_NBR_SMEM_BUDGET = 256 * 1024


def near_sweep_fits(nbr) -> bool:
    """True when the kernel's SMEM block — 8 int32 neighbor rows (the
    blocked index map streams the table 8 rows at a time) — fits the
    budget."""
    return 8 * 4 * int(nbr.shape[1]) <= _NBR_SMEM_BUDGET


def near_sweep(x_s, ci_s, live_s, Fs_s, nbr, wall: bool,
               h_floor: float = None, box_over_a=None, wrap_cells=None,
               ahat_s=None, t0=0, nt: int = None,
               interpret: bool = False):
    """Adjacent-cell pair sweep over sorted tiles — the Pallas twin of
    ``farfield._near_sweep`` (same contract: pair terms only, sorted
    order, no self/scale/damping).

    x_s (n_pad, 3) sorted padded positions in units of a; ci_s (n_pad, 3)
    cell indices; live_s (n_pad,) real-blob mask; Fs_s (k, n_pad, 3)
    sorted forces (k <= 2); nbr (t, max_nbr) neighbor-tile ids (-1 pad).
    box_over_a/wrap_cells: pseudo-2D — (Lx, Ly)/a and (gx, gy) cyclic
    cell wrap.  t0/nt: row-tile slice [t0, t0+nt) — the distributed
    sweep passes its device's (traced) slice start and static width; the
    default sweeps everything.  Returns (k, nt·TR, 3).
    """
    if h_floor is None:
        h_floor = rpy_xla.WALL_H_FLOOR
    k, n_pad = Fs_s.shape[0], Fs_s.shape[1]
    if k > 2:
        # the kernel writes 3k accumulator rows into an 8-row output
        # block — k=3 would silently truncate the last RHS
        raise ValueError(f"near_sweep supports at most 2 RHS, got k={k}")
    poly = ahat_s is not None
    used = 7 + 3 * k + (1 if poly else 0)
    rows = 8 * (-(-used // 8))
    P = jnp.zeros((rows, n_pad), jnp.float32)
    P = P.at[0:3].set(x_s.astype(jnp.float32).T)
    P = P.at[2].set(jnp.where(live_s, P[2], 1.0))  # pad heights: no 0/0
    P = P.at[3:6].set(ci_s.astype(jnp.float32).T)
    P = P.at[6].set(live_s.astype(jnp.float32))
    for i in range(k):
        P = P.at[7 + 3 * i : 10 + 3 * i].set(Fs_s[i].astype(jnp.float32).T)
    if poly:
        P = P.at[7 + 3 * k].set(
            jnp.where(live_s, jnp.asarray(ahat_s, jnp.float32), 1.0))
    bx, by = (0.0, 0.0) if box_over_a is None else (
        float(box_over_a[0]), float(box_over_a[1]))
    gx, gy = (0.0, 0.0) if wrap_cells is None else (
        float(wrap_cells[0]), float(wrap_cells[1]))
    if nt is None:
        nt = n_pad // TR
    out = _near_sweep_call(P, nbr.astype(jnp.int32), t0, wall, k, h_floor,
                           nt, interpret, box_x=bx, box_y=by, gx=gx,
                           gy=gy, poly=poly)
    return jnp.stack([out[3 * i : 3 * i + 3].T for i in range(k)])
