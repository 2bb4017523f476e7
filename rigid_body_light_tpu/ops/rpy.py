"""Rotne–Prager–Yamakawa blob mobility, free-space + Swan–Brady single wall.

Physics parity targets in the reference:
  - free-space pair/self mobility ``mobilityUFRPY`` (``c_rigid_obj.cpp:31-83``)
    with the far (r≥2a) and overlapping near (r<2a) branches,
  - finite-size single-wall correction ``mobilityUFSingleWallCorrection``
    (``c_rigid_obj.cpp:85-142``),
  - dense assembly ``rotne_prager_tensor`` (``c_rigid_obj.cpp:413-459``),
  - damped product B·M·B ``apply_M``/``make_damp_mat``
    (``c_rigid_obj.cpp:618-659``).

TPU-first design: the 3×3 pair block is never formed.  Both branches of the
pair mobility reduce to M_ij = α(r)·I + β(r)·d⊗d, and the wall correction to
C_ij = f1·I + f2·e⊗e + f3·e⊗ẑ + f4·ẑ⊗e + f5·ẑ⊗ẑ (verified numerically to
satisfy C_ji = C_ijᵀ, so evaluating every ordered pair directly reproduces
the reference's mirrored upper-triangle assembly).  The matvec therefore
streams scalar coefficient fields:

    U_i = Σ_j α F_j + β (d·F_j) d  [+ wall terms]

which is pure VPU work at O(N²) flops and O(tile·N) memory — M is never
materialized.  A dense assembler is kept for small systems and the
block-diagonal preconditioner.

All distances inside are normalized by the blob radius ``a``; outputs are
scaled by 1/(8πηa) exactly as the reference does (``c_rigid_obj.cpp:415,456``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_SELF_COEF = 4.0 / 3.0
# Default blob-height floor (units of a) for evaluating the wall correction.
# The Swan-Brady image terms diverge as h^-5 while the B(r) damping only
# decays as h^2, so the raw (reference) formulas give an INDEFINITE damped
# mobility for blobs below ~0.6a (measured min-eig -2.3e3 at h=0.02a) -
# unphysical, and fatal for M^{1/2} noise sampling.  Flooring the heights
# used in the correction at 0.75a restores positive-definiteness on every
# tested configuration and changes nothing for blobs at valid heights.
# See SimulationConfig.wall_h_floor; 0 disables (exact reference formulas).
WALL_H_FLOOR = 0.75
# r² floor used to make overlapping distinct blobs produce finite garbage
# instead of NaN inside jit (the reference kills the process instead,
# ``c_rigid_obj.cpp:53-58``; our API layer validates and raises).
_R2_FLOOR = 1e-24


def _wrap_xy(d, box_n):
    """Minimum-image wrap of displacement components x, y (units of a).

    box_n: None, or (Lx/a, Ly/a).  Pseudo-periodic boundaries in the plane
    (z stays open — the wall geometry): every pair interacts through the
    nearest periodic image only, the standard approximation of the
    production multiblob codes for wall-bounded suspensions, where the
    wall-corrected pair mobility decays like 1/r³ (image cancellation) and
    the minimum-image truncation error is small for box ≫ body size.  In
    free space the bare 1/r decay makes this much cruder — see
    ``SimulationConfig.box``.  Wrapped displacements stay antisymmetric
    under i↔j, so all symmetry-based paths (ordered mirror assembly, the
    unordered-pair Pallas kernel) remain valid.
    """
    if box_n is None:
        return d
    if any(b <= 0 for b in box_n):
        raise ValueError(f"periodic box lengths must be positive, got {box_n}")
    lx, ly = box_n[0], box_n[1]
    dx = d[..., 0]
    dy = d[..., 1]
    dz = d[..., 2]
    dx = dx - lx * jnp.round(dx / lx)
    dy = dy - ly * jnp.round(dy / ly)
    if len(box_n) == 3:
        # 3-D minimum image (used by PC blocks / pair forces when the
        # simulation box is triply periodic; the exact periodic mobility
        # itself lives in ops/ewald.py)
        lz = box_n[2]
        dz = dz - lz * jnp.round(dz / lz)
    return jnp.stack([dx, dy, dz], axis=-1)


def _free_coeffs(r2, dtype):
    """Free-space RPY pair coefficients (α, β) with M = α·I + β·d⊗d.

    d is the displacement in units of a, r2 = |d|².  Branches (r≥2, r<2)
    are evaluated via masks — no data-dependent control flow.
    """
    r2s = jnp.maximum(r2, _R2_FLOOR)
    r = jnp.sqrt(r2s)
    invr = 1.0 / r
    invr2 = 1.0 / r2s
    far = r >= 2.0
    # far field: α = (1 + 2/(3r²))/r, β = (1 − 2/r²)/r³
    alpha_far = (1.0 + (2.0 / 3.0) * invr2) * invr
    beta_far = (1.0 - 2.0 * invr2) * invr2 * invr
    # near field (r<2): α = 4/3(1 − 9r/32), β = (4/3)(3/32)/r
    alpha_near = _SELF_COEF * (1.0 - 0.28125 * r)
    beta_near = _SELF_COEF * 0.09375 * invr
    alpha = jnp.where(far, alpha_far, alpha_near).astype(dtype)
    beta = jnp.where(far, beta_far, beta_near).astype(dtype)
    return alpha, beta


def _free_coeffs_poly(r2, ai, aj, dtype):
    """Polydisperse free-space RPY coefficients (α, β), M = α·I + β·d⊗d.

    Generalization to unequal blob radii (Zuk, Wajnryb, Mizerski & Szymczak,
    J. Fluid Mech. 741 (2014) R5): distances AND radii in units of the
    reference radius ``a`` (output scaled by 1/(8πηa) as everywhere else —
    all three branches are degree−1 homogeneous so the normalization is
    exact).  ai: (..., 1) row radii, aj: (..., N) column radii, broadcast
    against r2.

      r ≥ ai+aj      : α = (1 + (ai²+aj²)/3r²)/r,  β = (1 − (ai²+aj²)/r²)/r³
      |ai−aj| ≤ r < ai+aj : the RPY overlap form with 1/(6πη·ai·aj) prefactor
      r < |ai−aj|    : the smaller blob rides inside the larger —
                       M = I/(6πη·max(ai,aj))

    Equal radii (ai=aj=1) reduces exactly to :func:`_free_coeffs`; the
    tensor is symmetric under i↔j in every branch, so the ordered-pair
    mirror assembly and the symmetric Pallas kernel remain valid.
    """
    r2s = jnp.maximum(r2, _R2_FLOOR)
    r = jnp.sqrt(r2s)
    invr = 1.0 / r
    invr2 = 1.0 / r2s
    a2s = ai * ai + aj * aj
    asum = ai + aj
    adiff = ai - aj
    far = r >= asum
    deep = r < jnp.abs(adiff)

    alpha_far = (1.0 + (a2s / 3.0) * invr2) * invr
    beta_far = (1.0 - a2s * invr2) * invr2 * invr

    # overlap branch: physical M = 1/(6πη ai aj)·[g_I·I + g_e·ê⊗ê]; with the
    # global 1/(8πηa) normalization the coefficients pick up a factor
    # 8/(6 ai aj) = (4/3)/(ai aj), and β multiplies d⊗d = r²·ê⊗ê.
    pref = (4.0 / 3.0) / jnp.maximum(ai * aj, _R2_FLOOR)
    invr3 = invr * invr2
    g_i = (16.0 * r2s * r * asum - (adiff * adiff + 3.0 * r2s) ** 2) * (
        invr3 / 32.0)
    g_e = 3.0 * (adiff * adiff - r2s) ** 2 * (invr3 / 32.0)
    alpha_near = pref * g_i
    beta_near = pref * g_e * invr2

    alpha_deep = _SELF_COEF / jnp.maximum(jnp.maximum(ai, aj), _R2_FLOOR)

    alpha = jnp.where(far, alpha_far, jnp.where(deep, alpha_deep, alpha_near))
    beta = jnp.where(far, beta_far, jnp.where(deep, 0.0, beta_near))
    return alpha.astype(dtype), beta.astype(dtype)


def _wall_coeffs(d_img, hj):
    """Swan–Brady finite-size wall correction coefficients (f1..f5).

    d_img: (..., 3) displacement from the *image* of blob j to blob i, in
      units of a — components (x_i−x_j, y_i−y_j, z_i+z_j).
    hj: (...) height of the source blob j in units of a.

    The correction block is f1·I + f2·e⊗e + f3·e⊗ẑ + f4·ẑ⊗e + f5·ẑ⊗ẑ with
    e = d_img/|d_img|.  Matches ``mobilityUFSingleWallCorrection``
    (``c_rigid_obj.cpp:105-141``).
    """
    rz = d_img[..., 2]
    # rz = z_i + z_j > 0 for any valid pair; the floor only guards transient
    # below-wall configurations (RFD displacements) against division blowup
    h_hat = hj / jnp.maximum(rz, 1e-12)
    r2 = jnp.sum(d_img * d_img, axis=-1)
    invR = lax.rsqrt(jnp.maximum(r2, _R2_FLOOR))
    ez = rz * invR
    ez2 = ez * ez
    invR3 = invR * invR * invR
    invR5 = invR3 * invR * invR
    hh = h_hat * (1.0 - h_hat)
    f1 = -(3.0 * (1.0 + 2.0 * hh * ez2) * invR
           + 2.0 * (1.0 - 3.0 * ez2) * invR3
           - 2.0 * (1.0 - 5.0 * ez2) * invR5) / 3.0
    f2 = -(3.0 * (1.0 - 6.0 * hh * ez2) * invR
           - 6.0 * (1.0 - 5.0 * ez2) * invR3
           + 10.0 * (1.0 - 7.0 * ez2) * invR5) / 3.0
    f3 = ez * (3.0 * h_hat * (1.0 - 6.0 * (1.0 - h_hat) * ez2) * invR
               - 6.0 * (1.0 - 5.0 * ez2) * invR3
               + 10.0 * (2.0 - 7.0 * ez2) * invR5) * (2.0 / 3.0)
    f4 = ez * (3.0 * h_hat * invR - 10.0 * invR5) * (2.0 / 3.0)
    f5 = -(3.0 * h_hat * h_hat * ez2 * invR
           + 3.0 * ez2 * invR3
           + (2.0 - 15.0 * ez2) * invR5) * (4.0 / 3.0)
    return f1, f2, f3, f4, f5, invR


def wall_self_diag(z, a, dtype, h_floor=WALL_H_FLOOR, radii=None):
    """Per-blob wall self-correction diagonal, shape (N, 3).

    Added to the 4/3 free self term; reference i==j branch of
    ``mobilityUFSingleWallCorrection`` (``c_rigid_obj.cpp:98-104``),
    evaluated at heights floored to ``h_floor``·a (see ``WALL_H_FLOOR``).

    radii: optional (N,) per-blob physical radii.  The Swan–Brady self
    correction for a sphere of radius aᵢ is the equal-radius expression
    evaluated at z/aᵢ and scaled by a/aᵢ (exact — the self term depends on
    one sphere only); heights are floored in units of the blob's OWN radius.
    """
    zn = jnp.asarray(z, dtype) / a
    scale = 1.0
    if radii is not None:
        ahat = jnp.asarray(radii, dtype) / a
        zn = zn / ahat
        scale = 1.0 / ahat
    if h_floor > 0:
        zn = jnp.maximum(zn, h_floor)
    invZ = 1.0 / zn
    invZ3 = invZ * invZ * invZ
    invZ5 = invZ3 * invZ * invZ
    cxx = -(9.0 * invZ - 2.0 * invZ3 + invZ5) / 12.0
    czz = -(9.0 * invZ - 4.0 * invZ3 + invZ5) / 6.0
    return jnp.stack([cxx, cxx, czz], axis=-1) * (
        scale if radii is None else scale[:, None])


def self_mobility_blocks(r, a=1.0, eta=1.0, wall=False, h_floor=WALL_H_FLOOR,
                         radii=None):
    """Per-blob 3×3 self mobility (N, 3, 3), scaled by 1/(8πηa).

    Used by the diagonal preconditioner (reference ``diag_invM``,
    ``c_rigid_obj.cpp:489-543``).  Diagonal both with and without wall.
    radii: optional (N,) per-blob physical radii (self mobility 1/(6πηaᵢ)).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    dtype = r.dtype
    n = r.shape[0]
    diag = jnp.full((n, 3), _SELF_COEF, dtype=dtype)
    if radii is not None:
        diag = diag / (jnp.asarray(radii, dtype)[:, None] / a)
    if wall:
        diag = diag + wall_self_diag(r[:, 2], a, dtype, h_floor=h_floor,
                                     radii=radii)
    norm = 1.0 / (8.0 * jnp.pi * eta * a)
    return jnp.einsum("ni,ij->nij", diag * norm, jnp.eye(3, dtype=dtype))


def damping_factors(r, a=1.0, radii=None):
    """Wall-overlap damping d_i = min(z_i/aᵢ, 1), shape (N,).

    Reference ``make_damp_mat`` (``c_rigid_obj.cpp:618-639``), citing Balboa
    Usabiaga, Delmotte & Donev (2017) appendix A.  Unlike the reference's
    min(z/a, 1) (which goes NEGATIVE below the wall and un-damps the
    garbage-valued mobility there), the factor is clipped at 0: a below-wall
    blob — reachable transiently through RFD displacement of a wall-wedged
    configuration — gets zero mobility rows instead of unbounded ones.
    Identical for all valid (z ≥ 0) configurations.
    """
    r = jnp.asarray(r).reshape(-1, 3)
    az = a if radii is None else jnp.asarray(radii, r.dtype)
    return jnp.clip(r[:, 2] / az, 0.0, 1.0).astype(r.dtype)


def image_offsets(box_n, shells, dtype):
    """Nonzero in-plane lattice offsets n·(Lx, Ly, 0), |n|∞ ≤ shells.

    Units of a (box_n is the box in units of a).  The zero offset is the
    minimum-image sweep itself and is excluded.  Used by the exact
    doubly-periodic (pseudo-2D) image summation: the wall-corrected pair
    mobility decays like 1/ρ³ in-plane (the no-slip images cancel the bare
    1/ρ Stokeslet), so the lattice sum converges absolutely and shell
    truncation has an O(1/shells) tail — see tests/test_pseudo2d.py for the
    measured convergence.
    """
    import numpy as np

    n = np.arange(-shells, shells + 1)
    nx, ny = np.meshgrid(n, n, indexing="ij")
    sel = (nx != 0) | (ny != 0)
    off = np.stack([nx[sel] * float(box_n[0]), ny[sel] * float(box_n[1]),
                    np.zeros(int(sel.sum()))], axis=-1)
    return jnp.asarray(off, dtype)


def tail_coeffs(shells):
    """Two-ring Richardson tail coefficients (α, β) for the image sum.

    The ring-s sum of a 1/ρ³-decaying kernel behaves like A/s² + B/s³
    (8s ring terms × (sL)⁻³ decay), so the truncated tail Σ_{s>S} ring_s
    is the fixed linear combination α·ring_S + β·ring_{S−1} with
    [α, β] = [T₂, T₃]·M⁻¹, M = [[S⁻², S⁻³], [(S−1)⁻², (S−1)⁻³]],
    T_m = Σ_{s>S} s⁻m (computed at trace time).  shells=1 uses the
    one-term A/s² model: tail = (π²/6 − 1)·ring₁.  Shared by the exact
    image sweep (:func:`image_tail_weights`) and the pseudo-2D far-field
    kernel lattices (``farfield._kernel_hat_2p``).
    """
    import numpy as np

    if shells <= 0:
        return 0.0, 0.0
    if shells == 1:
        return np.pi ** 2 / 6.0 - 1.0, 0.0
    S = float(shells)
    srange = np.arange(shells + 1, 2_000_000, dtype=np.float64)
    T = np.array([np.sum(srange ** -2.0), np.sum(srange ** -3.0)])
    M = np.array([[S ** -2, S ** -3], [(S - 1) ** -2, (S - 1) ** -3]])
    alpha, beta = T @ np.linalg.inv(M)
    return float(alpha), float(beta)


def image_tail_weights(shells, dtype):
    """Per-offset weights aligned with :func:`image_offsets` ordering that
    fold the Richardson tail extrapolation into the truncated image sum:
    weight 1 + α on ring S, 1 + β on ring S−1, 1 elsewhere (ring index =
    ‖n‖∞).  Measured: drops the O(1/S) truncation tail by ~1.5 orders of
    magnitude at S=8 (tests/test_pseudo2d.py::test_tail_extrapolation)."""
    import numpy as np

    n = np.arange(-shells, shells + 1)
    nx, ny = np.meshgrid(n, n, indexing="ij")
    sel = (nx != 0) | (ny != 0)
    ring = np.maximum(np.abs(nx[sel]), np.abs(ny[sel]))
    alpha, beta = tail_coeffs(shells)
    w = np.ones(ring.shape, np.float64)
    w[ring == shells] += alpha
    if shells > 1:
        w[ring == shells - 1] += beta
    return jnp.asarray(w, dtype)


def self_image_sum(r_over_a, F, wall, box_n, shells,
                   h_floor=WALL_H_FLOOR, ahat=None, tail=True):
    """Σ_o w_o M(off_o; z_i, z_i)·F_i — every blob against its OWN in-plane
    periodic images: the diagonal of the exact doubly-periodic image sum.

    The XLA lattice sweep (:func:`_pair_tile`) covers these in-line (its
    image terms drop the self mask — a blob DOES interact with its own
    images); the symmetric Pallas kernel and per-device ring bookkeeping
    cover only i≠j pairs and add this term separately.  Pair terms only —
    no self mobility / damping / scaling.  r_over_a: positions in units
    of a; box_n: (Lx, Ly) in units of a; F: (N, 3) or (k, N, 3) →
    matching shape.
    """
    multi = F.ndim == 3
    Fk = F if multi else F[None]
    dtype = Fk.dtype
    off = image_offsets(box_n, shells, dtype)                     # (O, 3)
    w = (image_tail_weights(shells, dtype) if tail
         else jnp.ones((off.shape[0],), dtype))
    z = r_over_a[:, 2]
    poly = ahat is not None
    if poly:
        inv_ae = 1.0 / jnp.asarray(ahat, dtype)                   # aᵢaᵢ pair
        zs = z * inv_ae
    else:
        inv_ae = None
        zs = z
    if wall and h_floor > 0:
        zs = jnp.maximum(zs, h_floor)

    def one(acc, ow):
        o, wt = ow
        if poly:
            a_ = jnp.asarray(ahat, dtype)
            alpha, beta = _free_coeffs_poly(jnp.sum(o * o), a_, a_, dtype)
            alpha, beta = alpha[:, None], beta                    # (N,1),(N,)
        else:
            alpha, beta = _free_coeffs(jnp.sum(o * o), dtype)     # scalars
        dF = o[0] * Fk[..., 0] + o[1] * Fk[..., 1]                # (k, N)
        out = alpha * Fk + (beta * dF)[..., None] * o
        if wall:
            oxy = o[:2] * (inv_ae[:, None] if poly
                           else jnp.ones((1, 1), dtype))          # (N|1, 2)
            d_img = jnp.concatenate(
                [jnp.broadcast_to(oxy, (zs.shape[0], 2)),
                 (2.0 * zs)[:, None]], axis=-1)                   # (N, 3)
            f1, f2, f3, f4, f5, invR = _wall_coeffs(d_img, zs)
            if poly:
                f1, f2, f3, f4, f5 = (f * inv_ae
                                      for f in (f1, f2, f3, f4, f5))
            e = d_img * invR[:, None]                             # (N, 3)
            eF = jnp.einsum("nx,knx->kn", e, Fk)
            Fz = Fk[..., 2]
            out = out + f1[:, None] * Fk
            out = out + (f2 * eF)[..., None] * e
            out = out + (f3 * Fz)[..., None] * e
            out = out.at[..., 2].add(f4 * eF + f5 * Fz)
        return acc + wt * out.astype(dtype), None

    out, _ = lax.scan(one, jnp.zeros_like(Fk), (off, w))
    return out if multi else out[0]


def _pair_field_sum(d, keep, Fk, wall, dtype, zi, zj, inv_ae,
                    ahat_rows, ahat_cols):
    """Σ_j M(d_ij)·F_j for one displacement set d (T, N, 3) → (k, T, 3).

    keep: optional (T, N) bool — False pairs contribute nothing (self-pair
    masking; only the zero lattice offset masks them — a blob DOES interact
    with its own periodic images).  zi/zj: floored heights in wall units
    (broadcastable to (T, N)); inv_ae: polydisperse pair radius factor or
    None.  All are offset-independent and precomputed by the caller.
    """
    poly = ahat_rows is not None
    r2 = jnp.sum(d * d, axis=-1)
    if keep is not None:
        # gradient safety: the self-pair r²=0 is masked out of the primal
        # below, but d(r^{-3/2})/dr² at the 1e-24 floor overflows float32 and
        # poisons reverse-mode AD with inf·0 = NaN — substitute a harmless
        # distance first
        r2 = jnp.where(keep, r2, 4.0)
    if poly:
        alpha, beta = _free_coeffs_poly(
            r2, ahat_rows[:, None], ahat_cols[None, :], dtype)
    else:
        alpha, beta = _free_coeffs(r2, dtype)
    if keep is not None:
        alpha = jnp.where(keep, alpha, 0.0)
        beta = jnp.where(keep, beta, 0.0)
    dF = jnp.einsum("tnx,knx->ktn", d, Fk)
    out = jnp.einsum("tn,knx->ktx", alpha, Fk) + jnp.einsum(
        "ktn,tn,tnx->ktx", dF, beta, d
    )
    if wall:
        if poly:
            d_img = (d * inv_ae[:, :, None]).at[:, :, 2].set(zi + zj)
        else:
            d_img = d.at[:, :, 2].set(jnp.broadcast_to(zi + zj, d.shape[:2]))
        f1, f2, f3, f4, f5, invR = _wall_coeffs(d_img, zj)
        if poly:
            f1, f2, f3, f4, f5 = (f * inv_ae for f in (f1, f2, f3, f4, f5))
        e = d_img * invR[:, :, None]
        if keep is not None:
            f1 = jnp.where(keep, f1, 0.0)
            f2 = jnp.where(keep, f2, 0.0)
            f3 = jnp.where(keep, f3, 0.0)
            f4 = jnp.where(keep, f4, 0.0)
            f5 = jnp.where(keep, f5, 0.0)
        f1, f2, f3, f4, f5 = (f.astype(dtype) for f in (f1, f2, f3, f4, f5))
        eF = jnp.einsum("tnx,knx->ktn", e, Fk)
        Fz = Fk[:, :, 2]
        out = out + jnp.einsum("tn,knx->ktx", f1, Fk)
        out = out + jnp.einsum("ktn,tn,tnx->ktx", eF, f2, e)
        out = out + jnp.einsum("tn,kn,tnx->ktx", f3, Fz, e)
        z_part = jnp.einsum("tn,ktn->kt", f4, eF) + jnp.einsum("tn,kn->kt", f5, Fz)
        out = out.at[:, :, 2].add(z_part)
    return out


def _pair_tile(ri, zi_img_unused, rj, row_ids, col_ids, F, inv_a, wall, dtype,
               h_floor=WALL_H_FLOOR, box_n=None, ahat_rows=None,
               ahat_cols=None, img_offsets=None, img_weights=None):
    """Mobility contribution of all column blobs onto a tile of row blobs.

    ri: (T, 3) row positions;  rj: (N, 3) all positions;
    F: (N, 3) forces, or (k, N, 3) for a multi-RHS sweep (the pair
    coefficient fields — the expensive part — are shared across RHS).
    row_ids/col_ids: global indices for self-pair masking.
    ahat_rows/ahat_cols: optional per-blob radii in units of ``a`` (both or
    neither) — polydisperse RPY (see :func:`_free_coeffs_poly`); the wall
    pair correction is then evaluated at the pair-geometric-mean radius
    √(aᵢaⱼ) (exact for aᵢ=aⱼ; the unequal-radii single-wall image system
    has no published closed form at Swan–Brady order, so the finite-size
    image terms are an a_eff approximation — the leading point-image term
    is radius-independent and remains exact).
    img_offsets: optional (O, 3) nonzero in-plane lattice offsets (units of
    a, see :func:`image_offsets`) — the exact doubly-periodic image sum,
    accumulated by a scan so peak memory stays O(T·N).
    Returns (T, 3) / (k, T, 3) = Σ_j M_ij F_j (pair terms only).
    """
    multi = F.ndim == 3
    poly = ahat_rows is not None
    Fk = F if multi else F[None]
    d = _wrap_xy((ri[:, None, :] - rj[None, :, :]) * inv_a, box_n)  # (T, N, 3)
    keep = row_ids[:, None] != col_ids[None, :]
    inv_ae = zi = zj = None
    if wall:
        if poly:
            inv_ae = 1.0 / jnp.sqrt(ahat_rows[:, None] * ahat_cols[None, :])
            zj = rj[None, :, 2] * inv_a * inv_ae
            zi = ri[:, None, 2] * inv_a * inv_ae
        else:
            zj = rj[None, :, 2] * inv_a
            zi = ri[:, None, 2] * inv_a
        if h_floor > 0:
            zj = jnp.maximum(zj, h_floor)
            zi = jnp.maximum(zi, h_floor)
    out = _pair_field_sum(d, keep, Fk, wall, dtype, zi, zj, inv_ae,
                          ahat_rows, ahat_cols)
    if img_offsets is not None:
        w = (jnp.ones((img_offsets.shape[0],), dtype)
             if img_weights is None else img_weights)

        def add_offset(acc, ow):
            off, wt = ow
            return acc + wt * _pair_field_sum(
                d + off[None, None, :], None, Fk, wall, dtype, zi, zj,
                inv_ae, ahat_rows, ahat_cols), None

        out, _ = lax.scan(add_offset, out, (img_offsets, w))
    return out if multi else out[0]


def pair_sum(
    r_rows,
    row_ids,
    r_cols,
    col_ids,
    F_cols,
    a=1.0,
    wall=False,
    row_tile=512,
    h_floor=WALL_H_FLOOR,
    box=None,
    radii_rows=None,
    radii_cols=None,
    image_shells=0,
    image_tail=True,
):
    """Σ_j M_ij·F_j over all column blobs, for a set of row blobs.

    Pair terms only — no self term, no 1/(8πηa) scaling, no damping (the
    caller owns those; they are elementwise).  This is the unit both the
    single-device streamed matvec and the ``shard_map`` row-sharded matvec
    are built from.  Shapes: r_rows (R, 3), r_cols/F_cols (N, 3),
    row_ids (R,), col_ids (N,) global indices for self-pair masking.

    image_shells: 0 = minimum-image only (the classic pseudo-periodic
    approximation); S ≥ 1 adds the exact sum over the (2S+1)²−1 nearest
    nonzero in-plane lattice images (requires a 2-D ``box``) — the exact
    doubly-periodic wall-bounded operator up to the O(1/S) shell tail,
    which ``image_tail=True`` (default) kills with two-ring Richardson
    extrapolation (:func:`image_tail_weights`; ~1.5 orders of magnitude
    at S=8).  ``image_tail=False`` is the raw truncated sum (the
    brute-force-oracle parity mode).
    """
    dtype = r_rows.dtype
    inv_a = jnp.asarray(1.0 / a, dtype)
    box_n = None if box is None else tuple(b / a for b in box)
    img_off = img_w = None
    if image_shells:
        if box_n is None or len(box_n) != 2:
            raise ValueError(
                "image_shells needs a 2-D (Lx, Ly) box — the exact image "
                "sum is the doubly-periodic (pseudo-2D) geometry"
            )
        img_off = image_offsets(box_n, int(image_shells), dtype)
        if image_tail:
            img_w = image_tail_weights(int(image_shells), dtype)
    n_rows = r_rows.shape[0]
    tile = min(row_tile, n_rows)
    n_tiles = -(-n_rows // tile)
    n_pad = n_tiles * tile
    r_pad = jnp.pad(r_rows, ((0, n_pad - n_rows), (0, 0)))
    # padded rows get id -1 → never match a column id → no self masking issues
    ids_pad = jnp.pad(row_ids.astype(jnp.int32), (0, n_pad - n_rows), constant_values=-1)
    poly = radii_rows is not None
    if poly:
        # radii in units of a; pad with 1.0 (padded rows are dropped anyway,
        # but 0 would divide by zero inside the coefficient fields)
        ar_pad = jnp.pad(jnp.asarray(radii_rows, dtype) * inv_a,
                         (0, n_pad - n_rows), constant_values=1.0)
        ac = jnp.asarray(radii_cols, dtype) * inv_a

    def tile_fn(start):
        ri = lax.dynamic_slice(r_pad, (start, jnp.int32(0)), (tile, 3))
        rid = lax.dynamic_slice(ids_pad, (start,), (tile,))
        ar = lax.dynamic_slice(ar_pad, (start,), (tile,)) if poly else None
        return _pair_tile(ri, None, r_cols, rid, col_ids.astype(jnp.int32),
                          F_cols, inv_a, wall, dtype, h_floor=h_floor,
                          box_n=box_n, ahat_rows=ar,
                          ahat_cols=ac if poly else None,
                          img_offsets=img_off, img_weights=img_w)

    multi = F_cols.ndim == 3
    if n_tiles == 1:
        U = tile_fn(jnp.int32(0))
    else:
        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
        U = lax.map(tile_fn, starts)  # (n_tiles, [k,] tile, 3)
        if multi:
            U = jnp.moveaxis(U, 1, 0).reshape(F_cols.shape[0], n_pad, 3)
        else:
            U = U.reshape(n_pad, 3)
    return U[..., :n_rows, :]


def mobility_apply(
    F,
    r,
    a=1.0,
    eta=1.0,
    wall=False,
    damp=None,
    row_tile=512,
    h_floor=WALL_H_FLOOR,
    box=None,
    radii=None,
    image_shells=0,
    image_tail=True,
):
    """Matrix-free U = M(r)·F (optionally B·M·B·F), shapes (N, 3)→(N, 3).

    Streams row tiles with ``lax.map`` so peak memory is O(row_tile·N)
    instead of O(N²) — the TPU replacement for the reference's dense
    per-call assembly (``apply_M``, ``c_rigid_obj.cpp:641-659``).

    damp: None → apply damping iff ``wall`` (reference semantics);
      True/False forces it.
    image_shells: exact doubly-periodic image sum — see :func:`pair_sum`.
    """
    r = jnp.asarray(r).reshape(-1, 3)
    F = jnp.asarray(F, dtype=r.dtype).reshape(-1, 3)
    n = r.shape[0]
    dtype = r.dtype
    use_damp = wall if damp is None else damp

    Fd = F
    if use_damp:
        b = damping_factors(r, a, radii=radii)
        Fd = F * b[:, None]

    ids = jnp.arange(n, dtype=jnp.int32)
    U = pair_sum(r, ids, r, ids, Fd, a=a, wall=wall, row_tile=row_tile,
                 h_floor=h_floor, box=box, radii_rows=radii, radii_cols=radii,
                 image_shells=image_shells, image_tail=image_tail)

    # self term (4/3 + wall self) — diagonal, added outside the pair sweep
    self_diag = jnp.full((n, 3), _SELF_COEF, dtype=dtype)
    if radii is not None:
        self_diag = self_diag / (jnp.asarray(radii, dtype)[:, None] / a)
    if wall:
        self_diag = self_diag + wall_self_diag(r[:, 2], a, dtype,
                                               h_floor=h_floor, radii=radii)
    U = U + self_diag * Fd

    norm = jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)
    U = U * norm
    if use_damp:
        U = U * b[:, None]
    return U


def mobility_apply_multi(
    Fs,
    r,
    a=1.0,
    eta=1.0,
    wall=False,
    damp=None,
    row_tile=512,
    h_floor=WALL_H_FLOOR,
    box=None,
    radii=None,
    image_shells=0,
    image_tail=True,
):
    """Multi-RHS U_k = M(r)·F_k (damped iff wall), (k, N, 3)×(N, 3)→(k, N, 3).

    The pair coefficient fields — the dominant cost — are computed once and
    applied to every RHS; a k-RHS sweep costs ~(1 + 0.2·k)× a single matvec
    instead of k×.  Used by the fused two-draw Lanczos in the stochastic
    stepper (``split_rand`` draws two M^{1/2}W per step at one configuration).
    """
    r = jnp.asarray(r).reshape(-1, 3)
    Fs = jnp.asarray(Fs, dtype=r.dtype)
    k = Fs.shape[0]
    Fs = Fs.reshape(k, -1, 3)
    n = r.shape[0]
    dtype = r.dtype
    use_damp = wall if damp is None else damp

    Fd = Fs
    if use_damp:
        b = damping_factors(r, a, radii=radii)
        Fd = Fs * b[None, :, None]

    ids = jnp.arange(n, dtype=jnp.int32)
    U = pair_sum(r, ids, r, ids, Fd, a=a, wall=wall, row_tile=row_tile,
                 h_floor=h_floor, box=box, radii_rows=radii, radii_cols=radii,
                 image_shells=image_shells, image_tail=image_tail)

    self_diag = jnp.full((n, 3), _SELF_COEF, dtype=dtype)
    if radii is not None:
        self_diag = self_diag / (jnp.asarray(radii, dtype)[:, None] / a)
    if wall:
        self_diag = self_diag + wall_self_diag(r[:, 2], a, dtype,
                                               h_floor=h_floor, radii=radii)
    U = U + self_diag[None] * Fd
    U = U * jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)
    if use_damp:
        U = U * b[None, :, None]
    return U


def _dense_pair_blocks(d, keep, wall, dtype, zi, zj, inv_ae, ahat):
    """(N, N, 3, 3) pair mobility blocks for one displacement set d.

    keep: optional (N, N) bool — False pairs zeroed (self masking at the
    zero lattice offset; the caller re-adds the self diagonal).  zi/zj/
    inv_ae as in :func:`_pair_field_sum` (offset-independent).
    """
    poly = ahat is not None
    r2 = jnp.sum(d * d, axis=-1)
    if keep is not None:
        r2 = jnp.where(keep, r2, 4.0)  # gradient safety — see _pair_tile
    if poly:
        alpha, beta = _free_coeffs_poly(r2, ahat[:, None], ahat[None, :], dtype)
    else:
        alpha, beta = _free_coeffs(r2, dtype)
    if keep is not None:
        alpha = jnp.where(keep, alpha, 0.0)
        beta = jnp.where(keep, beta, 0.0)
    eye3 = jnp.eye(3, dtype=dtype)
    M = (alpha[:, :, None, None] * eye3
         + beta[:, :, None, None] * d[:, :, :, None] * d[:, :, None, :])
    if wall:
        if poly:
            d_img = (d * inv_ae[:, :, None]).at[:, :, 2].set(zi + zj)
        else:
            d_img = d.at[:, :, 2].set(jnp.broadcast_to(zi + zj, d.shape[:2]))
        f1, f2, f3, f4, f5, invR = _wall_coeffs(d_img, zj)
        if poly:
            f1, f2, f3, f4, f5 = (f * inv_ae for f in (f1, f2, f3, f4, f5))
        e = d_img * invR[:, :, None]
        zhat = jnp.zeros((3,), dtype).at[2].set(1.0)
        C = (f1[:, :, None, None] * eye3
             + f2[:, :, None, None] * e[:, :, :, None] * e[:, :, None, :]
             + f3[:, :, None, None] * e[:, :, :, None] * zhat[None, None, None, :]
             + f4[:, :, None, None] * zhat[None, None, :, None] * e[:, :, None, :]
             + f5[:, :, None, None] * zhat[None, None, :, None] * zhat[None, None, None, :])
        if keep is not None:
            C = jnp.where(keep[:, :, None, None], C, 0.0)
        M = M + C
    return M


def mobility_matrix(r, a=1.0, eta=1.0, wall=False, h_floor=WALL_H_FLOOR,
                    box=None, radii=None, image_shells=0, image_tail=True):
    """Dense (3N, 3N) RPY mobility — small-N reference path and PC blocks.

    Parity: ``rotne_prager_tensor`` (``c_rigid_obj.cpp:413-459``), evaluated
    for every ordered pair (valid because the wall block satisfies
    C_ji = C_ijᵀ — see module docstring).  radii: optional (N,) per-blob
    physical radii — polydisperse RPY (see :func:`_free_coeffs_poly` and the
    wall a_eff note in :func:`_pair_tile`).
    image_shells: exact doubly-periodic image sum — see :func:`pair_sum`.
    """
    r = jnp.asarray(r).reshape(-1, 3)
    dtype = r.dtype
    n = r.shape[0]
    inv_a = jnp.asarray(1.0 / a, dtype)
    poly = radii is not None
    ahat = jnp.asarray(radii, dtype) * inv_a if poly else None
    box_n = None if box is None else tuple(b / a for b in box)
    d = _wrap_xy((r[:, None, :] - r[None, :, :]) * inv_a, box_n)  # (N, N, 3)
    eye_n = jnp.eye(n, dtype=bool)
    inv_ae = zi = zj = None
    if wall:
        if poly:
            inv_ae = 1.0 / jnp.sqrt(ahat[:, None] * ahat[None, :])
            zj = r[None, :, 2] * inv_a * inv_ae
            zi = r[:, None, 2] * inv_a * inv_ae
        else:
            zj = r[None, :, 2] * inv_a
            zi = r[:, None, 2] * inv_a
        if h_floor > 0:
            zj = jnp.maximum(zj, h_floor)
            zi = jnp.maximum(zi, h_floor)
    M = _dense_pair_blocks(d, ~eye_n, wall, dtype, zi, zj, inv_ae, ahat)
    if image_shells:
        if box_n is None or len(box_n) != 2:
            raise ValueError(
                "image_shells needs a 2-D (Lx, Ly) box — the exact image "
                "sum is the doubly-periodic (pseudo-2D) geometry"
            )
        off = image_offsets(box_n, int(image_shells), dtype)
        wts = (image_tail_weights(int(image_shells), dtype) if image_tail
               else jnp.ones((off.shape[0],), dtype))

        def add_offset(acc, ow):
            o, wt = ow
            return acc + wt * _dense_pair_blocks(
                d + o[None, None, :], None, wall, dtype, zi, zj, inv_ae,
                ahat), None

        M, _ = lax.scan(add_offset, M, (off, wts))
    # self diagonal: 4/3 free term (+ wall self correction)
    self_diag = jnp.full((n, 3), _SELF_COEF, dtype=dtype)
    if poly:
        self_diag = self_diag / ahat[:, None]
    if wall:
        self_diag = self_diag + wall_self_diag(r[:, 2], a, dtype,
                                               h_floor=h_floor, radii=radii)
    eye3 = jnp.eye(3, dtype=dtype)
    M = M + (eye_n[:, :, None, None]
             * jnp.einsum("ni,ij->nij", self_diag, eye3)[:, None, :, :])
    norm = jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)
    M = M * norm
    return M.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)


def cross_mobility_blocks(ri, rj, a=1.0, eta=1.0, wall=False,
                          h_floor=WALL_H_FLOOR, radii_i=None, radii_j=None):
    """Pair mobility blocks between two position sets, (..., P, Q, 3, 3).

    Same physics/normalization as :func:`mobility_matrix` (free-space RPY
    + Swan–Brady wall correction, scaled by 1/(8πηa)) for CROSS pairs of
    ``ri`` (..., P, 3) and ``rj`` (..., Q, 3): no self branch (coincident
    pairs get the r→0 overlap limit α→4/3, β·d⊗d→0 — callers that need
    self terms overwrite them, e.g. with :func:`self_mobility_blocks`)
    and no damping sandwich (apply ``damping_factors`` externally).
    radii_i / radii_j: optional (..., P) / (..., Q) physical radii —
    polydisperse Zuk RPY + wall a_eff = √(aᵢaⱼ) scaling, exactly
    :func:`_dense_pair_blocks`' poly branch (give BOTH or neither).
    Used by the RAS preconditioner's halo coupling blocks
    (:func:`rigid_body_light_tpu.ops.saddle.build_pc_ras` and the mixture
    generalization in ``multi.build_pc_ras_multi``).
    """
    ri = jnp.asarray(ri)
    rj = jnp.asarray(rj)
    dtype = ri.dtype
    inv_a = jnp.asarray(1.0 / a, dtype)
    poly = radii_i is not None
    d = (ri[..., :, None, :] - rj[..., None, :, :]) * inv_a  # (..., P, Q, 3)
    r2 = jnp.sum(d * d, axis=-1)
    if poly:
        ahat_i = jnp.asarray(radii_i, dtype) * inv_a
        ahat_j = jnp.asarray(radii_j, dtype) * inv_a
        alpha, beta = _free_coeffs_poly(r2, ahat_i[..., :, None],
                                        ahat_j[..., None, :], dtype)
    else:
        alpha, beta = _free_coeffs(r2, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    M = (alpha[..., None, None] * eye3
         + beta[..., None, None] * d[..., :, None] * d[..., None, :])
    if wall:
        if poly:
            inv_ae = 1.0 / jnp.sqrt(ahat_i[..., :, None]
                                    * ahat_j[..., None, :])
            zi = ri[..., :, None, 2] * inv_a * inv_ae
            zj = rj[..., None, :, 2] * inv_a * inv_ae
        else:
            zi = ri[..., :, None, 2] * inv_a
            zj = rj[..., None, :, 2] * inv_a
        if h_floor > 0:
            zi = jnp.maximum(zi, h_floor)
            zj = jnp.maximum(zj, h_floor)
        d_img = ((d * inv_ae[..., None]) if poly else d).at[..., 2].set(
            zi + zj)
        f1, f2, f3, f4, f5, invR = _wall_coeffs(d_img, zj)
        if poly:
            f1, f2, f3, f4, f5 = (f * inv_ae for f in (f1, f2, f3, f4, f5))
        e = d_img * invR[..., None]
        zhat = jnp.zeros((3,), dtype).at[2].set(1.0)
        M = (M + f1[..., None, None] * eye3
             + f2[..., None, None] * e[..., :, None] * e[..., None, :]
             + f3[..., None, None] * e[..., :, None] * zhat
             + f4[..., None, None] * zhat[:, None] * e[..., None, :]
             + f5[..., None, None] * zhat[:, None] * zhat[None, :])
    return M * jnp.asarray(1.0 / (8.0 * jnp.pi * eta * a), dtype)


def apply_M_dense(F, r, a=1.0, eta=1.0, wall=False, h_floor=WALL_H_FLOOR,
                  box=None, radii=None):
    """Dense-path U = B·M·B·F (damping iff wall), for small N / validation."""
    r = jnp.asarray(r).reshape(-1, 3)
    F = jnp.asarray(F, dtype=r.dtype).reshape(-1)
    M = mobility_matrix(r, a, eta, wall, h_floor=h_floor, box=box, radii=radii)
    if wall:
        b = jnp.repeat(damping_factors(r, a, radii=radii), 3)
        return (b * (M @ (b * F))).reshape(-1, 3)
    return (M @ F).reshape(-1, 3)
