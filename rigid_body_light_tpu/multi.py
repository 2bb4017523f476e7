"""Multi-species suspensions: mixtures of different rigid body types.

The reference supports exactly one blob reference configuration shared by
all bodies (``setParameters`` stores a single ``ref_cfg``,
``c_rigid_obj.cpp:183-195``).  Real suspensions mix species (different
sizes/resolutions/shapes).  Here a species is a (RefGeometry, body batch)
pair; hydrodynamics couples everything at the blob level — the mobility
sweep just sees the concatenated (N_total, 3) blob array — while the
kinematic projections, preconditioner blocks and quaternion updates stay
batched *within* each species (fixed shapes per species → still one jit).

The public surface mirrors the single-species stack:

    mgeom   = MultiGeometry.create([(ref_cfg_a, B_a), (ref_cfg_b, B_b)])
    states  = (make_state(Xa, Qa), make_state(Xb, Qb))
    res     = solve_saddle_multi(mgeom, cfg, states, slips, forces)
    states' = stochastic_step_multi(mgeom, cfg, states, key, forces)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import gmres as gmres_mod
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.state import BodyState


class MultiGeometry(NamedTuple):
    """Static geometry of an S-species mixture (pytree of RefGeometry).

    radii: per-species blob radius (None entries fall back to ``cfg.a``).
    A species with its own radius gets polydisperse RPY in the coupled
    blob sweep (see ``rpy._free_coeffs_poly``) and exact per-species
    self/PC/noise factors built at that radius — the standard unequal-aᵢ
    generalization the reference hardcodes away (one ``a`` in
    ``setParameters``, ``c_rigid_obj.cpp:183``).
    """

    geoms: Tuple[kin.RefGeometry, ...]
    radii: Tuple = None

    @classmethod
    def create(cls, ref_cfgs: Sequence, dtype=jnp.float32,
               radii: Sequence = None) -> "MultiGeometry":
        geoms = tuple(kin.make_ref_geometry(c, dtype=dtype) for c in ref_cfgs)
        if radii is None:
            radii = (None,) * len(geoms)
        else:
            if len(radii) != len(geoms):
                raise ValueError(
                    f"radii has {len(radii)} entries for {len(geoms)} species")
            radii = tuple(None if r is None else float(r) for r in radii)
        return cls(geoms=geoms, radii=radii)

    @property
    def n_species(self) -> int:
        return len(self.geoms)

    def species_a(self, cfg: SimulationConfig) -> Tuple[float, ...]:
        radii = self.radii if self.radii is not None else (None,) * len(self.geoms)
        return tuple(cfg.a if r is None else r for r in radii)

    def is_poly(self) -> bool:
        radii = self.radii if self.radii is not None else ()
        return any(r is not None for r in radii)


def blob_radii_multi(mgeom: MultiGeometry, opses, cfg: SimulationConfig):
    """Concatenated (N_total,) per-blob radii, or None when monodisperse."""
    if not mgeom.is_poly():
        return None
    dtype = opses[0].positions.dtype
    parts = []
    for o, a_s in zip(opses, mgeom.species_a(cfg)):
        B, n = o.offsets.shape[0], o.offsets.shape[1]
        parts.append(jnp.full((B * n,), a_s, dtype))
    return jnp.concatenate(parts)


def _mob_fns(mgeom: MultiGeometry, opses, cfg: SimulationConfig):
    """(mob_apply, mob_apply_multi) with the mixture's blob radii closed in."""
    radii = blob_radii_multi(mgeom, opses, cfg)
    return (saddle_mod.mobility_apply_fn(cfg, radii=radii),
            saddle_mod.mobility_apply_multi_fn(cfg, radii=radii))


def geometry_ops_multi(mgeom: MultiGeometry, states: Sequence[BodyState]):
    return tuple(
        saddle_mod.geometry_ops(g, s) for g, s in zip(mgeom.geoms, states)
    )


def _blob_counts(opses) -> Tuple[int, ...]:
    return tuple(o.offsets.shape[0] * o.offsets.shape[1] for o in opses)


def concat_positions(opses) -> jax.Array:
    return jnp.concatenate([o.flat_positions for o in opses], axis=0)


def split_blobs(x, opses):
    """Split a concatenated (N_total, 3) blob array back per species."""
    counts = _blob_counts(opses)
    out = []
    start = 0
    for c in counts:
        out.append(x[start : start + c])
        start += c
    return tuple(out)


def K_dot_multi(Us, opses) -> jax.Array:
    """Concatenated K·U over species: (B_s, 6) each → (N_total, 3)."""
    return jnp.concatenate(
        [kin.K_dot(U, o.offsets).reshape(-1, 3) for U, o in zip(Us, opses)], axis=0
    )


def KT_dot_multi(lam, opses):
    """Concatenated blob forces → per-species (B_s, 6)."""
    parts = split_blobs(lam.reshape(-1, 3), opses)
    return tuple(
        kin.KT_dot(p.reshape(o.offsets.shape), o.offsets)
        for p, o in zip(parts, opses)
    )


def apply_saddle_multi(lam, Us, opses, cfg: SimulationConfig, mob_apply=None):
    """[Mλ − KU; KᵀU] for the mixture; λ (N_total, 3), Us tuple of (B_s, 6)."""
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    pos = concat_positions(opses)
    slip = mob_apply(lam.reshape(-1, 3), pos) - K_dot_multi(Us, opses)
    return slip, KT_dot_multi(lam, opses)


def build_pc_multi(opses, cfg: SimulationConfig, species_a=None):
    """Per-species PCs; species_a (from ``MultiGeometry.species_a``) builds
    each species' factors at its own blob radius."""
    if species_a is None:
        return tuple(saddle_mod.build_pc(o, cfg) for o in opses)
    return tuple(
        saddle_mod.build_pc(o, cfg if a_s == cfg.a else cfg.replace(a=a_s))
        for o, a_s in zip(opses, species_a)
    )


class RasMultiPC(NamedTuple):
    """Mixture RAS halo-coupling preconditioner (round 5) — the
    polydisperse generalization of ``saddle.build_pc_ras``.

    Same construction per species as the single-species PC (overlapping
    per-body clusters solved exactly via a Woodbury split around each
    species' static body-frame core), except halo blobs are drawn from
    ALL species (polydisperse Zuk/wall-a_eff coupling blocks) and Ñ is
    the consistent coupled matrix over every body of every species.
    ``apply_pc_multi`` dispatches on this type."""

    pcs: Tuple                 # per-species static PCData (block_free core)
    halo_idx: Tuple            # per-species (B_s, H_s) GLOBAL blob ids
    halo_w: Tuple              # per-species (B_s, 3n_s, 3H_s) W = A⁻¹C
    halo_sinv: Tuple           # per-species (B_s, 3H_s, 3H_s) Schur⁻¹
    n_full: jax.Array          # (6B_tot, 6B_tot) coupled (KᵀM̃⁻¹K)⁻¹


def build_pc_ras_multi(opses, cfg: SimulationConfig, static_pcs,
                       species_a) -> "RasMultiPC":
    """Attach RAS halo coupling across a mixture (single-device).

    Mirrors ``saddle.build_pc_ras`` (see its docstring for the design and
    the measured SPD-safety/consistency constraints) with three mixture
    deltas: (a) each body's halo candidates span the CONCATENATED blob
    array of all species, so cross-species near contacts are captured;
    (b) the coupling/halo blocks are polydisperse
    (``rpy.cross_mobility_blocks(radii_i=…, radii_j=…)`` — Zuk RPY +
    wall a_eff); (c) the consistent Ñ couples all 6·B_tot body
    coordinates in ``_flatten``'s species-major ordering.  Empty halos
    reduce each species to its static block_free PC exactly.

    Falls back to ``static_pcs`` when there is one body total or
    ``pc_halo_max == 0``.  Distributed mixtures keep the static
    per-species PC (the solve hook only attaches RAS when
    ``axis_name is None``)."""
    from jax import lax

    from rigid_body_light_tpu.ops import rpy

    Bs = [o.offsets.shape[0] for o in opses]
    ns = [o.offsets.shape[1] for o in opses]
    counts = _blob_counts(opses)
    B_tot, N_tot = sum(Bs), sum(counts)
    Hs = [min(cfg.pc_halo_max, N_tot - n) for n in ns]
    if B_tot == 1 or cfg.pc_halo_max <= 0 or min(Hs) <= 0:
        return static_pcs
    pos = concat_positions(opses)                          # (N_tot, 3)
    dtype = pos.dtype
    radii_all = jnp.concatenate([
        jnp.full((c,), a_s, dtype) for c, a_s in zip(counts, species_a)])
    body_of = jnp.concatenate([
        jnp.repeat(boff + jnp.arange(B), n)
        for boff, B, n in zip(np.cumsum([0] + Bs[:-1]), Bs, ns)])
    wall = cfg.wall
    b_all = rpy.damping_factors(pos, cfg.a, radii=radii_all) if wall else None
    cutoff = jnp.asarray(cfg.pc_halo * cfg.a, dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    halo_idx_t, halo_w_t, halo_sinv_t = [], [], []
    boffs = np.cumsum([0] + Bs[:-1])
    coffs = np.cumsum([0] + list(counts[:-1]))
    for s, o in enumerate(opses):
        B_l, n, H = Bs[s], ns[s], Hs[s]
        # ---- halo selection: coarse top-2H by body-center distance,
        # refined by exact distance to the body's nearest blob
        X = o.positions[:, 0, :] - o.offsets[:, 0, :]      # (B_l, 3)
        d_c = jnp.linalg.norm(pos[None, :, :] - X[:, None, :], axis=-1)
        own = body_of[None, :] == (boffs[s] + jnp.arange(B_l))[:, None]
        d_c = jnp.where(own, jnp.inf, d_c)                 # (B_l, N_tot)
        K2 = min(2 * H, N_tot - n)
        _, cand = lax.top_k(-d_c, K2)                      # (B_l, K2)
        cand_pos = pos[cand.reshape(-1)].reshape(B_l, K2, 3)
        d_exact = jnp.min(jnp.linalg.norm(
            o.positions[:, :, None, :] - cand_pos[:, None, :, :], axis=-1),
            axis=1)                                        # (B_l, K2)
        neg_d, sel = lax.top_k(-d_exact, H)
        halo_idx = jnp.take_along_axis(cand, sel, axis=1)  # (B_l, H) global
        mask = (-neg_d) < cutoff
        halo_pos = pos[halo_idx.reshape(-1)].reshape(B_l, H, 3)
        halo_rad = radii_all[halo_idx.reshape(-1)].reshape(B_l, H)
        body_rad = jnp.full((B_l, n), species_a[s], dtype)

        # ---- polydisperse coupling C and halo block D (masked columns →
        # zero: an empty halo reduces to the static block_free PC exactly)
        mf = mask.astype(dtype)
        Cb = rpy.cross_mobility_blocks(
            o.positions, halo_pos, cfg.a, cfg.eta, wall=wall,
            h_floor=cfg.wall_h_floor, radii_i=body_rad, radii_j=halo_rad)
        Db = rpy.cross_mobility_blocks(
            halo_pos, halo_pos, cfg.a, cfg.eta, wall=wall,
            h_floor=cfg.wall_h_floor, radii_i=halo_rad, radii_j=halo_rad)
        if wall:
            b_body = rpy.damping_factors(
                o.flat_positions, cfg.a,
                radii=body_rad.reshape(-1)).reshape(B_l, n)
            b_halo = b_all[halo_idx.reshape(-1)].reshape(B_l, H)
            Cb = Cb * (b_body[:, :, None]
                       * b_halo[:, None, :])[..., None, None]
            Db = Db * (b_halo[:, :, None]
                       * b_halo[:, None, :])[..., None, None]
        Cb = Cb * mf[:, None, :, None, None]
        Db = Db * (mf[:, :, None] * mf[:, None, :])[..., None, None]
        selfb = rpy.self_mobility_blocks(
            halo_pos.reshape(-1, 3), cfg.a, cfg.eta, wall,
            h_floor=cfg.wall_h_floor,
            radii=halo_rad.reshape(-1)).reshape(B_l, H, 3, 3)
        if wall:
            selfb = selfb * (b_halo * b_halo)[:, :, None, None]
        diag_blocks = jnp.where(mask[:, :, None, None], selfb, eye3)
        hh = jnp.arange(H)
        Db = Db.at[:, hh, hh].set(diag_blocks)
        C = Cb.transpose(0, 1, 3, 2, 4).reshape(B_l, 3 * n, 3 * H)
        D = Db.transpose(0, 1, 3, 2, 4).reshape(B_l, 3 * H, 3 * H)

        # ---- Woodbury factors around this species' static core
        minv_ref = static_pcs[s].minv_ref
        W = saddle_mod._ras_core_apply(
            minv_ref, o.rot,
            C.reshape(B_l, n, 3, 3 * H).transpose(3, 0, 1, 2)
        ).transpose(1, 2, 3, 0).reshape(B_l, 3 * n, 3 * H)
        S = D - jnp.einsum("bph,bpg->bhg", C, W,
                           precision=saddle_mod._RAS_PRECISION)
        halo_idx_t.append(halo_idx)
        halo_w_t.append(W)
        halo_sinv_t.append(saddle_mod._ns_inverse(S, saddle_mod._NS_ITERS_S))

    mpc = RasMultiPC(pcs=tuple(static_pcs), halo_idx=tuple(halo_idx_t),
                     halo_w=tuple(halo_w_t), halo_sinv=tuple(halo_sinv_t),
                     n_full=None)

    # ---- consistent coupled Ñ = (Kᵀ M̃⁻¹ K)⁻¹ over ALL bodies of all
    # species, in _flatten's species-major (body, component) ordering:
    # one batched RAS apply over the 6·B_tot K columns (see
    # saddle.build_pc_ras for the chunked variant if this ever outgrows
    # memory — mixtures at that scale run the far-field backend anyway)
    cols = jnp.zeros((B_tot, 6, N_tot, 3), dtype)
    for s, o in enumerate(opses):
        B_l, n = Bs[s], ns[s]
        Kb = saddle_mod.body_K_blocks(o.offsets)           # (B_l, n, 3, 6)
        sub = jnp.zeros((B_l, 6, B_l, n, 3), dtype)
        idx = jnp.arange(B_l)
        sub = sub.at[idx, :, idx].set(Kb.transpose(0, 3, 1, 2))
        cols = lax.dynamic_update_slice(
            cols, sub.reshape(B_l, 6, B_l * n, 3),
            (int(boffs[s]), 0, int(coffs[s]), 0))
    y = _inv_m_ras_multi(mpc, cols.reshape(6 * B_tot, N_tot, 3), opses)
    rows = []
    for s, o in enumerate(opses):
        B_l, n = Bs[s], ns[s]
        y_s = y[:, int(coffs[s]):int(coffs[s]) + B_l * n, :]
        Kb = saddle_mod.body_K_blocks(o.offsets)
        rows.append(jnp.einsum(
            "bnif,cbni->cbf", Kb, y_s.reshape(-1, B_l, n, 3),
            precision=saddle_mod._RAS_PRECISION).reshape(6 * B_tot, 6 * B_l))
    ninv = jnp.concatenate(rows, axis=1).T                 # [p,q]=KₚᵀM̃⁻¹K_q
    n_full = saddle_mod._ns_inverse(ninv, saddle_mod._NS_ITERS_N)
    return mpc._replace(n_full=n_full)


def _inv_m_ras_multi(mpc: RasMultiPC, v, opses):
    """Mixture M̃⁻¹·v: per-species RAS Woodbury rows, halo values read
    from the CONCATENATED vector (clusters cross species).
    v (..., N_tot, 3) → (..., N_tot, 3)."""
    parts = []
    start = 0
    for s, o in enumerate(opses):
        c = o.offsets.shape[0] * o.offsets.shape[1]
        parts.append(saddle_mod._ras_apply(
            v[..., start:start + c, :], mpc.pcs[s].minv_ref, o.rot,
            mpc.halo_idx[s], mpc.halo_w[s], mpc.halo_sinv[s], v_full=v))
        start += c
    return jnp.concatenate(parts, axis=-2)


def _apply_pc_ras_multi(mpc: RasMultiPC, slip, Fs, opses,
                        cfg: SimulationConfig):
    """Coupled mixture saddle PC (same algebra as ``saddle.apply_pc``):
    (slip, Fs) → (λ, Us) with the RAS M̃⁻¹ and the coupled Ñ."""
    slip = slip.reshape(-1, 3)
    im = _inv_m_ras_multi(mpc, slip, opses)
    rhs = jnp.concatenate([
        (-F - kin.KT_dot(p.reshape(o.offsets.shape), o.offsets)).reshape(-1)
        for F, p, o in zip(Fs, split_blobs(im, opses), opses)])
    U_all = mpc.n_full @ rhs
    Us, start = [], 0
    for o in opses:
        b = o.offsets.shape[0]
        Us.append(U_all[start:start + 6 * b].reshape(b, 6))
        start += 6 * b
    Us = tuple(Us)
    lam = _inv_m_ras_multi(mpc, slip + K_dot_multi(Us, opses), opses)
    lam = jnp.asarray(cfg.m_scale, lam.dtype) * lam
    return lam.reshape(-1, 3), Us


def make_noise_preconditioner_multi(mgeom: MultiGeometry, a, eta, dtype=jnp.float32):
    """Per-species body-frame noise factors — mixture analogue of
    :func:`rigid_body_light_tpu.ops.lanczos.make_noise_preconditioner`.

    C = blkdiag over *all* bodies of every species of that body's free-space
    reference mobility; each species contributes its own (L, L⁻¹) pair of
    shape (3n_s, 3n_s), applied to its slice of the Lanczos vectors.
    """
    species_a = (
        mgeom.radii if mgeom.radii is not None else (None,) * len(mgeom.geoms)
    )
    return tuple(
        lanczos.make_noise_preconditioner(
            g.ref_cfg, a if a_s is None else a_s, eta, dtype)
        for g, a_s in zip(mgeom.geoms, species_a)
    )


def m_half_w_precond_multi(mob_apply_multi, opses, npcs, keys,
                           iters: int = 10, axis_name=None):
    """Preconditioned M^{1/2}W draws on the mixture blob space.

    Same factor trick as the single-species path (noise = R̃L·G^{1/2}W with
    G = C^{-1/2}MC^{-ᵀ/2}): the per-species factors transform each species'
    slice of the Lanczos vectors in the body frame, while the G matvec
    couples everything through one fused k-RHS wall mobility sweep over the
    concatenated blob array.  ``keys`` is a sequence of k PRNG keys (the
    midpoint stepper passes two).  Returns a tuple of k (N_total, 3) draws.
    """
    pos = concat_positions(opses)
    # far-field operators: bind the lattice/neighbor setup outside the
    # Lanczos while body (no-op otherwise)
    mob_apply_multi = saddle_mod.hoist_positions(mob_apply_multi, pos)
    dtype = pos.dtype
    n_total = pos.shape[0]
    k = len(keys)

    def to_world(vk):  # (k, 3N) -> (k, N, 3): per species R̃ L^{-T} v
        parts = []
        start = 0
        for o, (L, L_inv) in zip(opses, npcs):
            B, n = o.offsets.shape[0], o.offsets.shape[1]
            vb = vk[:, start : start + 3 * B * n].reshape(k, B, 3 * n)
            u = jnp.einsum("qp,kbq->kbp", L_inv, vb).reshape(k, B, n, 3)
            parts.append(jnp.einsum("bij,kbnj->kbni", o.rot, u).reshape(k, B * n, 3))
            start += 3 * B * n
        return jnp.concatenate(parts, axis=1)

    def from_world(xk):  # (k, N, 3) -> (k, 3N): per species L^{-1} R̃ᵀ x
        parts = []
        start = 0
        for o, (L, L_inv) in zip(opses, npcs):
            B, n = o.offsets.shape[0], o.offsets.shape[1]
            xb = xk[:, start : start + B * n].reshape(k, B, n, 3)
            u = jnp.einsum("bji,kbnj->kbni", o.rot, xb).reshape(k, B, 3 * n)
            parts.append(jnp.einsum("pq,kbq->kbp", L_inv, u).reshape(k, -1))
            start += B * n
        return jnp.concatenate(parts, axis=1)

    def mv(vk):  # G v
        return from_world(mob_apply_multi(to_world(vk), pos))

    w = jnp.stack(
        [jax.random.normal(kk, (3 * n_total,), dtype=dtype) for kk in keys]
    )
    g = lanczos.sqrt_matvec_batched(mv, w, iters=iters,
                                    axis_name=axis_name)
    out = []
    start = 0
    for o, (L, _) in zip(opses, npcs):  # noise slice = R̃ L g_s
        B, n = o.offsets.shape[0], o.offsets.shape[1]
        gb = g[:, start : start + 3 * B * n].reshape(k, B, 3 * n)
        lg = jnp.einsum("pq,kbq->kbp", L, gb).reshape(k, B, n, 3)
        out.append(jnp.einsum("bij,kbnj->kbni", o.rot, lg).reshape(k, B * n, 3))
        start += 3 * B * n
    out = jnp.concatenate(out, axis=1)
    return tuple(out[i] for i in range(k))


def apply_pc_multi(pcs, slip, Fs, opses, cfg: SimulationConfig):
    if isinstance(pcs, RasMultiPC):
        return _apply_pc_ras_multi(pcs, slip, Fs, opses, cfg)
    parts = split_blobs(slip.reshape(-1, 3), opses)
    lams, Us = [], []
    for pc, p, F, o in zip(pcs, parts, Fs, opses):
        lam_s, U_s = saddle_mod.apply_pc(pc, p, F, o, cfg)
        lams.append(lam_s.reshape(-1, 3))
        Us.append(U_s)
    return jnp.concatenate(lams, axis=0), tuple(Us)


class MultiSolveResult(NamedTuple):
    lam: jax.Array            # (N_total, 3)
    Us: Tuple[jax.Array, ...] # per-species (B_s, 6)
    residual: jax.Array
    iters: jax.Array = None   # inner GMRES iterations executed


def _flatten(lam, Us):
    return jnp.concatenate([lam.reshape(-1)] + [U.reshape(-1) for U in Us])


def _unflatten(x, opses):
    counts = _blob_counts(opses)
    nb = 3 * sum(counts)
    lam = x[:nb].reshape(-1, 3)
    Us = []
    start = nb
    for o in opses:
        b = o.ktkinv.shape[0]
        Us.append(x[start : start + 6 * b].reshape(b, 6))
        start += 6 * b
    return lam, tuple(Us)


def solve_saddle_multi(
    mgeom: MultiGeometry,
    cfg: SimulationConfig,
    states: Sequence[BodyState],
    slip,
    forces,
    mob_apply=None,
    opses=None,
    x0=None,
    pcs=None,
    axis_name=None,
) -> MultiSolveResult:
    """Preconditioned GMRES solve of the mixed saddle system.

    slip: (N_total, 3) or None; forces: tuple of (B_s, 6).
    x0: optional (λ, Us) Krylov warm start (a previous MultiSolveResult's
    fields); pcs: optional prebuilt per-species PC tuple (lagged-PC reuse).
    axis_name: distributed mode — states/slip/forces are LOCAL species
    shards inside ``shard_map`` (every species' body count divisible by
    the mesh), ``mob_apply`` a local-view operator, and the Krylov
    recurrences psum over the axis.
    """
    if opses is None:
        opses = geometry_ops_multi(mgeom, states)
    if mob_apply is None:
        mob_apply = _mob_fns(mgeom, opses, cfg)[0]
    # far-field operators: bind the kernel-lattice + sort/neighbor setup
    # once per solve, outside the GMRES while body (no-op otherwise)
    mob_apply = saddle_mod.hoist_positions(mob_apply, concat_positions(opses))
    dtype = opses[0].positions.dtype
    n_total = sum(_blob_counts(opses))
    if slip is None:
        slip = jnp.zeros((n_total, 3), dtype)
    if pcs is None:
        pcs = build_pc_multi(opses, cfg, species_a=mgeom.species_a(cfg))
    if (cfg.pc_mode == "ras" and axis_name is None
            and not isinstance(pcs, RasMultiPC)):
        # attach the mixture RAS halo coupling at THIS solve's geometry
        # (the per-species static tier arrives prebuilt from the scan
        # drivers, exactly like the single-species hook in
        # solvers.solve_saddle).  Distributed mixtures keep the static
        # per-species PC — the coupled Ñ gather is single-device for now.
        pcs = build_pc_ras_multi(opses, cfg, static_pcs=pcs,
                                 species_a=mgeom.species_a(cfg))

    def pc_flat(s, fs):
        lam, Us = apply_pc_multi(pcs, s, fs, opses, cfg)
        return _flatten(lam, Us)

    def matvec(x):
        lam, Us = _unflatten(x, opses)
        s, fs = apply_saddle_multi(lam, Us, opses, cfg, mob_apply)
        return pc_flat(s, fs)

    b = pc_flat(jnp.asarray(slip, dtype).reshape(-1, 3), tuple(jnp.asarray(f, dtype) for f in forces))
    if x0 is not None:
        x0 = _flatten(x0[0], x0[1])
    max_restarts = max(1, -(-cfg.gmres_maxiter // cfg.gmres_restart))
    result = gmres_mod.gmres(
        matvec, b, x0=x0, tol=cfg.gmres_tol, restart=cfg.gmres_restart,
        max_restarts=max_restarts, axis_name=axis_name,
    )
    lam, Us = _unflatten(result.x, opses)
    return MultiSolveResult(
        lam=lam, Us=Us, residual=result.residual, iters=result.iters
    )


def n_rfd_exact_multi(
    mgeom: MultiGeometry,
    cfg: SimulationConfig,
    states: Sequence[BodyState],
    key,
    mob_apply=None,
    pcs=None,
    axis_name=None,
):
    """Mixture analogue of :func:`rigid_body_light_tpu.ops.rfd.n_rfd_exact`:
    body-space divergence drift ∂·N per species via centered RFD on the
    solved mixture body mobility (two extra mixture saddle solves).

    Returns a tuple of per-species (B_s, 6) arrays (multiply by kBT at the
    call site).  δ is floored at 1e-2 in float32 (the difference of two
    GMRES solutions must sit above solver-tolerance noise — VALIDATION.md).
    axis_name: distributed mode — states are LOCAL species shards, the
    inner mixture solves psum over the axis (see
    :func:`rigid_body_light_tpu.ops.rfd.n_rfd_exact`).
    """
    dtype = states[0].X.dtype
    keys = jax.random.split(key, len(states))
    ws = tuple(
        jax.random.normal(k, (s.X.shape[0], 6), dtype=dtype)
        for k, s in zip(keys, states)
    )
    delta_f = cfg.rfd_delta
    if dtype == jnp.float32:
        delta_f = max(delta_f, 1.0e-2)
    delta = jnp.asarray(delta_f, dtype)

    def n_dot_w(sign):
        displaced = tuple(
            BodyState(*kin.update_X_Q(s.X, s.Q, sign * (delta / 2.0) * w))
            for s, w in zip(states, ws)
        )
        res = solve_saddle_multi(
            mgeom, cfg, displaced, None, ws, mob_apply=mob_apply, pcs=pcs,
            axis_name=axis_name,
        )
        return res.Us

    up = n_dot_w(1.0)
    um = n_dot_w(-1.0)
    return tuple((p - m) / delta for p, m in zip(up, um))


def stochastic_step_multi(
    mgeom: MultiGeometry,
    cfg: SimulationConfig,
    states: Sequence[BodyState],
    key,
    forces,
    slip=None,
    mob_apply=None,
    x0=None,
    pcs=None,
    noise_pcs=None,
    axis_name=None,
    mob_multi=None,
):
    """One fluctuating BD step of the mixture — full parity with the
    single-species :func:`rigid_body_light_tpu.dynamics.stochastic_step`:
    midpoint slip (default) and ``em_exact`` drift modes, fused 2-RHS
    Lanczos noise when ``split_rand``, factor-preconditioned noise when
    ``cfg.lanczos_precond`` (per-species body-frame factors, ``noise_pcs``),
    Krylov warm starts (``x0``) and prebuilt/lagged preconditioners
    (``pcs``).
    """
    default_mob = mob_apply is None
    if axis_name is not None:
        if default_mob:
            raise ValueError(
                "distributed stochastic_step_multi needs an explicit local "
                "mob_apply (parallel.ring_mobility_apply_fn with the "
                "mixture's radii)")
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    opses = geometry_ops_multi(mgeom, states)
    if default_mob:
        mob_apply = _mob_fns(mgeom, opses, cfg)[0]
    # far-field backend: share one kernel-lattice build across the step's
    # noise draw, RFD applies and corrector solve (no-op otherwise)
    mob_apply = saddle_mod.pin_geometry(mob_apply, concat_positions(opses))
    dtype = opses[0].positions.dtype
    n_total = sum(_blob_counts(opses))
    if slip is None:
        slip = jnp.zeros((n_total, 3), dtype)

    kBT = cfg.kBT
    drift_Us = None
    if kBT > 0.0:
        k1, k2, k3 = jax.random.split(key, 3)
        pos = concat_positions(opses)
        # em_exact has no corrector — a single sqrt(2kBT/dt) draw has the
        # same distribution at half the Lanczos cost (see stepper.py)
        use_split = cfg.split_rand and cfg.drift_mode != "em_exact"
        if cfg.lanczos_precond and noise_pcs is None:
            # per-species body-frame factors (trace-time constants; run_bd_multi
            # precomputes and threads these through the scan)
            noise_pcs = make_noise_preconditioner_multi(mgeom, cfg.a, cfg.eta, dtype)
        if mob_multi is None:
            if hasattr(mob_apply, "prepare"):
                # the far-field apply is ndim-polymorphic — reuse the
                # geometry-pinned callable instead of building a second
                # operator (and a second kernel lattice)
                mob_multi = mob_apply
            elif default_mob:
                mob_multi = _mob_fns(mgeom, opses, cfg)[1]
            else:
                def mob_multi(xk, r):
                    return jnp.stack([mob_apply(x, r) for x in xk])
        if use_split:
            if cfg.lanczos_precond:
                mhw1, mhw2 = m_half_w_precond_multi(
                    mob_multi, opses, noise_pcs, (k1, k2),
                    iters=cfg.lanczos_iters, axis_name=axis_name
                )
            elif default_mob or mob_multi is not None:
                # fused 2-RHS Lanczos: both recurrences share one pair-field sweep
                mhw1, mhw2 = lanczos.m_half_w_pair(
                    mob_multi, pos, k1, k2, iters=cfg.lanczos_iters,
                    axis_name=axis_name
                )
            else:
                mhw1 = lanczos.m_half_w(mob_apply, pos, k1, iters=cfg.lanczos_iters)
                mhw2 = lanczos.m_half_w(mob_apply, pos, k2, iters=cfg.lanczos_iters)
            c1 = 2.0 * jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            c2 = jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            bi = c2 * (mhw1 - mhw2)
        else:
            if cfg.lanczos_precond:
                (mhw1,) = m_half_w_precond_multi(
                    mob_multi, opses, noise_pcs, (k1,),
                    iters=cfg.lanczos_iters, axis_name=axis_name
                )
            else:
                mhw1 = lanczos.m_half_w(mob_apply, pos, k1, iters=cfg.lanczos_iters)
            c1 = jnp.sqrt(jnp.asarray(2.0 * kBT / cfg.dt, dtype))
            bi = c1 * mhw1

        if cfg.drift_mode == "em_exact":
            # plain EM: solve at q^n, add the exact body-space divergence
            # drift kBT·∂·N afterwards — no midpoint kick
            slip_eff = slip - bi
            opses_solve = opses
            drift_Us = tuple(
                jnp.asarray(kBT, dtype) * d
                for d in n_rfd_exact_multi(
                    mgeom, cfg, states, k3, mob_apply=mob_apply, pcs=pcs,
                    axis_name=axis_name,
                )
            )
        else:
            # drift: centered RFD of M along the rigid direction u = K⁺W
            w = jax.random.normal(k3, (n_total, 3), dtype=dtype)
            w_parts = split_blobs(w, opses)
            us = tuple(
                kin.Kinv_dot(p.reshape(o.offsets.shape), o.offsets, o.ktkinv)
                for p, o in zip(w_parts, opses)
            )
            delta = jnp.asarray(cfg.rfd_delta, dtype)
            r_p = _displaced_concat(mgeom, states, us, delta / 2.0)
            r_m = _displaced_concat(mgeom, states, us, -delta / 2.0)
            drift = jnp.asarray(kBT, dtype) * (
                mob_apply(w, r_p) - mob_apply(w, r_m)
            ) / delta
            slip_eff = slip - (drift + bi)

            # predictor half-kick per species (same below-wall rejection as
            # commits — see _commit_species)
            mh_parts = split_blobs(c1 * mhw1, opses)
            half_states = []
            for g, st, p, o in zip(mgeom.geoms, states, mh_parts, opses):
                u_half = kin.Kinv_dot(p.reshape(o.offsets.shape), o.offsets, o.ktkinv)
                half_states.append(_commit_species(g, cfg, st, (cfg.dt / 2.0) * u_half))
            opses_solve = geometry_ops_multi(mgeom, half_states)
    else:
        slip_eff = slip
        opses_solve = opses

    res = solve_saddle_multi(
        mgeom, cfg, states, slip_eff, forces, mob_apply=mob_apply,
        opses=opses_solve, x0=x0, pcs=pcs, axis_name=axis_name,
    )
    Us_total = (
        res.Us if drift_Us is None
        else tuple(U + d for U, d in zip(res.Us, drift_Us))
    )
    ok = res.residual < jnp.asarray(cfg.max_step_residual, dtype)
    new_states = []
    for g, st, U in zip(mgeom.geoms, states, Us_total):
        dU = jnp.where(ok, U, 0.0) * jnp.asarray(cfg.dt, dtype)
        new_states.append(_commit_species(g, cfg, st, dU))
    return tuple(new_states), res._replace(Us=Us_total)


def _commit_species(geom, cfg: SimulationConfig, state: BodyState, dU):
    """Advance one species with the shared move-rejection guards."""
    from rigid_body_light_tpu.dynamics.stepper import _commit

    return _commit(geom, cfg, state, dU)


def run_bd_multi(
    mgeom: MultiGeometry,
    cfg: SimulationConfig,
    states: Sequence[BodyState],
    key,
    n_steps: int,
    force_fn=None,
    slip_fn=None,
    mob_apply=None,
    save_every: int = 1,
    axis_name=None,
    mob_multi=None,
):
    """Whole mixture BD trajectory as one ``lax.scan`` — the multi-species
    analogue of :func:`rigid_body_light_tpu.dynamics.run_bd`, with the same
    Krylov warm-start threading and lagged-PC amortization (``pc_refresh``).

    force_fn: (states, step) → tuple of per-species (B_s, 6) (default 0).
    slip_fn: (states, step) → (N_total, 3) active slip (default 0).
    Returns (final_states, trajectory) with per-species stacked snapshots:
    trajectory["X"][s] has shape (n_saved, B_s, 3).
    """
    from jax import lax

    states = tuple(states)
    dtype = states[0].X.dtype
    if cfg.box is not None:
        from rigid_body_light_tpu.utils.validation import check_box_geometry

        for g in mgeom.geoms:
            check_box_geometry(cfg.box, g.ref_cfg, cfg.a)
    sizes = tuple(s.X.shape[0] for s in states)
    blob_counts = tuple(
        g.ref_cfg.shape[0] * b for g, b in zip(mgeom.geoms, sizes)
    )
    if force_fn is None:
        def force_fn(ss, i):
            return tuple(jnp.zeros((b, 6), dtype) for b in sizes)

    # block_free PC constants are configuration-independent — build once,
    # never rebuild (same rule as dynamics.run_bd)
    pc_mode = cfg.pc_mode or ("block" if cfg.block_diag_pc else "diag")
    static_pc = pc_mode == "block_free"
    lagged_pc = cfg.pc_refresh > 1 and not static_pc
    noise_pcs = (
        make_noise_preconditioner_multi(mgeom, cfg.a, cfg.eta, dtype)
        if (cfg.lanczos_precond and cfg.kBT > 0.0) else None
    )

    def body(carry, i):
        ss, k, x_prev, pcs_prev = carry
        k, sub = jax.random.split(k)
        forces = force_fn(ss, i)
        slip = slip_fn(ss, i) if slip_fn is not None else None
        if static_pc:
            pcs = pcs_prev
        elif lagged_pc:
            pcs = lax.cond(
                i % cfg.pc_refresh == 0,
                lambda _: build_pc_multi(geometry_ops_multi(mgeom, ss), cfg,
                                         species_a=mgeom.species_a(cfg)),
                lambda _: pcs_prev,
                None,
            )
        else:
            pcs = None
        ss_new, res = stochastic_step_multi(
            mgeom, cfg, ss, sub, forces, slip=slip, mob_apply=mob_apply,
            x0=x_prev, pcs=pcs, noise_pcs=noise_pcs, axis_name=axis_name,
            mob_multi=mob_multi,
        )
        out = (
            tuple(s.X for s in ss_new),
            tuple(s.Q for s in ss_new),
            res.residual,
            res.iters,
        )
        # a failed solve's (λ, Us) would poison the next warm start
        solve_ok = res.residual < cfg.max_step_residual
        x_carry = (
            jnp.where(solve_ok, res.lam, 0.0),
            tuple(jnp.where(solve_ok, U, 0.0) for U in res.Us),
        )
        return (ss_new, k, x_carry, pcs if lagged_pc else pcs_prev), out

    x_init = (
        jnp.zeros((sum(blob_counts), 3), dtype),
        tuple(jnp.zeros((b, 6), dtype) for b in sizes),
    )
    pcs_init = (
        build_pc_multi(geometry_ops_multi(mgeom, states), cfg,
                       species_a=mgeom.species_a(cfg))
        if (lagged_pc or static_pc) else None
    )
    (final, _, _, _), (Xs, Qs, residuals, iters) = lax.scan(
        body, (states, key, x_init, pcs_init), jnp.arange(n_steps)
    )
    keep = slice(save_every - 1, None, save_every)
    return final, {
        "X": tuple(x[keep] for x in Xs),
        "Q": tuple(q[keep] for q in Qs),
        "residual": residuals[keep],
        "iters": iters[keep],
    }


def _displaced_concat(mgeom, states, us, scale):
    parts = []
    for g, st, u in zip(mgeom.geoms, states, us):
        X, Q = kin.update_X_Q(st.X, st.Q, scale * u)
        parts.append(kin.blob_positions(g, X, Q).reshape(-1, 3))
    return jnp.concatenate(parts, axis=0)
