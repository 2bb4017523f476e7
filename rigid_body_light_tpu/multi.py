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

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import gmres as gmres_mod
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.state import BodyState


class MultiGeometry(NamedTuple):
    """Static geometry of an S-species mixture (pytree of RefGeometry)."""

    geoms: Tuple[kin.RefGeometry, ...]

    @classmethod
    def create(cls, ref_cfgs: Sequence, dtype=jnp.float32) -> "MultiGeometry":
        return cls(geoms=tuple(kin.make_ref_geometry(c, dtype=dtype) for c in ref_cfgs))

    @property
    def n_species(self) -> int:
        return len(self.geoms)


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


def build_pc_multi(opses, cfg: SimulationConfig):
    return tuple(saddle_mod.build_pc(o, cfg) for o in opses)


def apply_pc_multi(pcs, slip, Fs, opses, cfg: SimulationConfig):
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
) -> MultiSolveResult:
    """Preconditioned GMRES solve of the mixed saddle system.

    slip: (N_total, 3) or None; forces: tuple of (B_s, 6).
    """
    if opses is None:
        opses = geometry_ops_multi(mgeom, states)
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    dtype = opses[0].positions.dtype
    n_total = sum(_blob_counts(opses))
    if slip is None:
        slip = jnp.zeros((n_total, 3), dtype)
    pcs = build_pc_multi(opses, cfg)

    def pc_flat(s, fs):
        lam, Us = apply_pc_multi(pcs, s, fs, opses, cfg)
        return _flatten(lam, Us)

    def matvec(x):
        lam, Us = _unflatten(x, opses)
        s, fs = apply_saddle_multi(lam, Us, opses, cfg, mob_apply)
        return pc_flat(s, fs)

    b = pc_flat(jnp.asarray(slip, dtype).reshape(-1, 3), tuple(jnp.asarray(f, dtype) for f in forces))
    max_restarts = max(1, -(-cfg.gmres_maxiter // cfg.gmres_restart))
    result = gmres_mod.gmres(
        matvec, b, tol=cfg.gmres_tol, restart=cfg.gmres_restart,
        max_restarts=max_restarts,
    )
    lam, Us = _unflatten(result.x, opses)
    return MultiSolveResult(lam=lam, Us=Us, residual=result.residual)


def stochastic_step_multi(
    mgeom: MultiGeometry,
    cfg: SimulationConfig,
    states: Sequence[BodyState],
    key,
    forces,
    slip=None,
    mob_apply=None,
):
    """One fluctuating BD step of the mixture (midpoint slip scheme —
    mirrors :func:`rigid_body_light_tpu.dynamics.stochastic_step`).

    Limitations vs the single-species stepper (round-1): only the midpoint
    slip scheme is implemented (``drift_mode='em_exact'`` raises), and the
    fused 2-RHS Lanczos / Krylov warm starts / lagged PC are not wired in.
    """
    if cfg.drift_mode not in ("", "midpoint_slip"):
        raise NotImplementedError(
            "stochastic_step_multi implements only the midpoint slip scheme; "
            f"drift_mode={cfg.drift_mode!r} is unsupported for mixtures"
        )
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    opses = geometry_ops_multi(mgeom, states)
    dtype = opses[0].positions.dtype
    n_total = sum(_blob_counts(opses))
    if slip is None:
        slip = jnp.zeros((n_total, 3), dtype)

    kBT = cfg.kBT
    if kBT > 0.0:
        k1, k2, k3 = jax.random.split(key, 3)
        pos = concat_positions(opses)
        mhw1 = lanczos.m_half_w(mob_apply, pos, k1, iters=cfg.lanczos_iters)
        if cfg.split_rand:
            mhw2 = lanczos.m_half_w(mob_apply, pos, k2, iters=cfg.lanczos_iters)
            c1 = 2.0 * jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            c2 = jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            bi = c2 * (mhw1 - mhw2)
        else:
            c1 = jnp.sqrt(jnp.asarray(2.0 * kBT / cfg.dt, dtype))
            c2 = c1
            bi = c2 * mhw1

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
        drift = jnp.asarray(kBT, dtype) * (mob_apply(w, r_p) - mob_apply(w, r_m)) / delta
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
        mgeom, cfg, states, slip_eff, forces, mob_apply=mob_apply, opses=opses_solve
    )
    ok = res.residual < jnp.asarray(cfg.max_step_residual, dtype)
    new_states = []
    for g, st, U in zip(mgeom.geoms, states, res.Us):
        dU = jnp.where(ok, U, 0.0) * jnp.asarray(cfg.dt, dtype)
        new_states.append(_commit_species(g, cfg, st, dU))
    return tuple(new_states), res


def _commit_species(geom, cfg: SimulationConfig, state: BodyState, dU):
    """Advance one species with the shared move-rejection guards."""
    from rigid_body_light_tpu.dynamics.stepper import _commit

    return _commit(geom, cfg, state, dU)


def _displaced_concat(mgeom, states, us, scale):
    parts = []
    for g, st, u in zip(mgeom.geoms, states, us):
        X, Q = kin.update_X_Q(st.X, st.Q, scale * u)
        parts.append(kin.blob_positions(g, X, Q).reshape(-1, 3))
    return jnp.concatenate(parts, axis=0)
