"""Random-finite-difference (RFD) stochastic drift terms.

The Brownian velocity kBT·∂/∂x·M enters the midpoint scheme as a centered
random finite difference (Delong et al. 2014; Sprinkle et al. 2017 —
PAPERS.md).  Parity targets: reference ``M_RFD`` (``c_rigid_obj.cpp:769-796``)
and ``KTinv_RFD`` (``:743-767``), which are compiled-but-unbound internals.
All displacement/evaluation steps here are jitted and use explicit PRNG keys.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.state import BodyState


def _displaced_positions(geom, state: BodyState, dU):
    """Blob positions of the configuration displaced by dU (B, 6)."""
    X, Q = kin.update_X_Q(state.X, state.Q, dU)
    return kin.blob_positions(geom, X, Q)


def m_rfd(
    geom: kin.RefGeometry,
    state: BodyState,
    ops: saddle_mod.GeometryOps,
    cfg: SimulationConfig,
    key,
    mob_apply: Callable = None,
):
    """Drift term (1/δ)[M(q + δu/2) − M(q − δu/2)]·W with u = K⁺W.

    W ~ N(0, I) on blob space; returns (N, 3).  Parity: reference ``M_RFD``
    (``c_rigid_obj.cpp:769-796``) — the rigid direction is u = K⁺W so the
    difference approximates the divergence of the *rigid-projected* mobility.
    """
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    B, n, _ = ops.offsets.shape
    dtype = ops.positions.dtype
    w = jax.random.normal(key, (B, n, 3), dtype=dtype)
    u = kin.Kinv_dot(w, ops.offsets, ops.ktkinv)  # (B, 6)
    delta = jnp.asarray(cfg.rfd_delta, dtype)
    dU = (delta / 2.0) * u
    r_p = _displaced_positions(geom, state, dU).reshape(-1, 3)
    r_m = _displaced_positions(geom, state, -dU).reshape(-1, 3)
    w_flat = w.reshape(-1, 3)
    mp = mob_apply(w_flat, r_p)
    mm = mob_apply(w_flat, r_m)
    return (mp - mm) / delta


def m_rfd_from_u(
    geom: kin.RefGeometry,
    state: BodyState,
    cfg: SimulationConfig,
    u,
    w,
    mob_apply: Callable = None,
    delta: float = 1.0e-3,
):
    """(1/δ)[M(q+δu/2) − M(q−δu/2)]·w for caller-supplied direction u (B, 6)
    and blob vector w (N, 3).  Parity: reference ``M_RFD_from_U``
    (``c_rigid_obj.cpp:818-840``, unexposed)."""
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    dtype = state.X.dtype
    d = jnp.asarray(delta, dtype)
    dU = (d / 2.0) * jnp.asarray(u, dtype)
    r_p = _displaced_positions(geom, state, dU).reshape(-1, 3)
    r_m = _displaced_positions(geom, state, -dU).reshape(-1, 3)
    w = jnp.asarray(w, dtype).reshape(-1, 3)
    return (mob_apply(w, r_p) - mob_apply(w, r_m)) / d


def kt_rfd_from_u(
    geom: kin.RefGeometry,
    state: BodyState,
    cfg: SimulationConfig,
    u,
    w,
    delta: float = 1.0e-3,
):
    """(1/δ)[Kᵀ(q+δu/2) − Kᵀ(q−δu/2)]·w, directions supplied by the caller.

    Parity: reference ``KT_RFD_from_U`` (``c_rigid_obj.cpp:842-863``,
    unexposed).  Returns (B, 6).
    """
    dtype = state.X.dtype
    d = jnp.asarray(delta, dtype)
    dU = (d / 2.0) * jnp.asarray(u, dtype)
    w = jnp.asarray(w, dtype)

    def kt_at(dU_signed):
        X, Q = kin.update_X_Q(state.X, state.Q, dU_signed)
        offsets = kin.blob_offsets(geom, Q)
        return kin.KT_dot(w.reshape(offsets.shape), offsets)

    return (kt_at(dU) - kt_at(-dU)) / d


def n_rfd_exact(
    geom: kin.RefGeometry,
    state: BodyState,
    cfg: SimulationConfig,
    key,
    mob_apply: Callable = None,
    pc=None,
    axis_name=None,
):
    """Direct body-space divergence drift kBT·∂·N via centered RFD on the
    *solved* body mobility N(q) = (KᵀM⁻¹K)⁻¹:

        ∂·N ≈ (1/δ)[N(q + δW/2)·W − N(q − δW/2)·W],   W ~ N(0, I) on (B, 6).

    Costs two extra saddle solves per step but needs no scheme-level
    cancellation arguments — the textbook-correct Itô drift for the plain
    Euler–Maruyama stepper (``drift_mode='em_exact'``).  Returns (B, 6)
    (multiply by kBT at the call site).

    axis_name: distributed mode — ``state`` is the LOCAL body shard inside
    ``shard_map``, ``mob_apply`` the local-view operator, ``key`` already
    device-folded by the stepper (RFD directions are per-body, so
    independent per-shard draws are the correct distribution); the two
    inner saddle solves psum their Krylov recurrences over the axis.

    Precision note (VALIDATION.md): this differences two GMRES *solutions*;
    in float32 the difference (~δ·∂N·W) must sit above solver-tolerance
    noise, so δ is floored at 1e-2 there (measured: δ=1e-4 diverges, δ=1e-2
    is unbiased).  The default midpoint scheme differences raw matvecs and
    has no such constraint.
    """
    from rigid_body_light_tpu.ops import solvers

    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    B = state.X.shape[0]
    n = geom.ref_cfg.shape[0]
    dtype = state.X.dtype
    w = jax.random.normal(key, (B, 6), dtype=dtype)
    delta_f = cfg.rfd_delta
    if dtype == jnp.float32:
        delta_f = max(delta_f, 1.0e-2)
    delta = jnp.asarray(delta_f, dtype)
    dU = (delta / 2.0) * w
    zero_slip = jnp.zeros((B * n, 3), dtype)

    def n_dot_w(dU_signed):
        X, Q = kin.update_X_Q(state.X, state.Q, dU_signed)
        ops = saddle_mod.geometry_ops(geom, BodyState(X=X, Q=Q))
        # a PC built at q^n is a perfectly good preconditioner at q ± δW/2
        res = solvers.solve_saddle(ops, cfg, zero_slip, w,
                                   mob_apply=mob_apply, pc=pc,
                                   axis_name=axis_name)
        return res.U

    return (n_dot_w(dU) - n_dot_w(-dU)) / delta


def kt_inv_rfd(
    geom: kin.RefGeometry,
    state: BodyState,
    ops: saddle_mod.GeometryOps,
    cfg: SimulationConfig,
    key,
):
    """Kᵀ·(1/δ)[K⁺ᵀ(q+δW/2) − K⁺ᵀ(q−δW/2)]·W with W ~ N(0,I) on body space.

    Parity: reference ``KTinv_RFD`` (``c_rigid_obj.cpp:743-767``).
    Returns (B, 6).
    """
    B = state.X.shape[0]
    dtype = state.X.dtype
    w = jax.random.normal(key, (B, 6), dtype=dtype)
    delta = jnp.asarray(cfg.rfd_delta, dtype)
    dU = (delta / 2.0) * w

    def kinvT_at(dU_signed):
        X, Q = kin.update_X_Q(state.X, state.Q, dU_signed)
        offsets = kin.blob_offsets(geom, Q)
        ktkinv = kin.ktk_inv(geom, Q)
        return kin.KinvT_dot(w, offsets, ktkinv)

    diff = (kinvT_at(dU) - kinvT_at(-dU)) / delta  # (B, n, 3)
    return kin.KT_dot(diff, ops.offsets)
