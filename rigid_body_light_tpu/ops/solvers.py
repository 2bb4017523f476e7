"""On-device Krylov solve of the rigid multiblob saddle system.

The reference ships *no* solver — it exposes operator/PC matvecs for an
external scipy GMRES driver (scipy/pyamg are deps in ``environment.yml:5-7``
but unused in-repo; every Krylov iteration crosses the Python↔C++ boundary
4 times, ``Rigid.py:73-80``).  Here the whole left-preconditioned GMRES runs
under ``jit``: the Krylov basis, the Arnoldi recurrence, the mobility matvec
and the preconditioner are one XLA computation
(:mod:`rigid_body_light_tpu.ops.gmres`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import gmres as gmres_mod
from rigid_body_light_tpu.ops import saddle as saddle_mod


class SolveResult(NamedTuple):
    lam: jax.Array       # (N, 3) constraint forces on blobs
    U: jax.Array         # (B, 6) rigid body velocities
    residual: jax.Array  # final relative residual (preconditioned system)
    iters: jax.Array = None  # inner GMRES iterations executed
    true_residual: jax.Array = None  # ‖b − A·x‖/‖b‖ on the UNpreconditioned
                                     # saddle system (only when requested —
                                     # costs one extra mobility matvec)


def solve_saddle(
    ops: saddle_mod.GeometryOps,
    cfg: SimulationConfig,
    slip,
    force,
    pc: saddle_mod.PCData = None,
    x0=None,
    mob_apply: Callable = None,
    true_residual: bool = False,
    axis_name=None,
) -> SolveResult:
    """Solve [M −K; Kᵀ 0][λ; U] = [slip; F] with preconditioned GMRES.

    true_residual=True additionally reports the relative residual of the
    *unpreconditioned* saddle system (one extra mobility matvec) — the
    convergence test itself stays on the preconditioned residual (scipy
    convention, matching the external drivers the reference implies).

    axis_name: distributed mode — ``ops``/``slip``/``force`` are the LOCAL
    body shard inside ``shard_map`` (bodies sharded over the mesh),
    ``mob_apply`` must be the ring-pipelined local sweep, and all Krylov
    reductions psum over the axis.  No device ever materializes a global
    (N, 3) array.

    slip: (N, 3) prescribed slip on blobs (RHS upper block).
    force: (B, 6) applied body force/torque; the RHS lower block is +force,
      so that with slip=0 the solve returns U = (KᵀM⁻¹K)⁻¹·F — body velocity
      along the applied force.  (The reference's unbound RHS builder negates
      its Force argument into the RHS, ``c_rigid_obj.cpp:969-974``; its
      external driver's convention is unknowable, so this framework fixes
      the physical one.)
    """
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    # far-field operators: build kernel lattices + sort/neighbor setup
    # once HERE (outside the GMRES while body) instead of per iteration
    mob_apply = saddle_mod.hoist_positions(mob_apply, ops.flat_positions)
    if pc is None:
        pc = saddle_mod.build_pc(ops, cfg)
    if cfg.pc_mode == "ras" and pc.halo_w is None:
        # attach the configuration-dependent RAS halo coupling at THIS
        # solve's geometry (the static block_free tier arrives prebuilt
        # from the scan drivers; standalone calls built it just above).
        # Distributed (axis_name): halo clusters cross body shards — the
        # build gathers positions once and keeps per-local-body factors
        # (see build_pc_ras docstring).
        pc = saddle_mod.build_pc_ras(ops, cfg, static_pc=pc,
                                     axis_name=axis_name)
    dtype = ops.positions.dtype
    B, n, _ = ops.offsets.shape
    nb = 3 * B * n
    slip = jnp.asarray(slip, dtype).reshape(-1, 3)
    force = jnp.asarray(force, dtype).reshape(-1, 6)

    def pc_apply_flat(s, f):
        lam, U = saddle_mod.apply_pc(pc, s, f, ops, cfg,
                                     axis_name=axis_name)
        return jnp.concatenate([lam.reshape(-1), U.reshape(-1)])

    def matvec(x):
        lam = x[:nb].reshape(-1, 3)
        U = x[nb:].reshape(-1, 6)
        s, f = saddle_mod.apply_saddle(lam, U, ops, cfg, mob_apply)
        return pc_apply_flat(s, f)

    b = pc_apply_flat(slip, force)
    if x0 is not None:
        x0 = jnp.concatenate([x0[0].reshape(-1), x0[1].reshape(-1)])

    max_restarts = max(1, -(-cfg.gmres_maxiter // cfg.gmres_restart))
    result = gmres_mod.gmres(
        matvec,
        b,
        x0=x0,
        tol=cfg.gmres_tol,
        restart=cfg.gmres_restart,
        max_restarts=max_restarts,
        axis_name=axis_name,
    )
    lam = result.x[:nb].reshape(-1, 3)
    U = result.x[nb:].reshape(-1, 6)
    tr = None
    if true_residual:
        s, f = saddle_mod.apply_saddle(lam, U, ops, cfg, mob_apply)
        rvec = jnp.concatenate([(slip - s).reshape(-1), (force - f).reshape(-1)])
        bvec = jnp.concatenate([slip.reshape(-1), force.reshape(-1)])
        rr = jnp.sum(rvec * rvec)
        bb = jnp.sum(bvec * bvec)
        if axis_name is not None:
            from jax import lax

            rr = lax.psum(rr, axis_name)
            bb = lax.psum(bb, axis_name)
        tr = jnp.sqrt(rr) / jnp.maximum(jnp.sqrt(bb),
                                        jnp.asarray(1e-30, dtype))
    return SolveResult(
        lam=lam, U=U, residual=result.residual, iters=result.iters,
        true_residual=tr,
    )


def make_differentiable_solver(cfg: SimulationConfig) -> Callable:
    """Build a *differentiable* mobility solve (ops, slip, force) → (λ, U).

    The forward pass is the regular preconditioned GMRES (whose ``while_loop``
    is not reverse-differentiable); gradients come from the implicit-function
    theorem instead: with A x = b,

        x̄ ⊦ solve Aᵀ y = x̄,   b̄ = y,   θ̄ = vjp_θ[A(θ)·x](−y).

    The saddle operator satisfies Aᵀ = S·A·S with S = diag(I, −I) on
    (λ, U), so the adjoint solve is the SAME solver on sign-flipped blocks —
    no transposed machinery needed.  The operator-vjp differentiates the
    regular (Pallas on TPU) mobility path: the kernel carries a custom VJP
    whose force cotangent is one more kernel sweep (symmetry) and whose
    position cotangent falls back to the XLA path internally
    (``rpy_pallas.mobility_apply``).

    Differentiable inputs: ``ops`` (positions/orientations via GeometryOps —
    chain through ``geometry_ops`` for ∂/∂X, ∂/∂Q), ``slip`` and ``force``.
    Nothing like this exists in the reference (finite differences over the
    whole C++ solve would be the only option).
    """
    @jax.custom_vjp
    def solve(ops, slip, force):
        res = solve_saddle(ops, cfg, slip, force)
        return res.lam, res.U

    def fwd(ops, slip, force):
        lam, U = solve(ops, slip, force)
        return (lam, U), (ops, lam, U)

    def bwd(residuals, cotangents):
        ops, lam, U = residuals
        lam_bar, U_bar = cotangents
        # adjoint solve via the S·A·S identity
        adj = solve_saddle(ops, cfg, lam_bar, -U_bar)
        y = (adj.lam, -adj.U)
        slip_bar, force_bar = y

        def operator(o):
            s, f = saddle_mod.apply_saddle(
                lam, U, o, cfg, saddle_mod.mobility_apply_fn(cfg)
            )
            return s, f

        _, op_vjp = jax.vjp(operator, ops)
        (ops_bar,) = op_vjp((-y[0], -y[1]))
        return ops_bar, slip_bar, force_bar

    solve.defvjp(fwd, bwd)
    return solve


def solve_resistance(
    ops: saddle_mod.GeometryOps,
    cfg: SimulationConfig,
    U,
    slip=None,
    mob_apply: Callable = None,
):
    """Resistance problem: given body velocities U (B, 6), find the applied
    force/torque F = Kᵀλ with M·λ = K·U + slip.

    The reference exposes only the operators for this; here it is a full
    on-device solve: the blob-space system M·λ = rhs is SPD → unpreconditioned
    GMRES on M alone (M is well-conditioned after damping).  Returns
    (F (B, 6), λ (N, 3), residual).
    """
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    mob_apply = saddle_mod.hoist_positions(mob_apply, ops.flat_positions)
    from rigid_body_light_tpu.ops import kinematics as kin

    dtype = ops.positions.dtype
    B, n, _ = ops.offsets.shape
    U = jnp.asarray(U, dtype).reshape(-1, 6)
    rhs = kin.K_dot(U, ops.offsets).reshape(-1, 3)
    if slip is not None:
        rhs = rhs + jnp.asarray(slip, dtype).reshape(-1, 3)

    pos = ops.flat_positions

    def matvec(x):
        return mob_apply(x.reshape(-1, 3), pos).reshape(-1)

    max_restarts = max(1, -(-cfg.gmres_maxiter // cfg.gmres_restart))
    result = gmres_mod.gmres(
        matvec,
        rhs.reshape(-1),
        tol=cfg.gmres_tol,
        restart=cfg.gmres_restart,
        max_restarts=max_restarts,
    )
    lam = result.x.reshape(B, n, 3)
    F = kin.KT_dot(lam, ops.offsets)
    return F, lam.reshape(-1, 3), result.residual
