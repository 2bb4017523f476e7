"""Brownian-dynamics time steppers as single jitted device programs.

The reference documents (but never exposes) an Euler–Maruyama/midpoint
stochastic scheme in ``RHS_and_Midpoint`` (``c_rigid_obj.cpp:917-976``):
Brownian increment M^{1/2}W (split into predictor/corrector parts when
``split_rand``), RFD drift kBT·∂·M, a predictor half-kick of the
configuration, then a saddle solve and commit.  The reference version has a
defect — it computes the half-step blob positions but rebuilds K at the
*unchanged* configuration (``c_rigid_obj.cpp:957-960``), so the solve never
actually happens at the midpoint.  This implementation follows the published
scheme (Sprinkle et al. 2017, "Large Scale Brownian Dynamics of Confined
Suspensions of Rigid Particles" — PAPERS.md): the corrector saddle solve is
evaluated at the half-kicked configuration.

Everything composes under ``jax.jit``/``lax.scan``: ``run_bd`` executes an
entire trajectory on device with zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.ops import rfd
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import BodyState


class StepAux(NamedTuple):
    U: jax.Array          # (B, 6) body velocities used for the commit
    lam: jax.Array        # (N, 3) constraint forces
    residual: jax.Array   # GMRES relative residual
    iters: jax.Array = None  # inner GMRES iterations executed (exact)
    noise_err: jax.Array = None  # relative Lanczos truncation estimate of the
                                 # step's M^{1/2}W draws (0 when kBT=0) — the
                                 # noise-accuracy observable, next to the
                                 # solve's residual/iters


def _commit(geom, cfg, state, dU):
    """Advance configs by dU, rejecting per-body moves that are invalid:

    - blobs sinking below the wall (the Swan–Brady mobility is undefined
      there; a body that tunnels through runs away on garbage mobilities —
      rejection is the standard multiblob practice, Balboa Usabiaga,
      Delmotte & Donev 2017), and
    - translations larger than ``max_move·a`` in one step.  A body wedged
      ~0.01a above the wall makes the damped mobility near-singular; even a
      *converged* solve then returns physically huge velocities (observed:
      Δz ≈ 10 in one dt).  Any explicit BD step moving a body many blob
      radii per dt is outside the scheme's validity no matter how it arose.
    """
    X_new, Q_new = kin.update_X_Q(state.X, state.Q, dU)
    B = state.X.shape[0]
    valid = jnp.ones((B,), bool)
    if cfg.max_move > 0:
        valid = valid & (
            jnp.linalg.norm(dU[:, 0:3], axis=-1) < cfg.max_move * cfg.a
        )
    # a huge angular velocity from a near-singular solve can pass the
    # translation and below-wall checks (a spherical shell rotates in
    # place) — bound the per-step rotation angle as well.  Gated on its own
    # config knob so disabling the translation cap keeps this guard live.
    if cfg.max_rotation > 0:
        valid = valid & (jnp.linalg.norm(dU[:, 3:6], axis=-1) < cfg.max_rotation)
    if cfg.wall and cfg.reject_below_wall:
        pos_new = kin.blob_positions(geom, X_new, Q_new)
        valid = valid & jnp.all(pos_new[:, :, 2] > 0.0, axis=1)
    X_new = jnp.where(valid[:, None], X_new, state.X)
    Q_new = jnp.where(valid[:, None], Q_new, state.Q)
    return BodyState(X=X_new, Q=Q_new)


def deterministic_step(
    geom: kin.RefGeometry,
    cfg: SimulationConfig,
    state: BodyState,
    force,
    slip=None,
    mob_apply: Callable = None,
    axis_name=None,
):
    """One deterministic step: solve the mobility problem, advance by U·dt.

    force: (B, 6) applied body force/torque; slip: optional (N, 3) active
    slip on blobs.  axis_name: distributed mode (see stochastic_step).
    Returns (new_state, StepAux).
    """
    if mob_apply is None:
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    ops = saddle_mod.geometry_ops(geom, state)
    dtype = state.X.dtype
    if slip is None:
        B, n, _ = ops.offsets.shape
        slip = jnp.zeros((B * n, 3), dtype)
    res = solvers.solve_saddle(ops, cfg, slip, force, mob_apply=mob_apply,
                               axis_name=axis_name)
    ok = res.residual < jnp.asarray(cfg.max_step_residual, dtype)
    dU = jnp.where(ok, res.U, 0.0) * jnp.asarray(cfg.dt, dtype)
    new_state = _commit(geom, cfg, state, dU)
    return new_state, StepAux(
        U=res.U, lam=res.lam, residual=res.residual, iters=res.iters
    )


def stochastic_step(
    geom: kin.RefGeometry,
    cfg: SimulationConfig,
    state: BodyState,
    key,
    force,
    slip=None,
    mob_apply: Callable = None,
    x0=None,
    pc=None,
    noise_pc=None,
    axis_name=None,
    mob_multi: Callable = None,
):
    """One fluctuating BD step (EM–midpoint with RFD drift).

    Scheme (reference intent, ``c_rigid_obj.cpp:917-976``, done correctly):
      1. Draw M^{1/2}W₁ (and W₂ if ``split_rand``) via Lanczos at q^n.
      2. Drift D = kBT·M_RFD at q^n; Brownian increment
         BI = c₂(M^{1/2}W₁ − M^{1/2}W₂)  [split]  or  c₂ M^{1/2}W₁,
         with c₁ = 2√(kBT/dt), c₂ = √(kBT/dt) (split) or c₁ = c₂ = √(2kBT/dt)
         (reference coefficients, ``c_rigid_obj.cpp:944-953``).
      3. Predictor half-kick: q^{n+1/2} = q^n advanced by (dt/2)·K⁺(c₁ M^{1/2}W₁).
      4. Corrector: solve the saddle system at q^{n+1/2} with
         RHS = [slip − (D + BI); F], giving U.
      5. Commit q^{n+1} = q^n advanced by U·dt.

    x0: optional (λ, U) warm start for the Krylov solve — pass the previous
    step's StepAux fields; configurations move little per step, so this cuts
    GMRES iterations substantially in long runs.

    axis_name: distributed mode — ``state``/``force`` are the LOCAL body
    shard inside ``shard_map`` over a device mesh, ``mob_apply`` must be the
    ring-pipelined local sweep
    (:func:`rigid_body_light_tpu.parallel.ring_mobility_apply_fn`), every
    Krylov/Lanczos reduction psums over the axis, and the PRNG key is
    folded with the device index so each shard draws independent noise.
    Kinematics, preconditioner and commits are per-body-local already.

    Returns (new_state, StepAux).
    """
    default_mob = mob_apply is None
    if default_mob:
        if axis_name is not None:
            raise ValueError(
                "distributed stochastic_step needs an explicit ring "
                "mob_apply (parallel.ring_mobility_apply_fn)")
        mob_apply = saddle_mod.mobility_apply_fn(cfg)
    if axis_name is not None:
        key = jax.random.fold_in(key, lax.axis_index(axis_name))
    dtype = state.X.dtype
    ops = saddle_mod.geometry_ops(geom, state)
    # far-field backend: build the kernel lattices ONCE per step and share
    # them across the noise draw, RFD's displaced applies, and the
    # midpoint corrector solve (their position sets differ by ≪ a cell);
    # no-op for the dense/Pallas/Ewald operators
    mob_apply = saddle_mod.pin_geometry(mob_apply, ops.flat_positions)
    B, n, _ = ops.offsets.shape
    if slip is None:
        slip = jnp.zeros((B * n, 3), dtype)

    kBT = cfg.kBT
    if kBT > 0.0:
        k1, k2, k3 = jax.random.split(key, 3)
        pos = ops.flat_positions
        # the split two-draw increment exists only to decorrelate the
        # midpoint corrector; em_exact has no corrector, and a single draw
        # of sqrt(2kBT/dt)·M^{1/2}W has the identical distribution at half
        # the Lanczos cost
        use_split = cfg.split_rand and cfg.drift_mode != "em_exact"
        if cfg.lanczos_precond and noise_pc is None:
            # body-frame factor preconditioning: same distribution, ~3x fewer
            # iterations.  run_bd precomputes and threads these through; for
            # standalone calls build them here (trace-time constants).
            noise_pc = lanczos.make_noise_preconditioner(
                geom.ref_cfg, cfg.a, cfg.eta, dtype
            )
        lz_kw = dict(
            iters=cfg.lanczos_iters, max_iters=cfg.lanczos_max_iters,
            err_tol=cfg.lanczos_err_tol, return_err=True,
            axis_name=axis_name,
        )
        if use_split and (default_mob or mob_multi is not None):
            # fused two-draw Lanczos: both recurrences share one pair-field
            # sweep per iteration (2-RHS mobility product).  mob_multi:
            # explicit multi-RHS operator for the non-default paths (the
            # distributed local appliers are ndim-polymorphic, so the
            # distributed stepper passes its mob_apply here too)
            if mob_multi is None:
                # the far-field apply is ndim-polymorphic — reuse the
                # geometry-pinned single-RHS callable instead of building
                # a second operator (and a second kernel lattice)
                mob_multi = (mob_apply if hasattr(mob_apply, "prepare")
                             else saddle_mod.mobility_apply_multi_fn(cfg))
            if cfg.lanczos_precond:
                mhw1, mhw2, noise_err = lanczos.m_half_w_precond(
                    mob_multi, pos, ops.rot, noise_pc[0], noise_pc[1], (k1, k2),
                    multi=True, **lz_kw,
                )
            else:
                mhw1, mhw2, noise_err = lanczos.m_half_w_pair(
                    mob_multi, pos, k1, k2, **lz_kw
                )
            c1 = 2.0 * jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            c2 = jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            bi = c2 * (mhw1 - mhw2)
        elif use_split:
            if cfg.lanczos_precond:
                mhw1, e1 = lanczos.m_half_w_precond(
                    mob_apply, pos, ops.rot, noise_pc[0], noise_pc[1], k1,
                    **lz_kw)
                mhw2, e2 = lanczos.m_half_w_precond(
                    mob_apply, pos, ops.rot, noise_pc[0], noise_pc[1], k2,
                    **lz_kw)
            else:
                mhw1, e1 = lanczos.m_half_w(mob_apply, pos, k1, **lz_kw)
                mhw2, e2 = lanczos.m_half_w(mob_apply, pos, k2, **lz_kw)
            noise_err = jnp.maximum(e1, e2)
            c1 = 2.0 * jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            c2 = jnp.sqrt(jnp.asarray(kBT / cfg.dt, dtype))
            bi = c2 * (mhw1 - mhw2)
        else:
            if cfg.lanczos_precond:
                mhw1, noise_err = lanczos.m_half_w_precond(
                    mob_apply, pos, ops.rot, noise_pc[0], noise_pc[1], k1,
                    **lz_kw)
            else:
                mhw1, noise_err = lanczos.m_half_w(mob_apply, pos, k1, **lz_kw)
            c1 = jnp.sqrt(jnp.asarray(2.0 * kBT / cfg.dt, dtype))
            c2 = c1
            bi = c2 * mhw1
        if cfg.drift_mode == "em_exact":
            # plain EM: solve at q^n, add the exact body-space RFD divergence
            # drift kBT·∂·N afterwards — no midpoint kick (the kick itself
            # generates drift terms and would double count).
            slip_eff = slip - bi
            ops_solve = ops
            drift_U = jnp.asarray(kBT, dtype) * rfd.n_rfd_exact(
                geom, state, cfg, k3, mob_apply, pc=pc, axis_name=axis_name
            )
        else:
            # midpoint slip scheme (reference intent, c_rigid_obj.cpp:917-976)
            drift = jnp.asarray(kBT, dtype) * rfd.m_rfd(
                geom, state, ops, cfg, k3, mob_apply
            )
            slip_eff = slip - (drift + bi)
            drift_U = None

            # predictor half-kick of the configuration
            u_half = kin.Kinv_dot(
                (c1 * mhw1).reshape(B, n, 3), ops.offsets, ops.ktkinv
            )
            dU_half = (cfg.dt / 2.0) * u_half
            # the half-kick gets the same below-wall rejection as commits —
            # otherwise the corrector solve itself runs on an invalid config
            half_state = _commit(geom, cfg, state, dU_half)
            ops_solve = saddle_mod.geometry_ops(geom, half_state)
    else:
        slip_eff = slip
        ops_solve = ops
        drift_U = None
        noise_err = jnp.zeros((), dtype)

    res = solvers.solve_saddle(
        ops_solve, cfg, slip_eff, force, mob_apply=mob_apply, x0=x0, pc=pc,
        axis_name=axis_name,
    )
    U_total = res.U if drift_U is None else res.U + drift_U
    # reject the whole step if the Krylov solve failed — committing a
    # garbage U launches bodies across the box (observed: a body wedged
    # ~0.01a above the wall makes the damped mobility near-singular, the
    # residual jumps from 1e-5 to 0.3 for one step, and the "velocity" is
    # O(10^6)).  A no-move step at an already-pathological configuration is
    # strictly better than the alternative; aux.residual surfaces the event.
    ok = res.residual < jnp.asarray(cfg.max_step_residual, dtype)
    dU = jnp.where(ok, U_total, 0.0) * jnp.asarray(cfg.dt, dtype)
    new_state = _commit(geom, cfg, state, dU)
    return new_state, StepAux(
        U=U_total, lam=res.lam, residual=res.residual, iters=res.iters,
        noise_err=jnp.asarray(noise_err, dtype),
    )


def make_differentiable_step(geom: kin.RefGeometry, cfg: SimulationConfig):
    """Build a *differentiable* deterministic BD step — the adjoint chained
    through the whole update, not just the solve.

    Returns ``step(state, force, slip=None) → BodyState`` differentiable in
    ``state`` (X and Q), ``force`` and ``slip``: geometry assembly
    (einsums), the saddle solve (implicit-function adjoint via
    :func:`rigid_body_light_tpu.ops.solvers.make_differentiable_solver`)
    and the quaternion commit (gradient-safe axis-angle exponential) all
    carry gradients, so trajectories built by ``lax.scan`` over this step
    support end-to-end reverse-mode AD — ∂(final configuration)/∂(initial
    configuration, applied wrenches, active slip) for control and inverse
    problems.  Nothing remotely like this exists in the reference.

    Deliberately omits the production guards (below-wall / oversized-move
    rejection): they are piecewise-constant masks whose gradients vanish,
    which silently zeroes sensitivities — optimization callers should keep
    steps inside the guards' validity instead.
    """
    solve = solvers.make_differentiable_solver(cfg)

    def step(state: BodyState, force, slip=None):
        ops = saddle_mod.geometry_ops(geom, state)
        B, n, _ = ops.offsets.shape
        dtype = state.X.dtype
        if slip is None:
            slip = jnp.zeros((B * n, 3), dtype)
        lam, U = solve(ops, slip, force)
        X_new, Q_new = kin.update_X_Q(
            state.X, state.Q, U * jnp.asarray(cfg.dt, dtype)
        )
        return BodyState(X=X_new, Q=Q_new)

    return step


def run_bd(
    geom: kin.RefGeometry,
    cfg: SimulationConfig,
    state: BodyState,
    key,
    n_steps: int,
    force_fn: Callable = None,
    slip_fn: Callable = None,
    mob_apply: Callable = None,
    save_every: int = 1,
    axis_name=None,
    mob_multi: Callable = None,
):
    """Run a whole BD trajectory as one ``lax.scan`` — zero host round-trips.

    force_fn: (BodyState, step) → (B, 6) applied force/torque (default 0).
    slip_fn: (BodyState, step) → (N, 3) active slip on blobs (default 0) —
      for squirmers/active suspensions (the reference's saddle RHS carries a
      Slip argument, ``c_rigid_obj.cpp:917``, but no way to drive it).
    Returns (final_state, trajectory) where trajectory is a pytree of stacked
    (X, Q) snapshots every ``save_every`` steps.
    """
    dtype = state.X.dtype
    B = state.X.shape[0]
    if cfg.box is not None:
        from rigid_body_light_tpu.utils.validation import check_box_geometry

        check_box_geometry(cfg.box, geom.ref_cfg, cfg.a)
    if force_fn is None:
        def force_fn(s, i):
            return jnp.zeros((B, 6), dtype)

    # the block_free PC holds only body-frame constants (configuration-
    # independent) — build it once outside the scan and never rebuild.
    # "ras" carries the same static tier; its per-solve halo coupling is
    # attached FRESH inside solve_saddle at each step's solve geometry.
    # (Lagging the halo tier across steps was measured CATASTROPHIC —
    # settled 9.2 → 27-29 mean iters even at refresh 4: the stale Woodbury
    # blocks bake old rotations while the core applies fresh ones, the
    # exact Ñ/M̃-inconsistency failure mode of the round-3 study.  The
    # per-step build is made cheap instead: bf16 matmuls + Newton–Schulz
    # inverses, see saddle._RAS_PRECISION / _ns_inverse.)
    pc_mode = cfg.pc_mode or ("block" if cfg.block_diag_pc else "diag")
    static_pc = pc_mode in ("block_free", "ras")
    lagged_pc = cfg.pc_refresh > 1 and not static_pc
    noise_pc = (
        lanczos.make_noise_preconditioner(geom.ref_cfg, cfg.a, cfg.eta, dtype)
        if (cfg.lanczos_precond and cfg.kBT > 0.0) else None
    )

    def body(carry, i):
        s, k, x_prev, pc_prev = carry
        k, sub = jax.random.split(k)
        force = force_fn(s, i)
        slip = slip_fn(s, i) if slip_fn is not None else None
        if static_pc:
            pc = pc_prev
        elif lagged_pc:
            # rebuild the (expensive) PC only every pc_refresh steps; a
            # preconditioner lagging a few small steps barely affects the
            # Krylov iteration count but amortizes the per-body factor cost
            pc = lax.cond(
                i % cfg.pc_refresh == 0,
                lambda _: saddle_mod.build_pc(saddle_mod.geometry_ops(geom, s), cfg),
                lambda _: pc_prev,
                None,
            )
        else:
            pc = None
        s_new, aux = stochastic_step(
            geom, cfg, s, sub, force, slip=slip, mob_apply=mob_apply,
            x0=x_prev, pc=pc, noise_pc=noise_pc, axis_name=axis_name,
            mob_multi=mob_multi,
        )
        out = (s_new.X, s_new.Q, aux.residual, aux.iters, aux.noise_err)
        # a failed solve's (λ, U) would poison the next step's warm start
        # (its residual is measured relative to ‖b‖, so a garbage x0 can
        # take more iterations than the budget to un-learn) — carry zeros
        solve_ok = aux.residual < cfg.max_step_residual
        x_carry = (
            jnp.where(solve_ok, aux.lam, 0.0),
            jnp.where(solve_ok, aux.U, 0.0),
        )
        return (s_new, k, x_carry, pc if lagged_pc else pc_prev), out

    n_blb = geom.ref_cfg.shape[0]
    x_init = (
        jnp.zeros((B * n_blb, 3), dtype),
        jnp.zeros((B, 6), dtype),
    )
    # in lagged mode the carry needs a PCData pytree of the right structure
    # (the cond at i=0 always rebuilds it); in static (block_free) mode the
    # init IS the PC for the whole scan; otherwise carry nothing
    pc_init = (
        saddle_mod.build_pc(saddle_mod.geometry_ops(geom, state), cfg)
        if (lagged_pc or static_pc) else None
    )
    (final, _, _, _), (Xs, Qs, residuals, iters, noise_errs) = lax.scan(
        body, (state, key, x_init, pc_init), jnp.arange(n_steps)
    )
    keep = slice(save_every - 1, None, save_every)
    return final, {
        "X": Xs[keep], "Q": Qs[keep], "residual": residuals[keep],
        "iters": iters[keep], "noise_err": noise_errs[keep],
    }
