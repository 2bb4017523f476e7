"""Drop-in ``RigidBody`` API matching the reference's ``Rigid.RigidBody``.

Same constructor signature, same methods, same validation error contract
(reference ``src/Rigid.py:5-135``) — but every operator call below is a
cached jitted XLA computation on fixed shapes; there is no host round-trip
per Krylov iteration and no mutable C++ object.  numpy arrays go in, numpy
arrays come out (device arrays internally).

Extensions over the reference (kwargs after the reference's positional
surface): ``kBT``, ``dtype`` (runtime precision instead of a build flag),
and the stochastic/stepping entry points ``stochastic_step`` /
``deterministic_step`` / ``run`` that the reference only hints at via
unexposed C++ (``RHS_and_Midpoint``, ``c_rigid_obj.cpp:917-976``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import BodyState, make_state


class RigidBody:
    """N rigid bodies sharing one blob reference configuration.

    Parity: reference ``RigidBody`` (``src/Rigid.py:5``).
    """

    X_shape = None
    Q_shape = None

    def __init__(
        self,
        rigid_config,
        X,
        Q,
        a,
        eta,
        dt,
        wall_PC: bool = False,
        block_PC: bool = False,
        *,
        kBT: float = 1.0,
        dtype=jnp.float32,
        config: Optional[SimulationConfig] = None,
    ):
        rigid_config = np.asarray(rigid_config)
        if rigid_config.size % 3 != 0:
            raise RuntimeError(
                f"Rigid config must have length 3N. Rigid config shape: {rigid_config.shape}"
            )
        self.blobs_per_body = rigid_config.size // 3

        if config is None:
            config = SimulationConfig(
                a=float(a),
                eta=float(eta),
                dt=float(dt),
                kBT=float(kBT),
                wall=bool(wall_PC),
                block_diag_pc=bool(block_PC),
                dtype=dtype,
            )
        else:
            # explicit config: the required positional scalars a/eta/dt win;
            # everything else must live in the config — mixing the two would
            # silently produce wrong physics, so it is rejected outright
            if wall_PC or block_PC or kBT != 1.0 or dtype is not jnp.float32:
                raise ValueError(
                    "when config= is given, pass wall/block_diag_pc/kBT/dtype "
                    "inside the SimulationConfig, not as constructor kwargs"
                )
            config = config.replace(a=float(a), eta=float(eta), dt=float(dt))
        self.config = config
        self.precision = "double" if config.dtype == jnp.float64 else "single"
        self._geom = kin.make_ref_geometry(rigid_config, dtype=config.dtype)
        from rigid_body_light_tpu.utils import validation as _validation

        _validation.check_box_geometry(config.box, self._geom.ref_cfg, config.a)
        # the closed-form (KᵀK)⁻¹ needs a nonsingular rotational moment block
        # D = Σ|ref|²·I − MOI; its spectrum is rotation-invariant, so check
        # once at construction (the reference kills the process instead —
        # ``block_KTKinv``, ``c_rigid_obj.cpp:313-316``)
        D = np.asarray(
            self._geom.sum_r2 * jnp.eye(3, dtype=config.dtype) - self._geom.moi
        )
        # "singular" = no digits left at working precision
        cond_limit = 0.01 / np.finfo(D.dtype).eps
        if self.blobs_per_body >= 2 and (
            not np.isfinite(np.linalg.cond(D)) or np.linalg.cond(D) > cond_limit
        ):
            raise RuntimeError(
                "The rotational block of K^T K is singular — the blobs are "
                "collinear (is your rigid body a dimer?). Rotation about the "
                "blob axis is unconstrained; add off-axis blobs."
            )
        self._pc_cache = None
        self._ops_cache = None
        self.set_config(X, Q)

    # ---------------------------------------------------------------- state

    def set_config(self, X, Q):
        """Set body positions/quaternions; quaternions normalized on set."""
        self.__check_and_set_configs(X, Q)
        self.state = make_state(X, Q, dtype=self.config.dtype)
        self.total_blobs = self.N_bodies * self.blobs_per_body
        self._invalidate()
        self._check_overlap(self._ops.flat_positions)

    def get_config(self):
        X = np.asarray(self.state.X).reshape(self.X_shape)
        Q = np.asarray(self.state.Q).reshape(self.Q_shape)
        return X, Q

    def _invalidate(self):
        self._pc_cache = None
        self._ops_cache = None

    @property
    def _ops(self) -> saddle_mod.GeometryOps:
        if self._ops_cache is None:
            self._ops_cache = _geometry_ops_jit(self._geom, self.state)
        return self._ops_cache

    @property
    def _pc(self) -> saddle_mod.PCData:
        if self._pc_cache is None:
            self._pc_cache = _build_pc_jit(self._ops, self.config)
        return self._pc_cache

    # ------------------------------------------------------------ operators

    def get_blob_positions(self):
        shape = (-1, 3) if len(self.X_shape) == 2 else (-1,)
        return np.asarray(self._ops.positions).reshape(shape)

    def K_dot(self, U):
        self.__check_input_size(U_vec=U)
        U = jnp.asarray(U, self.config.dtype).reshape(-1, 6)
        result = _K_dot_jit(U, self._ops.offsets)
        shape = (-1, 3) if len(self.X_shape) == 2 else (-1,)
        return np.asarray(result).reshape(shape)

    def KT_dot(self, lambda_vec):
        self.__check_input_size(lambda_vec=lambda_vec)
        lam = jnp.asarray(lambda_vec, self.config.dtype).reshape(
            self.N_bodies, self.blobs_per_body, 3
        )
        result = _KT_dot_jit(lam, self._ops.offsets)
        shape = (-1, 3) if len(self.X_shape) == 2 else (-1,)
        return np.asarray(result).reshape(shape)

    def apply_PC(self, b):
        self.__check_input_size(system_input=b)
        self._check_above_wall(self._ops.flat_positions)
        b = jnp.asarray(b, self.config.dtype).reshape(-1)
        slip = b[: 3 * self.total_blobs].reshape(-1, 3)
        F = b[3 * self.total_blobs :].reshape(-1, 6)
        lam, U = _apply_pc_jit(self._pc, slip, F, self._ops, self.config)
        return np.concatenate([np.asarray(lam).ravel(), np.asarray(U).ravel()])

    def apply_M(self, forces, positions):
        """U = B·M·B·F (damping iff wall) at caller-supplied positions.

        Supports extra free blobs beyond the rigid ones (reference
        ``tests/test_interface.py:171-177``).
        """
        if np.size(positions) != np.size(forces):
            raise RuntimeError("Positions and forces must be of the same size")
        if np.size(positions) % 3 != 0 or np.size(forces) % 3 != 0:
            raise RuntimeError(
                "Positions and forces must have total length 3N, where N is the number of blobs"
            )
        r = jnp.asarray(positions, self.config.dtype).reshape(-1, 3)
        self._check_above_wall(r)
        self._check_overlap(r)
        F = jnp.asarray(forces, self.config.dtype).reshape(-1, 3)
        out = _apply_m_jit(F, r, self.config)
        return np.asarray(out).ravel()

    def apply_saddle(self, x):
        self.__check_input_size(system_input=x)
        self._check_above_wall(self._ops.flat_positions)
        x = jnp.asarray(x, self.config.dtype).reshape(-1)
        lam = x[: 3 * self.total_blobs].reshape(-1, 3)
        U = x[3 * self.total_blobs :].reshape(-1, 6)
        slip, F = _apply_saddle_jit(lam, U, self._ops, self.config)
        return np.concatenate([np.asarray(slip).ravel(), np.asarray(F).ravel()])

    def solve_mobility(self, forces, slip=None, x0=None):
        """Solve the saddle system for body velocities U given applied
        force/torque (B,6) and optional prescribed blob slip (N,3).

        The reference delegates this to an external scipy GMRES; here it is
        one on-device preconditioned solve.  Returns (U (B,6), λ (N,3),
        residual) as numpy.
        """
        force = jnp.asarray(forces, self.config.dtype).reshape(-1, 6)
        if slip is None:
            slip = jnp.zeros((self.total_blobs, 3), self.config.dtype)
        else:
            slip = jnp.asarray(slip, self.config.dtype).reshape(-1, 3)
        self._check_above_wall(self._ops.flat_positions)
        if x0 is not None:
            x0 = (
                jnp.asarray(x0[0], self.config.dtype).reshape(-1, 3),
                jnp.asarray(x0[1], self.config.dtype).reshape(-1, 6),
            )
        res = _solve_saddle_jit(self._ops, self.config, slip, force, self._pc, x0)
        return np.asarray(res.U), np.asarray(res.lam), float(res.residual)

    # ---------------------------------------------------------------- matrices

    def get_K(self):
        """Sparse K (3·B·n × 6·B) as scipy CSR (parity: ``get_K``,
        ``c_rigid_obj.cpp:978``)."""
        import scipy.sparse as sp

        Kb = np.asarray(saddle_mod.body_K_blocks(self._ops.offsets))  # (B,n,3,6)
        B, n = Kb.shape[0], Kb.shape[1]
        blocks = [sp.csr_matrix(Kb[b].reshape(3 * n, 6)) for b in range(B)]
        return sp.block_diag(blocks, format="csr")

    def get_Kinv(self):
        """Sparse K⁺ = (KᵀK)⁻¹Kᵀ (6·B × 3·B·n) as scipy CSR."""
        import scipy.sparse as sp

        Kb = np.asarray(saddle_mod.body_K_blocks(self._ops.offsets))
        ktki = np.asarray(self._ops.ktkinv)  # (B,6,6)
        B, n = Kb.shape[0], Kb.shape[1]
        blocks = [
            sp.csr_matrix(ktki[b] @ Kb[b].reshape(3 * n, 6).T) for b in range(B)
        ]
        return sp.block_diag(blocks, format="csr")

    # ---------------------------------------------------------------- stepping

    def evolve_rigid_bodies(self, U):
        """Commit one timestep X += U·dt, Q ← exp(ω·dt)∘Q.

        Parity: ``evolve_X_Q`` (``c_rigid_obj.cpp:865-878``) — without
        mutating the caller's U buffer (the reference scales it in place).
        """
        self.__check_input_size(U_vec=U)
        U = jnp.asarray(U, self.config.dtype).reshape(-1, 6)
        dU = U * jnp.asarray(self.config.dt, self.config.dtype)
        X, Q = _update_jit(self.state.X, self.state.Q, dU)
        self.state = BodyState(X=X, Q=Q)
        self._invalidate()

    def deterministic_step(self, forces, slip=None):
        """Solve the mobility problem and advance this body system by dt.

        Returns the (B, 6) body velocities used (numpy).
        """
        from rigid_body_light_tpu.dynamics import deterministic_step as _step

        self._check_above_wall(self._ops.flat_positions)
        force = jnp.asarray(forces, self.config.dtype).reshape(-1, 6)
        slip_j = None if slip is None else jnp.asarray(slip, self.config.dtype).reshape(-1, 3)
        new_state, aux = _jit_det_step(self._geom, self.config, self.state, force, slip_j)
        self.state = new_state
        self._invalidate()
        return np.asarray(aux.U)

    def stochastic_step(self, forces, key=None, slip=None):
        """One fluctuating BD step (midpoint slip scheme by default).

        key: optional jax PRNG key; omitted → an internal counter-derived key
        (reproducible per instance).  Returns the (B, 6) body velocities.
        """
        from rigid_body_light_tpu.dynamics import stochastic_step as _step

        self._check_above_wall(self._ops.flat_positions)
        if key is None:
            self._key_counter = getattr(self, "_key_counter", 0) + 1
            key = jax.random.key(self._key_counter)
        force = jnp.asarray(forces, self.config.dtype).reshape(-1, 6)
        slip_j = None if slip is None else jnp.asarray(slip, self.config.dtype).reshape(-1, 3)
        new_state, aux = _jit_sto_step(self._geom, self.config, self.state, key, force, slip_j)
        self.state = new_state
        self._invalidate()
        return np.asarray(aux.U)

    def run(self, n_steps, key, force_fn=None, slip_fn=None, save_every=1):
        """Run a whole on-device trajectory from the current configuration.

        Thin wrapper over :func:`rigid_body_light_tpu.dynamics.run_bd`;
        updates this instance's state and returns the trajectory dict
        (numpy arrays).
        """
        from rigid_body_light_tpu.dynamics import run_bd

        final, traj = run_bd(
            self._geom, self.config, self.state, key, n_steps,
            force_fn=force_fn, slip_fn=slip_fn, save_every=save_every,
        )
        self.state = final
        self._invalidate()
        return {k: np.asarray(v) for k, v in traj.items()}

    # ---------------------------------------------------------------- checks

    def _check_above_wall(self, positions):
        """Reference error contract (``c_rigid_obj.cpp:95-97``).  Costs a
        host sync per operator call — deliberate at this numpy-in/numpy-out
        boundary; hot loops should use the on-device paths
        (``dynamics.run_bd`` / ``stochastic_step``), which guard below-wall
        configurations with in-graph move rejection instead."""
        if self.config.wall:
            if bool(jnp.any(positions[:, 2] < 0.0)):
                raise RuntimeError(
                    "A blob has its center below the wall (z<0). Cannot compute "
                    "mobility- check your configuration."
                )

    def _check_overlap(self, positions):
        """Raise on exactly-coincident blobs (the RPY pair mobility is
        undefined at r=0; the reference exits the process there,
        ``mobilityUFRPY``, ``c_rigid_obj.cpp:53-58``).  Gated on
        ``config.validate_config`` — this is an O(N²) sweep + host sync and
        only guards the user-facing numpy entry points."""
        if not self.config.validate_config or positions.shape[0] < 2:
            return
        # separations measured through the same minimum-image wrap the
        # mobility uses (blobs coincident modulo the box are the r=0 case);
        # diagnose works in raw position units, so the box passes unscaled
        diag = _min_separation_jit(
            positions, self.config.a, box=self.config.box
        )
        if float(diag) < 1e-8:
            raise RuntimeError(
                f"TWO BLOBS ARE OVERLAPPING OR TOO CLOSELY POSITIONED "
                f"(min separation {float(diag):.3e} a)"
            )

    def __check_and_set_configs(self, X, Q):
        x_size = int(np.prod(np.shape(X)))
        q_size = int(np.prod(np.shape(Q)))
        if x_size % 3 != 0:
            raise RuntimeError("X must have total length 3N")
        if q_size % 4 != 0:
            raise RuntimeError("Q must have total length 4N")
        nx = x_size // 3
        nq = q_size // 4
        if nx != nq:
            raise RuntimeError("X and Q must have the same number of bodies")
        self.N_bodies = nx
        self.X_shape = np.shape(X)
        self.Q_shape = np.shape(Q)

    def __check_input_size(self, lambda_vec=None, U_vec=None, system_input=None):
        if lambda_vec is not None:
            if np.size(lambda_vec) != 3 * self.total_blobs:
                raise RuntimeError(
                    f"lambda must have total size 3*N_blobs = {3 * self.total_blobs}. "
                    f"lambda_vec shape: {np.shape(lambda_vec)}"
                )
        if U_vec is not None:
            if np.size(U_vec) != 6 * self.N_bodies:
                raise RuntimeError(
                    f"U must have total size 6*N_bodies = {6 * self.N_bodies}. "
                    f"U shape: {np.shape(U_vec)}"
                )
        if system_input is not None:
            expected_size = 3 * self.total_blobs + 6 * self.N_bodies
            if np.size(system_input) != expected_size:
                raise RuntimeError(
                    f"Rigid system input vector must have total size 3*N_blobs + "
                    f"6*N_bodies = {expected_size}. system_input shape: "
                    f"{np.shape(system_input)}"
                )


# --- jitted kernels shared across RigidBody instances (cached per shape/cfg) ---

_geometry_ops_jit = jax.jit(saddle_mod.geometry_ops)
_K_dot_jit = jax.jit(kin.K_dot)
_KT_dot_jit = jax.jit(kin.KT_dot)
_update_jit = jax.jit(kin.update_X_Q)


@functools.partial(jax.jit, static_argnames=("box",))
def _min_separation_jit(positions, a, box=None):
    from rigid_body_light_tpu.utils import validation

    Q_unit = jnp.array([[1.0, 0.0, 0.0, 0.0]], positions.dtype)
    return validation.diagnose(positions, Q_unit, a=a, box=box).min_separation


@functools.partial(jax.jit, static_argnames=("cfg",))
def _build_pc_wrap(ops, cfg):
    return saddle_mod.build_pc(ops, cfg)


def _build_pc_jit(ops, cfg):
    return _build_pc_wrap(ops, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_pc_jit(pc, slip, F, ops, cfg):
    return saddle_mod.apply_pc(pc, slip, F, ops, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_m_jit(F, r, cfg):
    mob = saddle_mod.mobility_apply_fn(cfg)
    return mob(F, r)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _apply_saddle_jit(lam, U, ops, cfg):
    return saddle_mod.apply_saddle(lam, U, ops, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _solve_saddle_jit(ops, cfg, slip, force, pc, x0=None):
    return solvers.solve_saddle(ops, cfg, slip, force, pc=pc, x0=x0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_det_step(geom, cfg, state, force, slip):
    from rigid_body_light_tpu.dynamics import deterministic_step

    return deterministic_step(geom, cfg, state, force, slip=slip)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _jit_sto_step(geom, cfg, state, key, force, slip):
    from rigid_body_light_tpu.dynamics import stochastic_step

    return stochastic_step(geom, cfg, state, key, force, slip=slip)
