"""On-device Krylov solver for the saddle system.

The reference ships *no* solver — it exposes operator/PC matvecs for an
external scipy GMRES driver (scipy/pyamg are deps in ``environment.yml:5-7``
but unused in-repo; every Krylov iteration crosses the Python↔C++ boundary
4 times, ``Rigid.py:73-80``).  Here the whole preconditioned GMRES runs
under ``jit``: the Krylov basis, the Arnoldi recurrence, the mobility matvec
and the preconditioner are one XLA computation.

The solve operates on the natural pytree vector ((N,3) blob space, (B,6)
body space) via ``jax.scipy.sparse.linalg.gmres``, which supports pytrees.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.sparse.linalg import gmres as _jax_gmres

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import saddle as saddle_mod


class SolveResult(NamedTuple):
    lam: jax.Array  # (N, 3) constraint forces on blobs
    U: jax.Array    # (B, 6) rigid body velocities
    residual: jax.Array  # final relative residual (preconditioned system)


def solve_saddle(
    ops: saddle_mod.GeometryOps,
    cfg: SimulationConfig,
    slip,
    force,
    pc: saddle_mod.PCData = None,
    x0=None,
    mob_apply: Callable = None,
) -> SolveResult:
    """Solve [M −K; Kᵀ 0][λ; U] = [slip; F] with preconditioned GMRES.

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
    if pc is None:
        pc = saddle_mod.build_pc(ops, cfg)
    dtype = ops.positions.dtype
    slip = jnp.asarray(slip, dtype).reshape(-1, 3)
    force = jnp.asarray(force, dtype).reshape(-1, 6)

    def A(x):
        lam, U = x
        return saddle_mod.apply_saddle(lam, U, ops, cfg, mob_apply)

    def M(x):
        s, f = x
        return saddle_mod.apply_pc(pc, s, f, ops, cfg)

    b = (slip, force)
    if x0 is None:
        x0 = (jnp.zeros_like(slip), jnp.zeros_like(force))

    x, _ = _jax_gmres(
        A,
        b,
        x0=x0,
        tol=cfg.gmres_tol,
        atol=0.0,
        restart=cfg.gmres_restart,
        maxiter=max(1, cfg.gmres_maxiter // cfg.gmres_restart),
        M=M,
        solve_method="batched",
    )
    lam, U = x
    r = A(x)
    res = jnp.sqrt(
        (jnp.sum((r[0] - b[0]) ** 2) + jnp.sum((r[1] - b[1]) ** 2))
        / jnp.maximum(jnp.sum(b[0] ** 2) + jnp.sum(b[1] ** 2), 1e-30)
    )
    return SolveResult(lam=lam, U=U, residual=res)
