"""Hand-rolled restarted GMRES, fully jittable, tuned for TPU.

Why not ``jax.scipy.sparse.linalg.gmres``: it wraps the solve in
``lax.custom_linear_solve`` (for differentiability), whose transpose rule
fails on matvecs containing ``lax.map``/``dynamic_slice`` pipelines (jax
0.9), and its incremental solve runs scalar-heavy while-loops.  This
implementation:

  - flat Krylov basis V (m+1, n): orthogonalization is two (m+1, n)×(n,)
    matmuls per iteration (classical Gram–Schmidt, applied twice — CGS2 —
    which is MXU work and as stable as modified GS in practice),
  - Givens-rotation QR of the Hessenberg column per iteration, so the
    preconditioned residual estimate is available *inside* the cycle: once
    it crosses tol, the remaining iterations of the cycle skip their
    matvec/orthogonalization entirely (``lax.cond``) — the fixed-shape
    analogue of early exit.  With an O(N²) matvec this is the dominant
    saving whenever convergence lands mid-cycle,
  - restart cycles via ``while_loop`` with exit on the true residual,
  - the small upper-triangular system solved per cycle with a masked
    ``solve_triangular`` (skipped columns get a unit diagonal and a zero
    RHS, so they contribute nothing).

Left preconditioning: the operator passed in is P∘A and the RHS is P·b;
the convergence test uses the preconditioned residual (same convention as
scipy's default used by drivers of the reference library).

Distributed mode: with ``axis_name`` set, vectors are the LOCAL shard of a
mesh-sharded unknown (inside ``shard_map``) and every inner product / norm
closes over the mesh with a ``psum`` — the basis, Hessenberg updates and
triangular solve run redundantly-replicated on scalars, the O(n) state
stays sharded.  This is what lets the Krylov memory scale with the number
of chips instead of being replicated (SURVEY §5's distribution target).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class GmresResult(NamedTuple):
    x: jax.Array
    residual: jax.Array  # relative preconditioned residual ‖P(b−Ax)‖/‖Pb‖
    iters: jax.Array     # inner iterations *executed* (exact — iterations
                         # after the in-cycle residual estimate crossed tol
                         # are skipped and not counted)


def _make_reducers(axis_name):
    if axis_name is None:
        return (lambda x: x)
    return lambda x: lax.psum(x, axis_name)


def _cycle(matvec: Callable, x0, r0, m: int, atol, axis_name=None):
    """One GMRES(m) cycle from residual r0.

    Returns (x_new, n_exec) where n_exec is the number of inner iterations
    actually executed (the rest were skipped after the Givens residual
    estimate fell below ``atol``).
    """
    psum = _make_reducers(axis_name)
    n = r0.shape[0]
    dtype = r0.dtype
    beta = jnp.sqrt(psum(jnp.sum(r0 * r0)))
    tiny = jnp.asarray(1e-30, dtype)
    v0 = r0 / jnp.maximum(beta, tiny)
    V = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
    R = jnp.zeros((m, m), dtype)      # upper-triangular factor of H
    cs = jnp.zeros((m,), dtype)
    sn = jnp.zeros((m,), dtype)
    g = jnp.zeros((m + 1,), dtype).at[0].set(beta)  # rotated RHS; |g[j]| =
    # residual estimate after j executed iterations

    def body(j, carry):
        V, R, cs, sn, g, n_exec = carry
        live = jnp.abs(g[j]) > atol

        def run(ops):
            V, R, cs, sn, g = ops
            w = matvec(V[j])
            # CGS2: project twice against the whole basis (unset rows are
            # zero, so they contribute nothing — no masking needed)
            h1 = psum(V @ w)
            w = w - h1 @ V
            h2 = psum(V @ w)
            w = w - h2 @ V
            col = h1 + h2
            hn = jnp.sqrt(psum(jnp.sum(w * w)))
            V_new = V.at[j + 1].set(w / jnp.maximum(hn, tiny))
            col = col.at[j + 1].set(hn)

            # apply the j previous rotations to the new column
            def rot(i, c_):
                a, b = c_[i], c_[i + 1]
                return c_.at[i].set(cs[i] * a + sn[i] * b).at[i + 1].set(
                    -sn[i] * a + cs[i] * b
                )

            col = lax.fori_loop(0, j, rot, col)
            # new rotation annihilating the subdiagonal entry.  The stored
            # diagonal is floored: if both entries underflow to 0 (happy
            # breakdown / rank deficiency in f32) an unfloored 0 diagonal
            # would send solve_triangular to NaN; the floor makes the
            # corresponding y component ~0 instead (minimal-norm behavior)
            denom = jnp.sqrt(col[j] ** 2 + col[j + 1] ** 2)
            c = col[j] / jnp.maximum(denom, tiny)
            s = col[j + 1] / jnp.maximum(denom, tiny)
            col = col.at[j].set(jnp.maximum(denom, tiny)).at[j + 1].set(0.0)
            g_new = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            return (
                V_new,
                R.at[:, j].set(col[:m]),
                cs.at[j].set(c),
                sn.at[j].set(s),
                g_new,
            )

        V, R, cs, sn, g = lax.cond(live, run, lambda ops: ops, (V, R, cs, sn, g))
        return V, R, cs, sn, g, n_exec + live.astype(jnp.int32)

    V, R, cs, sn, g, n_exec = lax.fori_loop(
        0, m, body, (V, R, cs, sn, g, jnp.asarray(0, jnp.int32))
    )

    # masked back substitution: columns ≥ n_exec were never filled — give
    # them a unit diagonal and a zero RHS so their y components vanish
    executed = jnp.arange(m) < n_exec
    R = R + jnp.diag(jnp.where(executed, 0.0, 1.0).astype(dtype))
    rhs = jnp.where(executed, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
    x = x0 + y @ V[:m]
    return x, n_exec


def gmres(
    matvec: Callable,
    b,
    x0=None,
    tol: float = 1e-6,
    restart: int = 40,
    max_restarts: int = 5,
    axis_name=None,
) -> GmresResult:
    """Solve matvec(x) = b for flat vectors; restarted, early-exiting.

    axis_name: distributed mode — ``b``/``x0`` are local shards inside
    ``shard_map`` and reductions psum over the named mesh axis.
    """
    psum = _make_reducers(axis_name)
    b = b.reshape(-1)
    dtype = b.dtype
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_norm = jnp.maximum(jnp.sqrt(psum(jnp.sum(b * b))),
                         jnp.asarray(1e-30, dtype))
    atol = jnp.asarray(tol, dtype) * b_norm
    atol2 = atol * atol

    def cond(carry):
        x, r, k, it = carry
        return jnp.logical_and(k < max_restarts, psum(jnp.sum(r * r)) > atol2)

    def step(carry):
        x, r, k, it = carry
        x_new, n_exec = _cycle(matvec, x, r, restart, atol,
                               axis_name=axis_name)
        r_new = b - matvec(x_new)
        return x_new, r_new, k + 1, it + n_exec

    r0 = b - matvec(x0)
    x, r, k, it = lax.while_loop(
        cond, step, (x0, r0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )
    res = jnp.sqrt(psum(jnp.sum(r * r))) / b_norm
    return GmresResult(x=x, residual=res, iters=it)
