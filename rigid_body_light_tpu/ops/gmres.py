"""Hand-rolled restarted GMRES, fully jittable, tuned for TPU.

Why not ``jax.scipy.sparse.linalg.gmres``: it wraps the solve in
``lax.custom_linear_solve`` (for differentiability), whose transpose rule
fails on matvecs containing ``lax.map``/``dynamic_slice`` pipelines (jax
0.9), and its incremental solve runs scalar-heavy while-loops.  This
implementation:

  - flat Krylov basis V (m+1, n): orthogonalization is two (m+1, n)×(n,)
    matmuls per iteration (classical Gram–Schmidt, applied twice — CGS2 —
    which is MXU work and as stable as modified GS in practice),
  - fixed restart length m via ``fori_loop`` (static shapes, no per-step
    host sync), restart cycles via ``while_loop`` with early exit on the
    true residual,
  - small (m+1, m) least-squares solved per cycle with ``jnp.linalg.lstsq``
    (SVD-based → robust to happy breakdown / rank deficiency).

Left preconditioning: the operator passed in is P∘A and the RHS is P·b;
the convergence test uses the preconditioned residual (same convention as
scipy's default used by drivers of the reference library).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class GmresResult(NamedTuple):
    x: jax.Array
    residual: jax.Array  # relative preconditioned residual ‖P(b−Ax)‖/‖Pb‖
    iters: jax.Array     # total inner iterations executed


def _cycle(matvec: Callable, x0, r0, m: int):
    """One GMRES(m) cycle from residual r0; returns (x_new, r_new_norm_sq)."""
    n = r0.shape[0]
    dtype = r0.dtype
    beta = jnp.linalg.norm(r0)
    tiny = jnp.asarray(1e-30, dtype)
    v0 = r0 / jnp.maximum(beta, tiny)
    V = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
    H = jnp.zeros((m + 1, m), dtype)

    def body(j, carry):
        V, H = carry
        w = matvec(V[j])
        # CGS2: project twice against the whole basis (unset rows are zero,
        # so they contribute nothing — no masking needed)
        h1 = V @ w
        w = w - h1 @ V
        h2 = V @ w
        w = w - h2 @ V
        h = h1 + h2
        hn = jnp.linalg.norm(w)
        H = H.at[:, j].set(h).at[j + 1, j].set(hn)
        V = V.at[j + 1].set(w / jnp.maximum(hn, tiny))
        return V, H

    V, H = lax.fori_loop(0, m, body, (V, H))
    e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta)
    y, _, _, _ = jnp.linalg.lstsq(H, e1)
    x = x0 + y @ V[:m]
    return x


def gmres(
    matvec: Callable,
    b,
    x0=None,
    tol: float = 1e-6,
    restart: int = 40,
    max_restarts: int = 5,
) -> GmresResult:
    """Solve matvec(x) = b for flat vectors; restarted, early-exiting."""
    b = b.reshape(-1)
    dtype = b.dtype
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b_norm = jnp.maximum(jnp.linalg.norm(b), jnp.asarray(1e-30, dtype))
    atol2 = (jnp.asarray(tol, dtype) * b_norm) ** 2

    def cond(carry):
        x, r, k = carry
        return jnp.logical_and(k < max_restarts, jnp.sum(r * r) > atol2)

    def step(carry):
        x, r, k = carry
        x_new = _cycle(matvec, x, r, restart)
        r_new = b - matvec(x_new)
        return x_new, r_new, k + 1

    r0 = b - matvec(x0)
    x, r, k = lax.while_loop(cond, step, (x0, r0, jnp.asarray(0, jnp.int32)))
    res = jnp.linalg.norm(r) / b_norm
    return GmresResult(x=x, residual=res, iters=k * restart)
