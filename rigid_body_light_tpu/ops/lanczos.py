"""Brownian increments M^{1/2}·W via Lanczos, fully on device.

The reference computes M^{1/2}W by *densely assembling* B·M·B and Cholesky
factoring it — O(N²) memory, O(N³) flops, every single call
(``M_half_W``, ``c_rigid_obj.cpp:661-675``).  The TPU-native replacement is
the standard Krylov square root (Chow & Saad 2014; used by the large-scale
rigid multiblob codes, e.g. Sprinkle et al. 2017 — PAPERS.md): m Lanczos
iterations with the *matrix-free* damped mobility matvec build a tridiagonal
T and orthonormal basis V, then

    M^{1/2} W ≈ ‖W‖ · Vᵀ · (V_T √Λ V_Tᵀ) e₁

with the m×m eigendecomposition done on device.  Cost: m matvecs, O(m·3N)
memory — no dense M, no O(N³).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def sqrt_matvec(
    matvec: Callable,
    w: jax.Array,
    iters: int = 30,
) -> jax.Array:
    """Approximate A^{1/2}·w for SPD operator ``matvec`` (flat vectors).

    w: (sz,) flat vector.  Returns (sz,).
    Fixed iteration count (static shape); eigenvalues of T are clamped at 0
    so float32 round-off near-singular modes cannot produce NaN.
    """
    sz = w.shape[0]
    dtype = w.dtype
    m = iters
    norm_w = jnp.linalg.norm(w)
    v1 = w / jnp.maximum(norm_w, 1e-30)

    V0 = jnp.zeros((m, sz), dtype=dtype).at[0].set(v1)

    def body(i, carry):
        V, alphas, betas, v_prev, beta_prev = carry
        v = V[i]
        av = matvec(v)
        alpha = jnp.vdot(v, av)
        r = av - alpha * v - beta_prev * v_prev
        # full reorthogonalization against the basis built so far (masked) —
        # keeps the small-m approximation accurate in float32
        proj = V @ r  # (m,)
        mask = (jnp.arange(m) <= i).astype(dtype)
        r = r - (proj * mask) @ V
        beta = jnp.linalg.norm(r)
        v_next = r / jnp.maximum(beta, 1e-30)
        V = lax.cond(
            i + 1 < m,
            lambda V: V.at[i + 1].set(v_next),
            lambda V: V,
            V,
        )
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        return (V, alphas, betas, v, beta)

    alphas = jnp.zeros((m,), dtype=dtype)
    betas = jnp.zeros((m,), dtype=dtype)
    V, alphas, betas, _, _ = lax.fori_loop(
        0, m, body, (V0, alphas, betas, jnp.zeros_like(v1), jnp.asarray(0.0, dtype))
    )

    # tridiagonal T from (alphas, betas[:-1])
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    evals, evecs = jnp.linalg.eigh(T)
    sq = jnp.sqrt(jnp.maximum(evals, 0.0))
    e1 = jnp.zeros((m,), dtype=dtype).at[0].set(1.0)
    y = evecs @ (sq * (evecs.T @ e1))
    return norm_w * (y @ V)


def m_half_w(
    mob_apply: Callable,
    positions,
    key,
    iters: int = 30,
) -> jax.Array:
    """Draw W ~ N(0, I) and return M^{1/2}W on the blob space, shape (N, 3).

    mob_apply: (F (N,3), r (N,3)) → (N,3), the damped mobility product
    (B·M·B iff wall — same operator the reference choleskys,
    ``c_rigid_obj.cpp:661-675``).  PRNG is an explicit key (the reference
    re-seeds libc rand from the wall clock per call, ``c_rigid_obj.cpp:731``
    — a reproducibility defect this design removes).
    """
    positions = positions.reshape(-1, 3)
    n = positions.shape[0]
    w = jax.random.normal(key, (3 * n,), dtype=positions.dtype)

    def mv(flat):
        return mob_apply(flat.reshape(-1, 3), positions).reshape(-1)

    return sqrt_matvec(mv, w, iters=iters).reshape(-1, 3)
