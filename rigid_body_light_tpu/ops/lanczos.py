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


def _y_coeffs(alphas, betas, s, m):
    """√T·e₁ coefficients of the size-``s`` leading block of the tridiagonal.

    alphas/betas: (k, m) recurrence coefficients (entries ≥ s arbitrary);
    s: dynamic size (traced scalar or python int), m: static padded size.
    The beyond-``s`` block is masked to the identity with its coupling β
    zeroed, so its spurious eigenpairs have zero e₁-projection and contribute
    nothing — a fixed-shape way to evaluate every truncation order from one
    recurrence (the basis V is orthonormal, so coefficient-space norms equal
    vector-space norms; this is what makes the per-step truncation-error
    observable free of large-vector work).
    """
    dtype = alphas.dtype
    idx = jnp.arange(m)
    live = idx < s
    a = jnp.where(live, alphas, 1.0)
    b = jnp.where(idx < s - 1, betas, 0.0)
    T = jnp.zeros(alphas.shape + (m,), dtype)
    T = T.at[:, idx, idx].set(a)
    T = T.at[:, idx[:-1], idx[1:]].set(b[:, :-1])
    T = T.at[:, idx[1:], idx[:-1]].set(b[:, :-1])
    evals, evecs = jnp.linalg.eigh(T)
    sq = jnp.sqrt(jnp.maximum(evals, 0.0))
    e1_proj = evecs[:, 0, :]  # (k, m) = first row of each eigenvector matrix
    return jnp.einsum("kmj,kj->km", evecs, sq * e1_proj)


def _trunc_err(alphas, betas, s, m):
    """Relative (m−1 → m) truncation estimate per batch row, shape (k,).

    ‖y_s − y_{s−1}‖/‖y_s‖ in coefficient space — the standard a-posteriori
    Lanczos-f(A) estimate (the last-iteration increment); validated against
    the true error series measured by ``scripts/tpu_noise_accuracy.py``.
    """
    y = _y_coeffs(alphas, betas, s, m)
    y_prev = _y_coeffs(alphas, betas, s - 1, m)
    num = jnp.linalg.norm(y - y_prev, axis=1)
    den = jnp.maximum(jnp.linalg.norm(y, axis=1), 1e-30)
    return num / den


def sqrt_matvec_batched(
    matvec: Callable,
    W: jax.Array,
    iters: int = 30,
    max_iters: int = 0,
    err_tol: float = 0.0,
    return_err: bool = False,
    axis_name=None,
):
    """Approximate A^{1/2}·w_k for a batch of vectors with a *joint* matvec.

    W: (k, sz).  ``matvec`` maps (k, sz) → (k, sz), applying the same SPD
    operator to each row — on TPU the k rows share one pair-field sweep
    (see ``rpy_pallas.mobility_apply_multi``), so k Lanczos recurrences cost
    far less than k separate ones.  Returns (k, sz), or ((k, sz), err (k,))
    when ``return_err`` — err is the relative last-increment truncation
    estimate (costs only small (m×m) eigensolves, no extra matvecs).

    Adaptive mode: with ``max_iters > iters`` and ``err_tol > 0``, iterate at
    least ``iters`` times and keep going (to at most ``max_iters``) while the
    estimate exceeds ``err_tol`` — fixed shapes throughout (the basis is
    allocated at ``max_iters``; a ``while_loop`` drives the data-dependent
    trip count).  The reference has no error control at all — its noise is
    an exact O(N³) Cholesky (``c_rigid_obj.cpp:661-675``); here accuracy is
    an explicit, observable, per-step-controlled quantity.

    Eigenvalues of each tridiagonal T are clamped at 0 so float32 round-off
    on near-singular modes cannot produce NaN.

    axis_name: distributed mode — ``W`` rows are local shards inside
    ``shard_map``; inner products close with a ``psum`` over the mesh, the
    Lanczos basis stays sharded (O(m·3N/D) per chip).
    """
    psum = (lambda x: x) if axis_name is None else (
        lambda x: lax.psum(x, axis_name))
    k, sz = W.shape
    dtype = W.dtype
    adaptive = max_iters > iters and err_tol > 0.0
    m = max_iters if adaptive else iters
    norm_w = jnp.sqrt(psum(jnp.sum(W * W, axis=1)))  # (k,)
    v1 = W / jnp.maximum(norm_w, 1e-30)[:, None]

    V0 = jnp.zeros((k, m, sz), dtype=dtype).at[:, 0].set(v1)

    def step(i, V, alphas, betas, v_prev, beta_prev):
        v = V[:, i]
        av = matvec(v)
        alpha = psum(jnp.einsum("ks,ks->k", v, av))
        r = av - alpha[:, None] * v - beta_prev[:, None] * v_prev
        # full reorthogonalization against the basis built so far (rows ≥ i+1
        # are still zero, so no masking needed) — keeps the small-m
        # approximation accurate in float32
        proj = psum(jnp.einsum("kms,ks->km", V, r))
        r = r - jnp.einsum("km,kms->ks", proj, V)
        beta = jnp.sqrt(psum(jnp.sum(r * r, axis=1)))
        v_next = r / jnp.maximum(beta, 1e-30)[:, None]
        V = lax.cond(
            i + 1 < m,
            lambda V: V.at[:, i + 1].set(v_next),
            lambda V: V,
            V,
        )
        alphas = alphas.at[:, i].set(alpha)
        betas = betas.at[:, i].set(beta)
        return V, alphas, betas, v, beta

    alphas = jnp.zeros((k, m), dtype=dtype)
    betas = jnp.zeros((k, m), dtype=dtype)
    init = (V0, alphas, betas, jnp.zeros_like(v1), jnp.zeros((k,), dtype))

    if adaptive:
        def cond_fn(carry):
            i = carry[0]
            err = _trunc_err(carry[2], carry[3], i, m)
            return (i < iters) | ((i < m) & (jnp.max(err) > err_tol))

        def body_fn(carry):
            i, V, a, b, vp, bp = carry
            V, a, b, vp, bp = step(i, V, a, b, vp, bp)
            return (i + 1, V, a, b, vp, bp)

        s_final, V, alphas, betas, _, _ = lax.while_loop(
            cond_fn, body_fn, (jnp.int32(0),) + init
        )
    else:
        def body(i, carry):
            return step(i, *carry)

        V, alphas, betas, _, _ = lax.fori_loop(0, m, body, init)
        s_final = m

    y = _y_coeffs(alphas, betas, s_final, m)
    out = norm_w[:, None] * jnp.einsum("km,kms->ks", y, V)
    if not return_err:
        return out
    err = _trunc_err(alphas, betas, s_final, m)
    return out, err


def sqrt_matvec(
    matvec: Callable,
    w: jax.Array,
    iters: int = 30,
) -> jax.Array:
    """Approximate A^{1/2}·w for SPD operator ``matvec`` on (sz,) vectors."""

    def mv_batched(vk):
        return matvec(vk[0])[None]

    return sqrt_matvec_batched(mv_batched, w[None], iters=iters)[0]


def m_half_w(
    mob_apply: Callable,
    positions,
    key,
    iters: int = 30,
    max_iters: int = 0,
    err_tol: float = 0.0,
    return_err: bool = False,
    axis_name=None,
):
    """Draw W ~ N(0, I) and return M^{1/2}W on the blob space, shape (N, 3).

    mob_apply: (F (N,3), r (N,3)) → (N,3), the damped mobility product
    (B·M·B iff wall — same operator the reference choleskys,
    ``c_rigid_obj.cpp:661-675``).  PRNG is an explicit key (the reference
    re-seeds libc rand from the wall clock per call, ``c_rigid_obj.cpp:731``
    — a reproducibility defect this design removes).
    """
    from rigid_body_light_tpu.ops.saddle import hoist_positions

    positions = positions.reshape(-1, 3)
    mob_apply = hoist_positions(mob_apply, positions)
    n = positions.shape[0]
    w = jax.random.normal(key, (3 * n,), dtype=positions.dtype)

    def mv(flat):
        return mob_apply(flat.reshape(-1, 3), positions).reshape(-1)

    def mv_batched(vk):
        return mv(vk[0])[None]

    out = sqrt_matvec_batched(
        mv_batched, w[None], iters=iters, max_iters=max_iters,
        err_tol=err_tol, return_err=return_err, axis_name=axis_name,
    )
    if return_err:
        out, err = out
        return out[0].reshape(-1, 3), err[0]
    return out[0].reshape(-1, 3)


def make_noise_preconditioner(geom_ref_cfg, a, eta, dtype=jnp.float32):
    """Body-frame factor constants for preconditioned noise sampling.

    C = blkdiag over bodies of the FREE-SPACE per-body mobility — rotation-
    equivariant (same trick as the block_free PC), so the world factor is
    C^{1/2} = R̃·L with L = chol(M_ref) computed ONCE per geometry.  Sampling
    via M^{1/2}W = C^{1/2}·G^{1/2}·W with G = C^{-1/2} M C^{-ᵀ/2} drops the
    spectral range Lanczos must capture from cond(M) (~300 for dense wall
    suspensions) to cond(G) (~9 measured): 8 preconditioned iterations beat
    25 plain ones.  L⁻¹ is precomputed so every application is a dense
    (3n × 3n) matmul on the MXU, not a triangular solve.

    Returns (L, L_inv), each (3n, 3n).
    """
    from rigid_body_light_tpu.ops import rpy

    m_ref = rpy.mobility_matrix(jnp.asarray(geom_ref_cfg, dtype), a, eta, wall=False)
    L = jnp.linalg.cholesky(m_ref)
    L_inv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(L.shape[0], dtype=dtype), lower=True
    )
    return L, L_inv


def _rot_apply(rot, v, transpose=False):
    """Apply blkdiag(R, ..., R) per body: v (B, n, 3) → (B, n, 3)."""
    eq = "bji,bnj->bni" if transpose else "bij,bnj->bni"
    return jnp.einsum(eq, rot, v)


def m_half_w_precond(
    mob_apply_or_multi: Callable,
    positions,
    rot,
    L,
    L_inv,
    keys,
    iters: int = 10,
    multi: bool = False,
    max_iters: int = 0,
    err_tol: float = 0.0,
    return_err: bool = False,
    axis_name=None,
):
    """Preconditioned M^{1/2}W draws; ``keys`` is one key (multi=False) or a
    pair of keys (multi=True, fused 2-RHS sweep).  Returns (N, 3) or a tuple
    of two (N, 3) arrays; with ``return_err`` the last element is the max
    relative truncation estimate (see ``sqrt_matvec_batched`` — measured in
    the preconditioned G-space, where the Lanczos recurrence actually runs).

    G·v = L⁻¹ R̃ᵀ · M · R̃ L⁻ᵀ v, noise = R̃ L · G^{1/2} W.
    """
    from rigid_body_light_tpu.ops.saddle import hoist_positions

    positions = positions.reshape(-1, 3)
    mob_apply_or_multi = hoist_positions(mob_apply_or_multi, positions)
    dtype = positions.dtype
    three_n = L.shape[0]
    B = positions.shape[0] * 3 // three_n
    n = three_n // 3
    k = 2 if multi else 1

    def to_world(vk):  # (k, sz) -> (k, N, 3): R̃ L^{-T} v
        vb = vk.reshape(k, B, three_n)
        u = jnp.einsum("qp,kbq->kbp", L_inv, vb)  # L^{-T} v
        return _rot_apply(
            jnp.broadcast_to(rot, (k,) + rot.shape).reshape(k * B, 3, 3),
            u.reshape(k * B, n, 3),
        ).reshape(k, B * n, 3)

    def from_world(xk):  # (k, N, 3) -> (k, sz): L^{-1} R̃ᵀ x
        xb = _rot_apply(
            jnp.broadcast_to(rot, (k,) + rot.shape).reshape(k * B, 3, 3),
            xk.reshape(k * B, n, 3),
            transpose=True,
        ).reshape(k, B, three_n)
        return jnp.einsum("pq,kbq->kbp", L_inv, xb).reshape(k, -1)

    def mv(vk):  # (k, sz) -> (k, sz): G v
        x = to_world(vk)
        if multi:
            mx = mob_apply_or_multi(x, positions)
        else:
            mx = mob_apply_or_multi(x[0], positions)[None]
        return from_world(mx)

    if multi:
        w = jnp.stack([
            jax.random.normal(keys[0], (B * three_n,), dtype=dtype),
            jax.random.normal(keys[1], (B * three_n,), dtype=dtype),
        ])
    else:
        w = jax.random.normal(keys, (B * three_n,), dtype=dtype)[None]

    g = sqrt_matvec_batched(
        mv, w, iters=iters, max_iters=max_iters, err_tol=err_tol,
        return_err=return_err, axis_name=axis_name,
    )  # (k, sz) = G^{1/2} W
    err = None
    if return_err:
        g, err = g
        err = jnp.max(err)
    # noise = R̃ L g
    gb = g.reshape(k, B, three_n)
    lg = jnp.einsum("pq,kbq->kbp", L, gb)
    out = _rot_apply(
        jnp.broadcast_to(rot, (k,) + rot.shape).reshape(k * B, 3, 3),
        lg.reshape(k * B, n, 3),
    ).reshape(k, B * n, 3)
    if multi:
        return (out[0], out[1], err) if return_err else (out[0], out[1])
    return (out[0], err) if return_err else out[0]


def m_half_w_pair(
    mob_apply_multi: Callable,
    positions,
    key1,
    key2,
    iters: int = 30,
    max_iters: int = 0,
    err_tol: float = 0.0,
    return_err: bool = False,
    axis_name=None,
):
    """Two independent M^{1/2}W draws with fused matvecs.

    The stochastic midpoint stepper needs two draws per step at the same
    configuration (``split_rand``, reference ``c_rigid_obj.cpp:930-936``);
    running both Lanczos recurrences through a 2-RHS mobility sweep shares
    the pair coefficient fields and nearly halves the noise cost.
    Returns ((N,3), (N,3)), plus the max truncation estimate if asked.
    """
    from rigid_body_light_tpu.ops.saddle import hoist_positions

    positions = positions.reshape(-1, 3)
    mob_apply_multi = hoist_positions(mob_apply_multi, positions)
    n = positions.shape[0]
    dtype = positions.dtype
    w1 = jax.random.normal(key1, (3 * n,), dtype=dtype)
    w2 = jax.random.normal(key2, (3 * n,), dtype=dtype)

    def mv2(vk):
        return mob_apply_multi(vk.reshape(2, -1, 3), positions).reshape(2, -1)

    out = sqrt_matvec_batched(
        mv2, jnp.stack([w1, w2]), iters=iters, max_iters=max_iters,
        err_tol=err_tol, return_err=return_err, axis_name=axis_name,
    )
    if return_err:
        out, err = out
        return out[0].reshape(-1, 3), out[1].reshape(-1, 3), jnp.max(err)
    return out[0].reshape(-1, 3), out[1].reshape(-1, 3)
