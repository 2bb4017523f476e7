"""Rigid-body kinematic operators: blob positions, K, Kᵀ, K⁺ (pseudo-inverse).

The reference assembles K as an explicit sparse matrix of identity and
cross-product blocks per blob (``Make_K_Kinv``, ``c_rigid_obj.cpp:328-402``)
and applies it with sparse matvecs.  K has closed form, so on TPU the sparse
matrices disappear entirely: every product below is a fused batched einsum /
cross product over a (B, n, 3) blob array — MXU/VPU-friendly, no gathers.

For body j with blob offsets r_k = R(Q_j)·ref_k (world frame, relative to the
tracking point):

    (K U)_{jk}      = u_j + ω_j × r_k                    [(B,n,3) from (B,6)]
    (Kᵀ λ)_j        = (Σ_k λ_k ,  Σ_k r_k × λ_k)         [(B,6)  from (B,n,3)]
    (KᵀK)⁻¹_j       = blkdiag(I/n,  (Σ|ref|² I − R·MOI·Rᵀ)⁻¹)
                      (closed form, reference ``block_KTKinv``,
                       ``c_rigid_obj.cpp:302-326``)
    K⁺ = (KᵀK)⁻¹Kᵀ  and  K⁺ᵀ = K (KᵀK)⁻¹   ((KᵀK)⁻¹ is symmetric)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rigid_body_light_tpu.ops import quaternion as quat


class RefGeometry(NamedTuple):
    """Trace-time constants derived from the centered reference config.

    ref_cfg: (n, 3) blob positions in the body frame, centered at their mean
      (the reference centers in ``setParameters`` → ``removeMean``,
      ``c_rigid_obj.cpp:176-195``).
    sum_r2: Σ_k |ref_k|² (scalar).
    moi: Σ_k ref_k ref_kᵀ (3, 3) second-moment matrix.
    """

    ref_cfg: jax.Array
    sum_r2: jax.Array
    moi: jax.Array

    @property
    def n_blobs(self) -> int:
        return self.ref_cfg.shape[0]


def make_ref_geometry(ref_cfg, dtype=jnp.float32) -> RefGeometry:
    ref = jnp.asarray(ref_cfg, dtype=dtype).reshape(-1, 3)
    ref = ref - jnp.mean(ref, axis=0, keepdims=True)
    sum_r2 = jnp.sum(ref * ref)
    moi = jnp.einsum("ki,kj->ij", ref, ref)
    return RefGeometry(ref_cfg=ref, sum_r2=sum_r2, moi=moi)


def blob_offsets(geom: RefGeometry, Q) -> jax.Array:
    """World-frame blob offsets r_k = R(Q)·ref_k, shape (B, n, 3)."""
    R = quat.to_rotation_matrix(Q)  # (B, 3, 3)
    return jnp.einsum("bij,kj->bki", R, geom.ref_cfg)


def blob_positions(geom: RefGeometry, X, Q) -> jax.Array:
    """World-frame blob positions, shape (B, n, 3).

    Parity: reference ``get_r_vecs`` / ``multi_body_pos``
    (``c_rigid_obj.cpp:257-300``).
    """
    return blob_offsets(geom, Q) + X[:, None, :]


def K_dot(U, offsets) -> jax.Array:
    """K·U: body velocities (B, 6) → blob velocities (B, n, 3).

    U layout per body: (u, ω) — translation then rotation, matching the
    reference's 6-column blocks (``c_rigid_obj.cpp:369-383``).
    """
    u = U[:, None, 0:3]
    om = U[:, None, 3:6]
    return u + jnp.cross(om, offsets)


def KT_dot(lam, offsets) -> jax.Array:
    """Kᵀ·λ: blob forces (B, n, 3) → body force/torque (B, 6)."""
    f = jnp.sum(lam, axis=1)
    tau = jnp.sum(jnp.cross(offsets, lam), axis=1)
    return jnp.concatenate([f, tau], axis=-1)


def ktk_inv(geom: RefGeometry, Q) -> jax.Array:
    """(KᵀK)⁻¹ per body, shape (B, 6, 6); block-diagonal closed form.

    D = sum_r2·I − R·MOI·Rᵀ must be nonsingular (it is for any body whose
    blobs are not collinear; the reference aborts the process on a singular
    D, ``c_rigid_obj.cpp:313-316`` — here the solve simply produces inf/nan
    and the API layer validates).
    """
    B = Q.shape[0]
    n = geom.n_blobs
    R = quat.to_rotation_matrix(Q)
    eye3 = jnp.eye(3, dtype=Q.dtype)
    D = geom.sum_r2 * eye3 - jnp.einsum("bij,jk,blk->bil", R, geom.moi, R)
    S = jnp.linalg.inv(D)
    out = jnp.zeros((B, 6, 6), dtype=Q.dtype)
    out = out.at[:, 0:3, 0:3].set(eye3 / n)
    out = out.at[:, 3:6, 3:6].set(S)
    return out


def Kinv_dot(V, offsets, ktkinv) -> jax.Array:
    """K⁺·V = (KᵀK)⁻¹ Kᵀ V: blob velocities (B, n, 3) → body velocities (B, 6).

    Parity: reference ``Kinv_x_V`` (``c_rigid_obj.cpp:406``).
    """
    return jnp.einsum("bij,bj->bi", ktkinv, KT_dot(V, offsets))


def KinvT_dot(W, offsets, ktkinv) -> jax.Array:
    """K⁺ᵀ·W = K (KᵀK)⁻¹ W: body (B, 6) → blob (B, n, 3).

    Parity: reference ``KTinv_x_F`` (``c_rigid_obj.cpp:408``); uses the
    symmetry of (KᵀK)⁻¹.
    """
    return K_dot(jnp.einsum("bij,bj->bi", ktkinv, W), offsets)


def update_X_Q(X, Q, dU):
    """Advance body configs by displacements dU (B, 6) = (ΔX, Δθ axis-angle).

    Non-mutating; parity with reference ``update_X_Q``
    (``c_rigid_obj.cpp:691-710``): X += ΔX, Q ← exp(Δθ) ∘ Q, renormalized.
    """
    X_new = X + dU[:, 0:3]
    q_rot = quat.from_rotation_vector(dU[:, 3:6])
    Q_new = quat.normalize(quat.multiply(q_rot, Q))
    return X_new, Q_new
