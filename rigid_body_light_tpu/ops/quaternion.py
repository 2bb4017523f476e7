"""Quaternion utilities (scalar-first layout: q = (w, x, y, z)).

The reference uses Eigen quaternions with an external scalar-first layout
(``c_rigid_obj.cpp:212-215,243-246``) and axis-angle exponentials for the
rotation increment (``Q_from_Om``, ``c_rigid_obj.cpp:679-689``).  Everything
here is shape-(..., 4) vectorized and differentiable; there are no per-body
Python loops — body batches ride a leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q):
    """Unit-normalize quaternions along the last axis."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def multiply(q1, q2):
    """Hamilton product q1 ∘ q2, scalar-first, broadcasting on leading axes."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def to_rotation_matrix(q):
    """(..., 4) unit quaternions → (..., 3, 3) rotation matrices.

    Same convention as Eigen's ``toRotationMatrix`` used by the reference to
    rotate the blob reference configuration (``c_rigid_obj.cpp:257-259``).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(w)
    r = jnp.stack(
        [
            one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def from_rotation_vector(om):
    """Axis-angle exponential: (..., 3) rotation vectors → (..., 4) quats.

    q = (cos(|ω|/2), sin(|ω|/2) ω/|ω|), with the |ω|→0 limit handled by the
    Taylor factor 1/2 (smooth, unlike the reference's hard 1e-10 cutoff at
    ``c_rigid_obj.cpp:683-686`` — numerically identical to well below any
    test tolerance, and differentiable).
    """
    norm2 = jnp.sum(om * om, axis=-1, keepdims=True)
    small = norm2 < 1e-12
    # double-where so the sqrt's gradient is never evaluated at 0 (a plain
    # where still propagates NaN through the unselected branch's cotangent)
    norm = jnp.sqrt(jnp.where(small, 1.0, norm2))
    half = 0.5 * norm
    w = jnp.where(small, 1.0 - norm2 / 8.0, jnp.cos(half))
    # sin(n/2)/n with series fallback: 1/2 - n^2/48 + O(n^4)
    factor = jnp.where(small, 0.5 - norm2 / 48.0, jnp.sin(half) / norm)
    return normalize(jnp.concatenate([w, factor * om], axis=-1))


def rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    return jnp.einsum("...ij,...j->...i", to_rotation_matrix(q), v)
