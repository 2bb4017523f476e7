"""Simulation state pytree.

The reference keeps all mutable state inside the C++ object (``X_n``, ``Q_n``,
cached K matrices and preconditioner factors, ``c_rigid_obj.cpp:144-167``).
Here state is an immutable pytree of fixed-shape arrays: ``(X, Q)`` plus the
PRNG key is the *complete* checkpoint (K, preconditioner, noise are all
derived or explicit), which also makes save/restore and `lax.scan` carries
trivial.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class BodyState(NamedTuple):
    """State of B rigid bodies.

    X: (B, 3) body tracking points (centroid of the blob reference config —
       the reference centers ``ref_cfg`` at its mean, ``c_rigid_obj.cpp:176-181``).
    Q: (B, 4) unit quaternions, scalar-first (w, x, y, z) — matching the
       reference's external layout (``c_rigid_obj.cpp:212-215``).
    """

    X: jax.Array
    Q: jax.Array

    @property
    def n_bodies(self) -> int:
        return self.X.shape[0]

    @property
    def dtype(self):
        return self.X.dtype


def make_state(X, Q, dtype=jnp.float32) -> BodyState:
    """Build a normalized BodyState from (B,3)/(B,4) (or flat) arrays.

    Quaternions are normalized on set, as the reference does
    (``c_rigid_obj.cpp:216``).
    """
    X = jnp.asarray(X, dtype=dtype).reshape(-1, 3)
    Q = jnp.asarray(Q, dtype=dtype).reshape(-1, 4)
    norm = jnp.linalg.norm(Q, axis=-1, keepdims=True)
    Q = Q / norm
    return BodyState(X=X, Q=Q)


class BDState(NamedTuple):
    """Carry for a Brownian-dynamics `lax.scan` loop: bodies + PRNG key."""

    bodies: BodyState
    key: jax.Array
    step: Optional[jax.Array] = None
