"""Checkpoint / resume.

The reference has no checkpoint subsystem; its ``getConfig``/``setConfig``
round-trip (``c_rigid_obj.cpp:201-255``) is the implied serialization.  Here
the complete simulation state is the pytree (X, Q, PRNG key) — everything
else (K operators, preconditioner, noise) is derived or explicit — so a
checkpoint is a single npz.  Deterministic restart is exact: the PRNG key is
part of the state (the reference's clock-seeded RNG, ``c_rigid_obj.cpp:731``,
makes its trajectories unreproducible in principle).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigid_body_light_tpu.state import BodyState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: BodyState, key: Optional[jax.Array] = None,
                    step: int = 0, metadata: Optional[dict] = None) -> None:
    """Write (X, Q, key, step, metadata) to ``path`` (npz, atomic rename)."""
    payload = {
        "format_version": _FORMAT_VERSION,
        "X": np.asarray(state.X),
        "Q": np.asarray(state.Q),
        "step": np.asarray(step),
        "metadata": json.dumps(metadata or {}),
    }
    if key is not None:
        payload["key_data"] = np.asarray(jax.random.key_data(key))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, dtype=jnp.float32) -> Tuple[BodyState, Optional[jax.Array], int, dict]:
    """Read a checkpoint → (state, key | None, step, metadata)."""
    with np.load(path, allow_pickle=False) as z:
        version = int(z["format_version"])
        if version > _FORMAT_VERSION:
            raise RuntimeError(f"Checkpoint {path} has format v{version}; this build reads ≤ v{_FORMAT_VERSION}")
        X = jnp.asarray(z["X"], dtype)
        Q = jnp.asarray(z["Q"], dtype)
        step = int(z["step"])
        metadata = json.loads(str(z["metadata"]))
        key = None
        if "key_data" in z.files:
            key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    return BodyState(X=X, Q=Q), key, step, metadata
