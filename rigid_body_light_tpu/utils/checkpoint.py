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

_FORMAT_VERSION = 1        # single-species layout (X/Q arrays)
_FORMAT_VERSION_MULTI = 2  # mixture layout (X_s/Q_s arrays + n_species) —
                           # a distinct version so pre-mixture readers fail
                           # with a clear version error, not a KeyError
_MAX_READ_VERSION = 2


def save_checkpoint(path: str, state, key: Optional[jax.Array] = None,
                    step: int = 0, metadata: Optional[dict] = None) -> None:
    """Write (X, Q, key, step, metadata) to ``path`` (npz, atomic rename).

    ``state`` is a single :class:`BodyState` or a sequence of them (one per
    species of a mixture — the multi-species state is exactly the tuple of
    per-species (X, Q), so a mixture checkpoint is the same npz with
    ``X_s``/``Q_s`` arrays and an ``n_species`` field).
    """
    payload = {
        "step": np.asarray(step),
        "metadata": json.dumps(metadata or {}),
    }
    if isinstance(state, BodyState):
        payload["format_version"] = _FORMAT_VERSION
        payload["X"] = np.asarray(state.X)
        payload["Q"] = np.asarray(state.Q)
    else:
        payload["format_version"] = _FORMAT_VERSION_MULTI
        payload["n_species"] = np.asarray(len(state))
        for s_idx, s in enumerate(state):
            payload[f"X_{s_idx}"] = np.asarray(s.X)
            payload[f"Q_{s_idx}"] = np.asarray(s.Q)
    if key is not None:
        payload["key_data"] = np.asarray(jax.random.key_data(key))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, dtype=jnp.float32) -> Tuple[BodyState, Optional[jax.Array], int, dict]:
    """Read a checkpoint → (state, key | None, step, metadata).

    ``state`` is a :class:`BodyState`, or a tuple of them if the checkpoint
    was written from a mixture (``n_species`` present).
    """
    with np.load(path, allow_pickle=False) as z:
        version = int(z["format_version"])
        if version > _MAX_READ_VERSION:
            raise RuntimeError(f"Checkpoint {path} has format v{version}; this build reads ≤ v{_MAX_READ_VERSION}")
        if "n_species" in z.files:
            state = tuple(
                BodyState(X=jnp.asarray(z[f"X_{s}"], dtype),
                          Q=jnp.asarray(z[f"Q_{s}"], dtype))
                for s in range(int(z["n_species"]))
            )
        else:
            state = BodyState(X=jnp.asarray(z["X"], dtype),
                              Q=jnp.asarray(z["Q"], dtype))
        step = int(z["step"])
        metadata = json.loads(str(z["metadata"]))
        key = None
        if "key_data" in z.files:
            key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    return state, key, step, metadata
