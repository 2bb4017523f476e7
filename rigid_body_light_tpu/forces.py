"""Jittable external force fields for BD drivers.

The reference ships no force models at all — its intended external driver
supplies the (B, 6) force/torque vector per step.  A complete framework
needs the standard ones used with rigid multiblob suspensions (cf. the
drivers around Sprinkle et al. 2017 / Balboa Usabiaga et al. 2016 —
PAPERS.md).  Each factory returns a ``force_fn(state, step) → (B, 6)``
suitable for :func:`rigid_body_light_tpu.dynamics.run_bd`, and they compose
additively via :func:`sum_forces`.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from rigid_body_light_tpu.state import BodyState


def gravity(g_force) -> Callable:
    """Constant body force/torque, e.g. buoyant weight (0,0,-mg, 0,0,0).

    g_force: (6,) or (B, 6) array-like.
    """
    g = jnp.asarray(g_force)

    def fn(state: BodyState, step=0):
        B = state.X.shape[0]
        return jnp.broadcast_to(g.astype(state.X.dtype), (B, 6))

    return fn


def wall_repulsion(strength: float, debye_length: float, radius: float = 1.0) -> Callable:
    """Soft exponential wall repulsion along +z (standard near-wall BD guard):

        F_z = strength · exp(−(h − radius)/debye_length),  h = body height.

    Matches the Yukawa-type wall potential used by the rigid multiblob
    drivers; keeps bodies from violating the z>0 domain of the Swan–Brady
    mobility.
    """

    def fn(state: BodyState, step=0):
        B = state.X.shape[0]
        h = state.X[:, 2]
        fz = strength * jnp.exp(-(h - radius) / debye_length)
        out = jnp.zeros((B, 6), state.X.dtype)
        return out.at[:, 2].set(fz)

    return fn


def harmonic_trap(k, center) -> Callable:
    """Harmonic restoring force −k·(X − center) on each body's tracking point."""
    center = jnp.asarray(center)

    def fn(state: BodyState, step=0):
        B = state.X.shape[0]
        f = -jnp.asarray(k, state.X.dtype) * (state.X - center.astype(state.X.dtype))
        out = jnp.zeros((B, 6), state.X.dtype)
        return out.at[:, 0:3].set(f)

    return fn


def pair_yukawa(strength: float, debye_length: float, diameter: float,
                box=None) -> Callable:
    """Pairwise screened-Coulomb (Yukawa) body-body repulsion:

        F_ij = strength · exp(−(r−d)/λ) · r̂,   r = |X_i − X_j|.

    O(B²) on body centers (cheap next to the blob-level mobility); fully
    vectorized, no self interaction.  box: optional (Lx, Ly) pseudo-periodic
    minimum-image wrap in the plane (match ``SimulationConfig.box`` so the
    conservative force sees the same geometry as the hydrodynamics).
    """

    def fn(state: BodyState, step=0):
        X = state.X
        B = X.shape[0]
        d = X[:, None, :] - X[None, :, :]
        if box is not None:
            from rigid_body_light_tpu.ops.rpy import _wrap_xy

            d = _wrap_xy(d, box)  # unit-agnostic: absolute units here
        r2 = jnp.sum(d * d, axis=-1)
        eye = jnp.eye(B, dtype=bool)
        r = jnp.sqrt(jnp.where(eye, 1.0, r2))
        mag = strength * jnp.exp(-(r - diameter) / debye_length) / r
        mag = jnp.where(eye, 0.0, mag)
        f = jnp.einsum("ij,ijk->ik", mag, d)
        out = jnp.zeros((B, 6), X.dtype)
        return out.at[:, 0:3].set(f)

    return fn


def sum_forces(*force_fns: Sequence[Callable]) -> Callable:
    """Compose force fields additively."""

    def fn(state: BodyState, step=0):
        total = force_fns[0](state, step)
        for f in force_fns[1:]:
            total = total + f(state, step)
        return total

    return fn
