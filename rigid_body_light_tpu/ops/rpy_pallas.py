"""Pallas TPU kernel for the matrix-free RPY mobility matvec (stub — the
XLA streamed path in :mod:`rigid_body_light_tpu.ops.rpy` is used until this
lands)."""

from __future__ import annotations


def available() -> bool:
    return False


def mobility_apply(F, r, a=1.0, eta=1.0, wall=False):  # pragma: no cover
    raise NotImplementedError("Pallas RPY kernel not yet implemented")
