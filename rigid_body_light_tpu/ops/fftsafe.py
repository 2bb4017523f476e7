"""Lane-safe FFT wrappers: dodge an axon-TPU irfftn miscompile.

Measured on the axon TPU backend (scripts/tpu_irfft_probe.py, round 5):
``jnp.fft.irfftn`` over middle axes with a TRAILING lane/batch axis
returns garbage at some grid shapes — at grid (80, 80, 80) the
roundtrip error on unit-normal data is O(1) for lane width B ≥ 64
(clean for B ≤ 32), while grids (100,)³ and (108,)³ are clean at
B = 192.  The identical transform with the lane axis moved LEADING is
clean at every probed shape, as is the forward ``rfftn`` in either
layout.  This silent shape-dependent miscompile produced the round-5
"rc=4.5 anomaly": the PME wave part (lane axis 3p³ = 192) carried
rel err 0.35 on chip at exactly the (80,)³ grid while every component
matched f64 off-chip (BENCH_NOTES round 5).

These wrappers run BOTH directions of every apply-path FFT in the
proven-clean lane-leading layout: the trailing lane axis is moved to
axis 0 around the transform.  The two extra transposes are HBM-bandwidth
noise next to the FFTs themselves, and the math is exactly unchanged —
CPU tests cover the same graph.  Used by the PME Ewald wave part
(:mod:`rigid_body_light_tpu.ops.ewald_pme`) and the proxy-grid far-field
convolutions (:mod:`rigid_body_light_tpu.ops.farfield`), whose spectral
buffers all carry the (..., spatial..., B = 3p³) layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(axes):
    return tuple(a + 1 for a in axes)


def rfftn_lanes(x, axes):
    """``jnp.fft.rfftn(x, axes=axes)`` with the trailing lane axis led.

    ``axes`` must be non-negative positions not including the last axis.
    """
    y = jnp.fft.rfftn(jnp.moveaxis(x, -1, 0), axes=_shift(axes))
    return jnp.moveaxis(y, 0, -1)


def irfftn_lanes(x, s, axes):
    """``jnp.fft.irfftn(x, s=s, axes=axes)`` with the lane axis led."""
    y = jnp.fft.irfftn(jnp.moveaxis(x, -1, 0), s=s, axes=_shift(axes))
    return jnp.moveaxis(y, 0, -1)
