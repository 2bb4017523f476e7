"""Tracing / metrics.

The reference's only observability is a gettimeofday helper and printf in
the hot path (``c_rigid_obj.cpp:22-29,929-932`` — SURVEY.md §5).  Here:
structured step metrics, a wall-time context that *actually synchronizes*
(``block_until_ready`` is unreliable through tunneled TPU backends — force a
host transfer), and a thin wrapper over ``jax.profiler`` for XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("rigid_body_light_tpu")


def sync(x) -> float:
    """Force device completion by reducing to host; returns the scalar."""
    return float(jnp.sum(jnp.asarray(x)))


@contextlib.contextmanager
def timed(label: str, result_holder: Optional[dict] = None):
    """Wall-clock a block; caller must sync device work inside the block."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[label] = dt
    logger.info("%s: %.4f s", label, dt)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/XProf readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMetrics:
    """Accumulates per-step metrics; emits one JSON line per step on demand."""

    def __init__(self):
        self.steps = []

    def record(self, step: int, wall_time: float, residual: float, **extra):
        row = {"step": step, "wall_time_s": wall_time, "gmres_residual": residual}
        row.update(extra)
        self.steps.append(row)
        logger.info("%s", json.dumps(row))

    @property
    def steps_per_sec(self) -> float:
        if not self.steps:
            return 0.0
        total = sum(r["wall_time_s"] for r in self.steps)
        return len(self.steps) / total if total > 0 else 0.0
