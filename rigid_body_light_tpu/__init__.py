"""rigid_body_light_tpu — TPU-native rigid multiblob Brownian dynamics.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``brennansprinkle/Rigid_Body_Light`` (reference: a single-threaded C++/Eigen
extension, ``src/c_rigid_obj.cpp``).  Everything here is functional,
fixed-shape and jittable: mobility products, rigid-body kinematic projections,
saddle-point solves, Brownian noise and time stepping all run on-device with
no host round-trips inside the hot loop.

Public surface:
  - :class:`RigidBody` — drop-in API matching the reference's ``Rigid.RigidBody``
    (reference ``src/Rigid.py:5``).
  - :mod:`rigid_body_light_tpu.ops` — the jitted operator library.
  - :mod:`rigid_body_light_tpu.dynamics` — deterministic/stochastic steppers.
  - :mod:`rigid_body_light_tpu.parallel` — multi-chip sharding of the mobility
    matvec and BD step.
  - :func:`load_structure` — blob-geometry CSV loader (reference
    ``tests/utils.py:9-19``).
"""

import jax as _jax

# TPU matmuls default to bfloat16 inputs (measured here: 2.3e-3 relative
# error vs 1.4e-7 at float32 precision).  This framework's numerical
# contracts — GMRES tolerances, Lanczos noise factors, kinematic
# projections — assume true float32 arithmetic, and the ~2e-3 matmul noise
# measurably breaks them (it biased the preconditioned-noise sampler's
# equilibrium statistics and floored Krylov convergence).  The hot-path
# flops live in the O(N²) pair sweeps, not in these small matmuls, so the
# multi-pass float32 mode costs nothing measurable.  The pin IS process-
# global: an application embedding this framework next to e.g. a neural
# net in the same process inherits it.  Opt out by setting
# RBLT_NO_MATMUL_PIN=1 before import (this framework's float32 accuracy
# contracts then degrade to ~2e-3 on TPU — see BENCH_NOTES.md), or
# override after import with jax.config.update / a
# default_matmul_precision scope around your own code.
import os as _os

if not _os.environ.get("RBLT_NO_MATMUL_PIN"):
    _jax.config.update("jax_default_matmul_precision", "highest")

from rigid_body_light_tpu import analysis, flows, forces, multi
from rigid_body_light_tpu.api import RigidBody
from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.state import BodyState
from rigid_body_light_tpu.structures import load_structure, structure_path

__all__ = [
    "RigidBody",
    "SimulationConfig",
    "BodyState",
    "load_structure",
    "structure_path",
    "analysis",
    "flows",
    "forces",
    "multi",
]

__version__ = "0.1.0"
