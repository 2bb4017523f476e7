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
