"""Migration alias: the reference package is imported as ``from Rigid import
RigidBody`` (reference ``src/__init__.py:1``).  This module lets reference
drivers switch to the TPU-native framework without touching their imports —
the class is the parity API from :mod:`rigid_body_light_tpu.api`.
"""

from rigid_body_light_tpu.api import RigidBody

__all__ = ["RigidBody"]
