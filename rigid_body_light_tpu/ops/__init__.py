"""Jitted operator library: quaternions, rigid kinematics, RPY mobility,
saddle-point preconditioner/solver, Brownian noise and RFD drift."""

from rigid_body_light_tpu.ops import gmres
from rigid_body_light_tpu.ops import quaternion
from rigid_body_light_tpu.ops import kinematics
from rigid_body_light_tpu.ops import rpy
from rigid_body_light_tpu.ops import saddle
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.ops import lanczos
from rigid_body_light_tpu.ops import rfd

__all__ = ["gmres", "quaternion", "kinematics", "rpy", "saddle", "solvers", "lanczos", "rfd"]
