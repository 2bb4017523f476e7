"""Native runtime: asynchronous trajectory I/O (C++ writer thread + ctypes)."""

from rigid_body_light_tpu.runtime.trajectory import (
    TrajectoryWriter,
    read_trajectory,
    native_available,
)

__all__ = ["TrajectoryWriter", "read_trajectory", "native_available"]
