"""Multi-chip sharding of the mobility matvec and BD step."""

from rigid_body_light_tpu.parallel.sharding import (
    make_mesh,
    sharded_mobility_apply_fn,
)

__all__ = ["make_mesh", "sharded_mobility_apply_fn"]
