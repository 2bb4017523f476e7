"""Multi-chip sharding of the mobility matvec and BD step."""

from rigid_body_light_tpu.parallel.sharding import (
    make_mesh,
    make_mesh_2d,
    sharded_mobility_apply_fn,
    sharded_pair_sum,
    sharded_pair_sum_2d,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "sharded_mobility_apply_fn",
    "sharded_pair_sum",
    "sharded_pair_sum_2d",
]
