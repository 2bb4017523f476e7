"""Sharded-path parity on the real TPU: the production shard_map harness
(all_gather + Pallas slab kernel per shard) on a single-device mesh must
reproduce the square-sweep mobility exactly, with and without a periodic
box.  (CPU tests cover the sharded math on 8 virtual devices but fall back
to the XLA sweep there — this exercises the Pallas slab kernel inside
shard_map on hardware.)
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig
    from rigid_body_light_tpu.ops import rpy_pallas
    from rigid_body_light_tpu.parallel import make_mesh
    from rigid_body_light_tpu.parallel.sharding import sharded_mobility_apply_fn

    rng = np.random.default_rng(3)
    n = 2048
    r = jnp.asarray(rng.uniform([0, 0, 1.0], [40, 40, 20], (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    mesh = make_mesh(1)
    for box in (None, (40.0, 40.0)):
        cfg = SimulationConfig(a=0.9, eta=1.1, wall=True, dtype=jnp.float32,
                               box=box, use_pallas=True)
        smob = jax.jit(sharded_mobility_apply_fn(cfg, mesh))
        ref = rpy_pallas.mobility_apply(F, r, cfg.a, cfg.eta, wall=True,
                                        box=box)
        out = smob(F, r)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"box={box}: sharded(slab kernel) vs square kernel "
              f"rel err = {err:.2e}", flush=True)
        assert err < 1e-6, err
    print("SHARDED SLAB PARITY OK")

    # far-field local applier inside shard_map on hardware: exercises the
    # Pallas neighbor-tile near sweep's traced tile-slice offset (the
    # lax.axis_index-derived t0) on the compiled path — CPU-mesh tests
    # fall back to the XLA sweep
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from rigid_body_light_tpu.ops import farfield

    for box in (None, (40.0, 40.0)):
        kw = dict(a=0.9, eta=1.1, wall=True, grid=(5, 5, 2), p=4)
        if box is not None:
            kw.update(box=box, image_shells=3)
        ref = jax.jit(functools.partial(farfield.mobility_apply, r=r,
                                        **kw))(F)
        local = shard_map(
            functools.partial(farfield.mobility_apply_local, n_devices=1,
                              axis_name="blobs", **kw),
            mesh=mesh, in_specs=(P("blobs"), P("blobs")),
            out_specs=P("blobs"), check_vma=False)
        out = jax.jit(local)(F, r)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"box={box}: farfield local (Pallas near, in shard_map) vs "
              f"single-device rel err = {err:.2e}", flush=True)
        assert err < 1e-5, err
    print("SHARDED FARFIELD NEAR-SWEEP PARITY OK")


if __name__ == "__main__":
    main()
