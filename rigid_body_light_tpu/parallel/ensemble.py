"""Multi-host (DCN) scaling: ensemble-over-hosts, bodies-over-ICI.

The reference is single-process (one CUDA device, ``c_rigid_obj.cpp``
has no distribution at all); the TPU-native question is what a
*pod-slice* run should look like.  Hydrodynamic coupling is global —
every Krylov iteration touches all blobs — so sharding ONE suspension
across hosts would put the ring pair sweep's neighbor exchange and the
Krylov scalar reductions on DCN (25 GB/s-class, ~100× slower than ICI)
in the innermost loop.  The bandwidth-correct decomposition (the
scaling-book recipe: collectives ride ICI, DCN carries only
embarrassingly-parallel traffic) is therefore hierarchical:

- **ICI axis** (within a host): bodies sharded, the existing
  fully-distributed machinery (ring pair sweep + psum'd Krylov/Lanczos
  recurrences, ``sharding.make_distributed_run_bd``) — tight coupling
  on the fast fabric.
- **DCN axis** (across hosts): independent ensemble walkers — separate
  noise realizations of the same (or per-walker) initial condition.
  Brownian-dynamics production is statistics-bound (equilibrium
  averages, MSDs, first-passage times need many trajectories — e.g. the
  64-walker Gibbs–Boltzmann validation in VALIDATION.md), so walkers
  are the natural unit of weak scaling, and they exchange ZERO bytes
  during stepping.  DCN is touched only at dispatch and collection.

On a real multi-host slice, build the mesh under
``jax.distributed.initialize`` with hosts on the outer axis
(``make_hybrid_mesh`` uses ``mesh_utils.create_hybrid_device_mesh`` so
each host's chips are contiguous on the ICI axis).  Single-process
(incl. the 8-virtual-device CPU test mesh) gets a plain reshape — the
semantics are identical, which is what the CPU parity tests pin.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.parallel.sharding import _local_mobility_fn
from rigid_body_light_tpu.state import BodyState

ENSEMBLE_AXES = ("dcn", "chips")


def make_hybrid_mesh(dcn: Optional[int] = None, ici: Optional[int] = None,
                     axis_names=ENSEMBLE_AXES) -> Mesh:
    """A 2-D (hosts × chips-per-host) mesh with DCN outermost.

    Multi-process JAX (a real pod slice): ``dcn`` defaults to
    ``jax.process_count()`` and the device grid comes from
    ``mesh_utils.create_hybrid_device_mesh`` — rows are DCN-separated,
    columns ICI-contiguous, so collectives over ``axis_names[1]`` ride
    ICI only.  Single-process: a plain reshape of ``jax.devices()``
    (the virtual-device CPU test path; ``dcn`` must then be given).
    """
    devices = jax.devices()
    n = len(devices)
    if dcn is None:
        dcn = jax.process_count()
    if ici is None:
        if n % dcn:
            raise ValueError(f"{n} devices do not split over dcn={dcn}")
        ici = n // dcn
    if dcn * ici != n:
        raise ValueError(f"dcn*ici = {dcn}*{ici} != {n} devices")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici), dcn_mesh_shape=(dcn, 1), devices=devices)
    else:
        grid = np.asarray(devices).reshape(dcn, ici)
    return Mesh(grid, axis_names)


def make_ensemble_run_bd(geom, cfg: SimulationConfig, mesh: Mesh,
                         n_steps: int, force_fn=None, slip_fn=None,
                         save_every: int = 1):
    """Ensemble of independent fully-distributed BD trajectories.

    Returns ``run(states, keys) → (final_states, traj)`` where
    ``states`` is a batched :class:`BodyState` with a leading walker
    axis — ``X (W, B, 3)``, ``Q (W, B, 4)`` — and ``keys`` is a (W,)
    PRNG key array, one independent stream per walker.  Walkers shard
    over the DCN axis (zero inter-walker traffic), each walker's bodies
    shard over the ICI axis (ring pair sweep + psum'd Krylov exactly as
    :func:`sharding.make_distributed_run_bd`; same per-device key fold,
    so each walker matches what the 1-D distributed run produces from
    the same key).  Trajectories come back batched:
    ``traj["X"] (W, T, B, 3)`` etc.

    Constraints: W divisible by the DCN extent, B by the ICI extent;
    ``force_fn``/``slip_fn`` body-local as in the 1-D distributed run.
    """
    wa, ba = mesh.axis_names
    W_d = mesh.shape[wa]
    D = mesh.shape[ba]
    mob_local = _local_mobility_fn(cfg, D, ba)

    from rigid_body_light_tpu.dynamics import stepper as stepper_mod

    def local_run(X, Q, keys):  # (W_l, B_l, 3), (W_l, B_l, 4), (W_l,)
        def one(x, q, k):
            final, traj = stepper_mod.run_bd(
                geom, cfg, BodyState(X=x, Q=q), k, n_steps,
                force_fn=force_fn, slip_fn=slip_fn, mob_apply=mob_local,
                save_every=save_every, axis_name=ba, mob_multi=mob_local,
            )
            return (final.X, final.Q, traj["X"], traj["Q"],
                    traj["residual"], traj["iters"], traj["noise_err"])
        return jax.vmap(one)(X, Q, keys)

    sharded = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(wa, ba), P(wa, ba), P(wa)),
        out_specs=(P(wa, ba), P(wa, ba), P(wa, None, ba), P(wa, None, ba),
                   P(wa), P(wa), P(wa)),
        check_vma=False,
    )

    def run(states: BodyState, keys):
        W, B = states.X.shape[0], states.X.shape[1]
        if W % W_d:
            raise ValueError(
                f"ensemble run needs n_walkers divisible by the DCN mesh "
                f"extent: W={W}, dcn={W_d}")
        if B % D:
            raise ValueError(
                f"ensemble run needs n_bodies divisible by the ICI mesh "
                f"extent: B={B}, chips={D}")
        X, Q, Xs, Qs, res, iters, nerr = sharded(states.X, states.Q, keys)
        return BodyState(X=X, Q=Q), {
            "X": Xs, "Q": Qs, "residual": res, "iters": iters,
            "noise_err": nerr,
        }

    return run
