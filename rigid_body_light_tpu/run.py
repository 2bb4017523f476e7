"""Production run driver: ``python -m rigid_body_light_tpu.run config.json``.

The reference has no driver at all (SURVEY.md: the Krylov/stepping loop was
expected to live in an external script).  This CLI turns a JSON config into
a full simulation: structure loading, body placement, force fields,
chunked on-device `lax.scan` stepping, native trajectory logging, periodic
checkpoints, resumable, with per-chunk metrics.

Config schema (JSON):
{
  "structure": "shell_N_42",          // shipped name or path
  "n_bodies": 16,
      // — or, for a multi-species mixture, replace those two keys with:
      // "species": [
      //   {"structure": "shell_N_642", "n_bodies": 12,
      //    "placement": {...}, "forces": [...]},        // per-species opts
      //   {"structure": "shell_N_162", "n_bodies": 16, "scale": 0.5,
      //    "blob_radius": 0.2}
      // ]   // "scale" scales the blob geometry (smaller bodies, same a);
      //     // "blob_radius" gives the species its own blob radius —
      //     // polydisperse RPY in the coupled sweep (default: global a);
      //     // species-level "placement"/"forces" override the global ones
  "placement": {"type": "grid", "spacing": 2.5, "z0": 2.0}   // or "random"
      // or {"type": "file", "path": "init.npz"}  (arrays X (B,3), Q (B,4))
  "a": null,                          // blob radius; null → sep/2
  "eta": 1.0, "dt": 0.01, "kBT": 1.0, "wall": true,
  "dtype": "float32",
  "n_steps": 1000, "save_every": 10, "checkpoint_every": 200,
  "forces": [
     {"type": "gravity", "value": [0,0,-1,0,0,0]},
     {"type": "wall_repulsion", "strength": 2.0, "debye_length": 0.5}
  ],
  "seed": 0,
  "output_dir": "out",
  "solver": {"gmres_tol": 1e-4, "gmres_restart": 40, "gmres_maxiter": 80,
             "lanczos_iters": 30},
  "mesh": {"shape": [8]}              // optional: multi-chip run — shard the
      // O(N²) pair sweep over a device mesh.  [D] = 1-D row sharding
      // (all_gather over ICI), [Dr, Dc] = 2-D SUMMA (psum, O(N/Dr) comm).
      // "mode": "distributed" (single-species, 1-D, B % D == 0) runs the
      // fully-sharded stepper instead: bodies, λ and the Krylov/Lanczos
      // bases sharded, ring / sliced-far-field / distributed-Ewald local
      // operator per the domain — memory scales with the mesh.
      // Omit for single-device.  Physics is identical; see parallel/.
}
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def build_forces(specs, default_box=None):
    from rigid_body_light_tpu import forces

    fns = []
    for s in specs or []:
        t = s["type"]
        if t == "gravity":
            fns.append(forces.gravity(np.asarray(s["value"], np.float64)))
        elif t == "wall_repulsion":
            fns.append(forces.wall_repulsion(
                s["strength"], s["debye_length"], s.get("radius", 1.0)))
        elif t == "harmonic_trap":
            fns.append(forces.harmonic_trap(s["k"], np.asarray(s["center"])))
        elif t == "pair_yukawa":
            # inherit the simulation box so the repulsion sees the same
            # geometry as the wrapped hydrodynamics by default
            box = s.get("box", default_box)
            box = tuple(box) if box else None
            fns.append(forces.pair_yukawa(
                s["strength"], s["debye_length"], s["diameter"], box=box))
        else:
            raise ValueError(f"unknown force type {t!r}")
    if not fns:
        return None
    return forces.sum_forces(*fns)


def place_bodies(spec, n_bodies, rng, wall):
    spec = spec or {"type": "grid"}
    t = spec.get("type", "grid")
    if t == "grid":
        spacing = spec.get("spacing", 2.5)
        z0 = spec.get("z0", 2.0)
        side = int(np.ceil(np.sqrt(n_bodies)))
        X = np.array([[spacing * (i % side), spacing * (i // side),
                       z0 + 0.2 * (i % 3)] for i in range(n_bodies)])
        Q = np.tile([1.0, 0, 0, 0], (n_bodies, 1))
    elif t == "random":
        lo = 1.0 if wall else -10.0
        X = np.zeros((n_bodies, 3))
        placed = 0
        while placed < n_bodies:
            cand = rng.uniform([lo] * 3, [10.0] * 3)
            if placed == 0 or np.linalg.norm(X[:placed] - cand, axis=1).min() > 2.0:
                X[placed] = cand
                placed += 1
        Q = rng.standard_normal((n_bodies, 4))
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    elif t == "file":
        with np.load(spec["path"]) as z:
            X, Q = z["X"], z["Q"]
    else:
        raise ValueError(f"unknown placement type {t!r}")
    return X, Q


def _build_mesh_mob(conf, cfg):
    """Optional ``mesh`` config key → (mesh, mob_apply, mode).

    mode "gather" (default): route the pair sweep through the gather-based
    multi-chip path (1-D row sharding or 2-D SUMMA per the shape) — the
    same ``mob_apply`` contract every solver/stepper entry point accepts.
    mode "distributed": the fully-sharded stepper (bodies, λ and the
    Krylov/Lanczos bases sharded; ring / sliced-far-field / distributed-
    Ewald local operator per the domain) — the caller must build the run
    with ``parallel.make_distributed_run_bd`` (mob_apply is None); 1-D
    shapes only, B divisible by the mesh size.
    """
    spec = conf.get("mesh")
    if not spec:
        return None, None, None
    import jax

    from rigid_body_light_tpu import parallel

    shape = list(spec.get("shape", [len(jax.devices())]))
    mode = spec.get("mode", "gather")
    if mode not in ("gather", "distributed"):
        raise ValueError(f"mesh mode must be 'gather' or 'distributed', "
                         f"got {mode!r}")
    n_req = int(np.prod(shape))
    n_avail = len(jax.devices())
    if n_req > n_avail:
        raise ValueError(
            f"mesh shape {shape} needs {n_req} devices but only {n_avail} "
            f"are visible (set XLA_FLAGS=--xla_force_host_platform_device_count "
            f"for CPU testing)"
        )
    if mode == "distributed":
        if len(shape) != 1:
            raise ValueError(
                f"mesh mode 'distributed' needs a 1-D shape, got {shape}")
        return parallel.make_mesh(shape[0]), None, mode
    if len(shape) == 1:
        mesh = parallel.make_mesh(shape[0])
    elif len(shape) == 2:
        mesh = parallel.make_mesh_2d(tuple(shape))
    else:
        raise ValueError(f"mesh shape must be 1-D or 2-D, got {shape}")
    return mesh, parallel.sharded_mobility_apply_fn(cfg, mesh), mode


def _chunking(conf):
    n_steps = conf["n_steps"]
    save_every = conf.get("save_every", 10)
    ckpt_every = conf.get("checkpoint_every", max(1, n_steps // 5))
    chunk = min(ckpt_every, n_steps)
    if chunk % save_every != 0:
        raise ValueError(
            f"checkpoint_every ({chunk}) must be a multiple of save_every "
            f"({save_every}) — otherwise trajectory frames are dropped"
        )
    if n_steps % chunk != 0:
        raise ValueError(
            f"n_steps ({n_steps}) must be a multiple of checkpoint_every "
            f"({chunk}) — each checkpoint chunk is one compiled scan"
        )
    return n_steps, save_every, chunk


def _build_cfg(conf, a, dtype):
    from rigid_body_light_tpu import SimulationConfig

    # every key of the "solver" section maps straight onto a
    # SimulationConfig field (pc_mode, pc_refresh, lanczos_precond,
    # drift_mode, …); unknown keys raise at construction — typo detection
    solver = dict(conf.get("solver", {}))
    solver.setdefault("gmres_tol", 1e-4)
    solver.setdefault("gmres_restart", 40)
    solver.setdefault("gmres_maxiter", 80)
    solver.setdefault("lanczos_iters", 30)
    return SimulationConfig(
        a=a, eta=conf.get("eta", 1.0), dt=conf["dt"], kBT=conf.get("kBT", 0.0),
        wall=bool(conf.get("wall", False)), dtype=dtype,
        box=tuple(conf["box"]) if conf.get("box") else None,
        **solver,
    )


def main_multi(conf, args):
    """Mixture runs: the ``species`` config key drives the multi stack
    (``multi.run_bd_multi``); trajectory frames are the concatenated body
    list in species order (species boundaries recorded in the metadata)."""
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import load_structure, multi
    from rigid_body_light_tpu.runtime import TrajectoryWriter
    from rigid_body_light_tpu.state import BodyState, make_state
    from rigid_body_light_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    dtype = jnp.float64 if conf.get("dtype") == "float64" else jnp.float32
    rng = np.random.default_rng(conf.get("seed", 0))
    species = conf["species"]

    ref_cfgs, all_params = [], []
    for sp in species:
        params, blobs = load_structure(sp["structure"])
        scale = sp.get("scale", 1.0)
        ref_cfgs.append(np.asarray(blobs) * scale)
        all_params.append(params)
    a = conf.get("a") or all_params[0]["sep"] / 2
    cfg = _build_cfg(conf, a, dtype)
    mgeom = multi.MultiGeometry.create(
        ref_cfgs, dtype=dtype,
        radii=[sp.get("blob_radius") for sp in species])

    out_dir = conf.get("output_dir", "out")
    os.makedirs(out_dir, exist_ok=True)

    start_step = 0
    if args.resume:
        states, key, start_step, _ = load_checkpoint(args.resume, dtype=dtype)
        if isinstance(states, BodyState) or len(states) != len(species):
            raise RuntimeError(
                f"checkpoint {args.resume} does not match the configured "
                f"{len(species)}-species mixture"
            )
        print(f"resumed from {args.resume} at step {start_step}")
    else:
        states = []
        for sp in species:
            X, Q = place_bodies(sp.get("placement", conf.get("placement")),
                                sp["n_bodies"], rng, cfg.wall)
            states.append(make_state(X, Q, dtype=dtype))
        states = tuple(states)
        key = jax.random.key(conf.get("seed", 0))

    per_species_fns = [
        build_forces(sp.get("forces", conf.get("forces")),
                     default_box=conf.get("box"))
        for sp in species
    ]
    sizes = tuple(s.X.shape[0] for s in states)

    def force_fn(ss, i):
        return tuple(
            fn(s, i) if fn is not None else jnp.zeros((b, 6), dtype)
            for fn, s, b in zip(per_species_fns, ss, sizes)
        )

    n_steps, save_every, chunk = _chunking(conf)
    B_total = sum(sizes)

    # validate the mesh config BEFORE opening the trajectory writer — the
    # writer truncates an existing trajectory.rblt on open (append=False),
    # so a config error here must not destroy prior output
    mesh, mob_apply, mesh_mode = _build_mesh_mob(conf, cfg)
    if mesh_mode == "distributed":
        raise ValueError(
            "mesh mode 'distributed' is single-species only — mixtures run "
            "on the gather modes (omit 'mode' or set it to 'gather')")
    if mesh is not None:
        print(json.dumps({"mesh": dict(zip(map(str, mesh.axis_names),
                                           map(int, mesh.devices.shape))),
                          "mode": mesh_mode}), flush=True)

    traj_path = os.path.join(out_dir, "trajectory.rblt")
    writer = TrajectoryWriter(
        traj_path, B_total,
        dtype=np.dtype(np.float64 if dtype == jnp.float64 else np.float32),
        append=bool(args.resume),
    )

    run_chunk = jax.jit(functools.partial(
        multi.run_bd_multi, mgeom, cfg, n_steps=chunk, force_fn=force_fn,
        save_every=save_every, mob_apply=mob_apply,
    ))

    meta = {"config": conf, "species_sizes": list(sizes)}
    step = start_step
    t_start = time.perf_counter()
    while step < start_step + n_steps:
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        states, traj = run_chunk(states, key=sub)
        Xs = np.concatenate([np.asarray(x) for x in traj["X"]], axis=1)
        Qs = np.concatenate([np.asarray(q) for q in traj["Q"]], axis=1)
        dt_chunk = time.perf_counter() - t0
        for i in range(Xs.shape[0]):
            frame_step = step + (i + 1) * save_every
            writer.append(frame_step, frame_step * cfg.dt, Xs[i], Qs[i])
        step += chunk
        writer.flush()
        save_checkpoint(os.path.join(out_dir, "checkpoint.npz"), states, key,
                        step=step, metadata=meta)
        print(json.dumps({
            "step": step,
            "steps_per_sec": round(chunk / dt_chunk, 4),
            "max_residual": float(np.asarray(traj["residual"]).max()),
            "mean_gmres_iters": round(float(np.asarray(traj["iters"]).mean()), 1),
        }), flush=True)

    writer.flush()
    writer.close()
    total = time.perf_counter() - t_start
    print(json.dumps({
        "done": True, "total_steps": n_steps, "wall_time_s": round(total, 2),
        "trajectory": traj_path, "frames": writer.frames,
        "species_sizes": list(sizes),
    }))


def main(argv=None):
    parser = argparse.ArgumentParser(description="rigid_body_light_tpu run driver")
    parser.add_argument("config", help="JSON config path")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        conf = json.load(f)

    if "species" in conf:
        return main_multi(conf, args)

    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu import load_structure
    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.runtime import TrajectoryWriter
    from rigid_body_light_tpu.state import make_state
    from rigid_body_light_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params, blobs = load_structure(conf["structure"])
    a = conf.get("a") or params["sep"] / 2
    dtype = jnp.float64 if conf.get("dtype") == "float64" else jnp.float32
    cfg = _build_cfg(conf, a, dtype)
    geom = kin.make_ref_geometry(blobs, dtype=dtype)
    rng = np.random.default_rng(conf.get("seed", 0))

    out_dir = conf.get("output_dir", "out")
    os.makedirs(out_dir, exist_ok=True)

    start_step = 0
    if args.resume:
        state, key, start_step, _ = load_checkpoint(args.resume, dtype=dtype)
        if not hasattr(state, "X"):
            raise RuntimeError(
                f"checkpoint {args.resume} is a mixture checkpoint — add the "
                f"matching 'species' section to the config to resume it"
            )
        print(f"resumed from {args.resume} at step {start_step}")
    else:
        X, Q = place_bodies(conf.get("placement"), conf["n_bodies"], rng, cfg.wall)
        state = make_state(X, Q, dtype=dtype)
        key = jax.random.key(conf.get("seed", 0))

    force_fn = build_forces(conf.get("forces"), default_box=conf.get("box"))
    n_steps, save_every, chunk = _chunking(conf)

    B = state.X.shape[0]

    # mesh validation precedes the writer: opening trajectory.rblt without
    # --resume truncates it, so config errors must fire first
    mesh, mob_apply, mesh_mode = _build_mesh_mob(conf, cfg)
    if mesh_mode == "distributed" and B % mesh.devices.size != 0:
        raise ValueError(
            f"mesh mode 'distributed' needs n_bodies divisible by the mesh "
            f"size: B={B}, D={mesh.devices.size}")
    if mesh is not None:
        print(json.dumps({"mesh": dict(zip(map(str, mesh.axis_names),
                                           map(int, mesh.devices.shape))),
                          "mode": mesh_mode}), flush=True)

    traj_path = os.path.join(out_dir, "trajectory.rblt")
    writer = TrajectoryWriter(
        traj_path, B,
        dtype=np.dtype(np.float64 if dtype == jnp.float64 else np.float32),
        append=bool(args.resume),
    )

    if mesh_mode == "distributed":
        from rigid_body_light_tpu import parallel

        run_chunk = jax.jit(parallel.make_distributed_run_bd(
            geom, cfg, mesh, n_steps=chunk, force_fn=force_fn,
            save_every=save_every,
        ))
    else:
        run_chunk = jax.jit(functools.partial(
            run_bd, geom, cfg, n_steps=chunk, force_fn=force_fn,
            save_every=save_every, mob_apply=mob_apply,
        ))

    step = start_step
    t_start = time.perf_counter()
    while step < start_step + n_steps:
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, traj = run_chunk(state, sub)
        Xs = np.asarray(traj["X"])  # host sync
        Qs = np.asarray(traj["Q"])
        dt_chunk = time.perf_counter() - t0
        for i in range(Xs.shape[0]):
            frame_step = step + (i + 1) * save_every
            writer.append(frame_step, frame_step * cfg.dt, Xs[i], Qs[i])
        step += chunk
        # make the trajectory durable BEFORE the checkpoint references it —
        # otherwise a crash leaves checkpoint.npz ahead of trajectory.rblt
        # and a resume creates a silent frame gap
        writer.flush()
        save_checkpoint(os.path.join(out_dir, "checkpoint.npz"), state, key,
                        step=step, metadata={"config": conf})
        print(json.dumps({
            "step": step,
            "steps_per_sec": round(chunk / dt_chunk, 4),
            "max_residual": float(np.asarray(traj["residual"]).max()),
            "mean_gmres_iters": round(float(np.asarray(traj["iters"]).mean()), 1),
        }), flush=True)

    writer.flush()
    writer.close()
    total = time.perf_counter() - t_start
    print(json.dumps({
        "done": True, "total_steps": n_steps, "wall_time_s": round(total, 2),
        "trajectory": traj_path, "frames": writer.frames,
    }))


if __name__ == "__main__":
    main()
