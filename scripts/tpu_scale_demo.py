"""Scale-headroom demo on ONE TPU chip: ≥100k blobs.

VERDICT round-1 item 10: measure (a) the wall mobility matvec and (b) a
full fluctuating BD step at ~100k blobs (shell_N_2562 bodies), and probe
where the Pallas VMEM packing (docstring claim: ~300k blobs) actually tops
out.  The matvec uses the dispatch-free chained harness (see
tpu_kernel_roofline.py); the BD step is the production `run_bd` scan.

Block PC is infeasible at this body resolution (per-body 7686² dense
inverse), so the BD step runs the diag PC — the reference's own default
(`block_diag_PC=false`).  Remote compile at this size is slow; run as a
background job.

Usage:
    python scripts/tpu_scale_demo.py [matvec|step|vmem|all]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BODIES = 40           # 40 x 2562 = 102,480 blobs


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _chained_matvec_time(n, reps=5):
    import jax
    import jax.numpy as jnp
    from rigid_body_light_tpu.ops import rpy_pallas

    rng = np.random.default_rng(0)
    # ~dense-suspension box at the bench's volume fraction
    side = 12.0 * np.sqrt(n / 10240.0)
    r = jnp.asarray(
        rng.uniform([-side, -side, 1.0], [side, side, 40], (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((1, n, 3)), jnp.float32)
    n_pad = -(-n // rpy_pallas.TC) * rpy_pallas.TC
    P0 = rpy_pallas._pack(r, F, n_pad)

    def body(_, P):
        out = rpy_pallas._pair_sweep_sym(P, n_pad, True, 1, 0.75)
        scale = 1.0 / jnp.maximum(jnp.max(jnp.abs(out[:3])), 1e-20)
        return P.at[3:6].set(out[:3] * scale)

    @jax.jit
    def chain(P):
        return jax.lax.fori_loop(0, reps, body, P)

    t0 = time.perf_counter()
    P = chain(P0)
    _sync(P)
    print(f"  [n={n}] compile+warm {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    P = chain(P)
    _sync(P)
    return (time.perf_counter() - t0) / reps


def measure_matvec():
    n = BODIES * 2562
    dt = _chained_matvec_time(n)
    flops = n * n * 90 / 2  # sym kernel: unordered pairs, wall k=1
    print(f"wall mobility matvec @ {n} blobs: {dt*1e3:.1f} ms "
          f"({flops/dt/1e12:.2f} TFLOP/s executed-sym)", flush=True)


def _scale_setup(kBT=1.0, lanczos_precond=True):
    import jax.numpy as jnp

    from rigid_body_light_tpu import SimulationConfig, load_structure

    params, cfgb = load_structure("shell_N_2562")
    B = BODIES
    side = int(np.ceil(np.sqrt(B)))
    xs = np.array([[2.6 * (i % side), 2.6 * (i // side), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    # round-2 shipped PC: block_free's per-body 7686² body-frame inverse is
    # computed once per trajectory (the per-step block PC build would be
    # infeasible here); diag remains available via pc_mode="diag"
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.005, kBT=kBT, wall=True,
        dtype=jnp.float32, lanczos_iters=6, lanczos_precond=lanczos_precond,
        gmres_tol=1e-4, gmres_restart=30, gmres_maxiter=90,
        pc_mode="block_free",
    )
    return params, cfgb, B, xs, qs, cfg


def measure_noise(precond=True):
    """Isolate the Lanczos noise draw at scale (the suspect: per-body
    7686² factor matmuls when preconditioned)."""
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.ops import lanczos
    from rigid_body_light_tpu.ops import saddle as saddle_mod
    from rigid_body_light_tpu.state import make_state

    params, cfgb, B, xs, qs, cfg = _scale_setup(lanczos_precond=precond)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    ops = saddle_mod.geometry_ops(geom, state)
    mob2 = saddle_mod.mobility_apply_multi_fn(cfg)
    pos = ops.flat_positions

    @jax.jit
    def draw(key):
        k1, k2 = jax.random.split(key)
        if precond:
            npc = lanczos.make_noise_preconditioner(
                geom.ref_cfg, cfg.a, cfg.eta, jnp.float32)
            m1, m2 = lanczos.m_half_w_precond(
                mob2, pos, ops.rot, npc[0], npc[1], (k1, k2),
                iters=cfg.lanczos_iters, multi=True)
        else:
            m1, m2 = lanczos.m_half_w_pair(
                mob2, pos, k1, k2, iters=cfg.lanczos_iters)
        return jnp.sum(m1) + jnp.sum(m2)

    t0 = time.perf_counter()
    v = float(draw(jax.random.key(0)))
    print(f"  noise draw (precond={precond}): compile+run "
          f"{time.perf_counter()-t0:.0f} s, value finite={np.isfinite(v)}",
          flush=True)
    t0 = time.perf_counter()
    v = float(draw(jax.random.key(1)))
    print(f"  noise draw warm: {time.perf_counter()-t0:.2f} s", flush=True)


def measure_step(kBT=1.0, farfield=False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.dynamics import run_bd
    from rigid_body_light_tpu.ops import kinematics as kin
    from rigid_body_light_tpu.state import make_state

    params, cfgb, B, xs, qs, cfg = _scale_setup(kBT=kBT)
    if farfield:
        # flat slab: anisotropic grid keeps cells near-cubic; the kernel
        # lattices rebuild per solve (positions change each step) and
        # amortize over the Krylov/Lanczos sweeps within it
        cfg = dataclasses.replace(cfg, farfield_grid=(12, 12, 3),
                                  farfield_p=4)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
    state = make_state(xs, qs, dtype=jnp.float32)
    n_blobs = B * params["N"]
    F = jnp.zeros((B, 6), jnp.float32).at[:, 2].set(-1.0)

    n_rep = 2
    runner = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_rep, force_fn=lambda s, i: F,
        save_every=n_rep,
    ))
    t0 = time.perf_counter()
    s, traj = runner(state, jax.random.key(0))
    _sync(s.X)
    print(f"  step compile+warm: {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    s, traj = runner(s, jax.random.key(1))
    _sync(s.X)
    dt = (time.perf_counter() - t0) / n_rep
    res = float(jnp.max(jnp.asarray(traj["residual"])))
    ok = bool(jnp.isfinite(s.X).all())
    kind = "fluctuating" if kBT > 0 else "deterministic"
    backend = "farfield" if farfield else "all-pairs"
    print(json.dumps({
        "metric": f"{kind} BD steps/sec @ {n_blobs} blobs "
                  f"({B}x shell_N_2562, wall, block_free PC, {backend})",
        "value": round(1.0 / dt, 4), "unit": "steps/s",
        "residual": res, "finite": ok,
    }), flush=True)


def probe_vmem():
    """Where does the whole-operand-in-VMEM packing stop compiling?"""
    for n in (153600, 204800, 307200, 409600):
        try:
            dt = _chained_matvec_time(n, reps=3)
            print(f"  VMEM probe n={n}: OK, {dt*1e3:.1f} ms/matvec", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  VMEM probe n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("matvec", "all"):
        measure_matvec()
    if which in ("step0",):
        measure_step(kBT=0.0)
    if which in ("noise",):
        measure_noise(precond=True)
    if which in ("noise-plain",):
        measure_noise(precond=False)
    if which in ("step", "all"):
        measure_step()
    if which in ("ffstep",):
        measure_step(farfield=True)
    if which in ("ffstep0",):
        measure_step(kBT=0.0, farfield=True)
    if which in ("vmem", "all"):
        probe_vmem()
