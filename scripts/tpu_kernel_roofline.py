"""Pallas pair-kernel roofline study on the real TPU chip.

Answers VERDICT round-1 item 3 honestly:
  1. measure achievable VPU f32 peak with a pure-FMA kernel of the same
     tile/loop structure as the pair sweep,
  2. time the pair sweep (free/wall, 1-RHS/2-RHS) and report %-of-VPU-peak,
  3. sweep (TR, TC) tile shapes.

Each kernel variant costs ~4-6 min of remote Mosaic compile through the
axon tunnel — run as a background job.  Usage:
    python scripts/tpu_kernel_roofline.py [peak|sweep|tiles]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 10240
REPS = 30


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time(fn, reps=REPS):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / reps


def measure_vpu_peak():
    """Pure-FMA kernel with the pair sweep's exact tile/loop skeleton: grid
    over TR-row tiles, fori_loop over TC-column tiles, (TR, TC) f32 tiles,
    lane-axis reduction at the end.  FLOPs are unambiguous (2 per FMA)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR, TC = 128, 512
    CHAIN = 64  # FMAs per (row-tile, col-tile) element

    def kernel(rows_ref, cols_ref, out_ref):
        i = pl.program_id(0)
        x = rows_ref[0, pl.ds(i * TR, TR)].reshape(TR, 1)
        n_tiles = N // TC

        def col_tile(j, acc):
            c = cols_ref[0, pl.ds(j * TC, TC)].reshape(1, TC)
            v = x * c
            for _ in range(CHAIN):
                v = v * jnp.float32(1.000001) + c
            return acc + jnp.sum(v, axis=1, keepdims=True)

        acc = jax.lax.fori_loop(0, n_tiles, col_tile, jnp.zeros((TR, 1), jnp.float32))
        out_ref[0, :] = acc.reshape(1, TR)[0]
        out_ref[1:8, :] = jnp.zeros((7, TR), jnp.float32)

    @jax.jit
    def run(P):
        return pl.pallas_call(
            kernel,
            grid=(N // TR,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        )(P, P)

    P = jnp.ones((8, N), jnp.float32)
    dt = _time(lambda: run(P))
    flops = N * N * (CHAIN * 2 + 2)
    print(f"VPU peak probe (FMA chain, same skeleton): {dt*1e3:.3f} ms, "
          f"{flops/dt/1e12:.2f} TFLOP/s", flush=True)
    return flops / dt


def _chained_kernel_time(wall, k, sym, reps=20):
    """Time the raw packed sweep with ZERO per-rep host dispatch: pack once,
    chain `reps` kernel calls inside one jit via a data dependency (the
    output rows become the next force rows, max-normalized to stay finite),
    sync once.  Per-rep Python dispatch through the axon tunnel otherwise
    dwarfs a ~5 ms kernel."""
    import jax
    import jax.numpy as jnp
    from rigid_body_light_tpu.ops import rpy_pallas

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform([-60, -60, 1.0], [60, 60, 30], (N, 3)),
                    jnp.float32)
    Fk = jnp.asarray(rng.standard_normal((k, N, 3)), jnp.float32)
    n_pad = -(-N // rpy_pallas.TC) * rpy_pallas.TC
    P0 = rpy_pallas._pack(r, Fk, n_pad)
    off = jnp.zeros((2,), jnp.int32)
    h_floor = 0.75

    def body(_, P):
        if sym:
            out = rpy_pallas._pair_sweep_sym(P, n_pad, wall, k, h_floor)
        else:
            out = rpy_pallas._pair_sweep_packed(
                P, P, off, N, n_pad, n_pad, wall, k, h_floor)
        scale = 1.0 / jnp.maximum(jnp.max(jnp.abs(out[: 3 * k])), 1e-20)
        return P.at[3 : 3 + 3 * k].set(out[: 3 * k] * scale)

    @jax.jit
    def chain(P):
        return jax.lax.fori_loop(0, reps, body, P)

    P = chain(P0)           # compile + warm
    _sync(P)
    t0 = time.perf_counter()
    P = chain(P)
    _sync(P)
    return (time.perf_counter() - t0) / reps


def sweep_pair_kernel(sym=False):
    tag = "sym" if sym else "ord"
    for wall in (False, True):
        for k in (1, 2):
            dt = _chained_kernel_time(wall, k, sym)
            # "-equiv" flop model: ordered pairs; sym executes ~half the
            # field work so its equiv-TFLOP/s is reported on the SAME model
            # (useful ordered-pair work per second) for comparability.
            flops_pair = (60 if wall else 25) + k * (30 if wall else 15)
            print(f"pair_sum[{tag}] wall={wall} k={k}: {dt*1e3:.3f} ms "
                  f"({N*N*flops_pair/dt/1e12:.2f} TFLOP/s-equiv)", flush=True)


def sweep_tiles(sym=False):
    """Recompile the kernel at several (TR, TC) and time the wall sweep."""
    from rigid_body_light_tpu.ops import rpy_pallas

    base = (rpy_pallas.TR, rpy_pallas.TC)
    for TR, TC in ((128, 512), (256, 512), (64, 512), (128, 1024),
                   (128, 256), (256, 1024), (512, 512)):
        rpy_pallas.TR, rpy_pallas.TC = TR, TC
        rpy_pallas._pair_sweep_packed._clear_cache()
        rpy_pallas._pair_sweep_sym._clear_cache()
        try:
            dt = _chained_kernel_time(True, 1, sym)
            print(f"TR={TR} TC={TC}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"TR={TR} TC={TC}: FAILED {type(e).__name__}: {e}", flush=True)
    rpy_pallas.TR, rpy_pallas.TC = base


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("peak", "all"):
        measure_vpu_peak()
    if which in ("sweep", "all"):
        sweep_pair_kernel(sym=False)
    if which in ("sym", "all"):
        sweep_pair_kernel(sym=True)
    if which in ("tiles",):
        sweep_tiles()
    if which in ("tiles-sym",):
        sweep_tiles(sym=True)
