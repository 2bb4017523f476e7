"""Scoped experiment (VERDICT round-2 item 9): can a low-rank / hierarchical
far field beat the O(N²) pair sweep beyond ~100k blobs, and is it worth
building on TPU?

Measures the actual numerical rank of well-separated RPY tile blocks (the
quantity every H-matrix/FMM scheme lives off) on a bench-like suspension,
then converts ranks into a TPU cost model: low-rank tile products are MXU
matmuls (measured ~20x the VPU rate the elementwise pair fields run at),
so the crossover is not "fewer flops" but "flops moved from VPU to MXU".
Output feeds the go/no-go note in BENCH_NOTES.md.

Usage: python scripts/lowrank_farfield_study.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from rigid_body_light_tpu.ops import rpy  # noqa: E402

A = 0.243553  # bench blob radius (shell_N_642 sep/2)
RNG = np.random.default_rng(7)


def tile(center, n, half):
    """n blobs uniform in a cube of half-width ``half`` around center."""
    return center + RNG.uniform(-half, half, (n, 3))


def block(ri, rj):
    """Dense free-space RPY block M_ij (3Ti, 3Tj) between two tiles."""
    r_all = jnp.asarray(np.vstack([ri, rj]))
    M = np.asarray(rpy.mobility_matrix(r_all, a=A, wall=False))
    ni = 3 * len(ri)
    return M[:ni, ni:]


def main():
    T = 512            # blobs per tile (the Pallas column-tile size)
    # tile geometry matched to the bench: 10,272 blobs of radius a in a
    # ~10x10x3 slab -> number density ~34/unit^3 -> 512 blobs occupy a cube
    # of half-width ~1.23
    half = (T / 34.0) ** (1 / 3) / 2 * 2.0
    print(f"tile: {T} blobs, cube half-width {half:.2f} "
          f"(diameter {2*half:.2f})", flush=True)
    results = []
    for sep_factor in (1.5, 2.0, 3.0, 5.0, 9.0):
        sep = sep_factor * 2 * half
        ri = tile(np.zeros(3), T, half)
        rj = tile(np.array([sep, 0, 0]), T, half)
        Mb = block(ri, rj)
        sv = np.linalg.svd(Mb, compute_uv=False)
        # rank for relative spectral error vs the SELF-mobility scale (what
        # matters for the total matvec: off-diag error relative to diag)
        self_scale = 1.0 / (6 * np.pi * A)
        ranks = {}
        for tol in (1e-2, 1e-3, 1e-4, 1e-5):
            thresh = tol * self_scale
            ranks[f"{tol:g}"] = int((sv > thresh).sum())
        results.append({
            "sep_over_diam": sep_factor, "sep": round(sep, 2),
            "sv0_over_self": round(float(sv[0] / self_scale), 4),
            "rank_at": ranks,
        })
        print(json.dumps(results[-1]), flush=True)

    # TPU cost model: pair fields ~60 VPU flops/pair at the measured
    # 2.09 TFLOP/s-equivalent; a rank-k tile product is 2*(3T)*k*2 flops of
    # MXU matmul at ~40 TFLOP/s f32 (v5e) => per-tile-pair cost ratio
    print("\ncost model per 512x512 tile pair (wall sweep):", flush=True)
    vpu_cost = T * T * 60 / 2.09e12
    for k in (8, 16, 32, 64, 128):
        mxu_cost = 2 * (3 * T) * k * 2 * 2 / 40e12
        print(f"  rank {k:3d}: low-rank/full cost = "
              f"{mxu_cost / vpu_cost:.3f}", flush=True)


if __name__ == "__main__":
    main()
