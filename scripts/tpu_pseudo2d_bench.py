"""Pallas exact doubly-periodic image sweep: TPU cost scaling (round 5).

Times the wall mobility matvec at bench-like density for image_shells
S ∈ {0, 1, 2, 4} on the Pallas kernel and S=2 on the XLA sweep.  The
in-kernel offset lattice costs ≤ (2S+1)² × the minimum-image sweep (same
pair fields, more displacements); the XLA twin was the only exact
doubly-periodic operator before round 5.

Usage: python scripts/tpu_pseudo2d_bench.py [n_blobs=10240] [case ...]
  cases: p0 p1 p2 p4 x2   (default: all)
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    cases = sys.argv[2:] or ["p0", "p1", "p2", "p4", "x2"]
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import rpy, rpy_pallas

    a, eta = 0.243553, 1.0
    rng = np.random.default_rng(0)
    # slab at the headline workload's volume fraction, (Lx, Ly) box
    side = 12.0 * np.sqrt(n / 10240.0)
    box = (2 * side, 2 * side)
    r = jnp.asarray(rng.uniform([0, 0, 1.0 * a], [box[0], box[1], 16 * a],
                                (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    REPS = 10

    def _renorm(u):
        return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

    def chain(apply_fn):
        @jax.jit
        def run(F):
            def body(_, v):
                return _renorm(apply_fn(v))
            return jax.lax.fori_loop(0, REPS, body, F)
        return run

    u_ref = {}
    for case in cases:
        S = int(case[1])
        if case[0] == "p":
            ap = chain(lambda v, S=S: rpy_pallas.mobility_apply(
                v, r, a=a, eta=eta, wall=True, box=box, image_shells=S))
        else:
            ap = chain(lambda v, S=S: rpy.mobility_apply(
                v, r, a=a, eta=eta, wall=True, box=box, image_shells=S,
                row_tile=512))
        t0 = time.perf_counter()
        u = ap(F)
        s = float(jnp.sum(u))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        u = ap(F)
        _ = float(jnp.sum(u))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        rec = {"case": case, "n": n, "S": S,
               "ms_per_apply": round(ms, 2),
               "compile_s": round(compile_s, 0),
               "finite": bool(np.isfinite(s))}
        u_ref[case] = np.asarray(u)
        if case == "x2" and "p2" in u_ref:
            err = (np.abs(u_ref["p2"] - u_ref["x2"]).max()
                   / np.abs(u_ref["x2"]).max())
            rec["pallas_vs_xla_rel_err"] = float(err)
        print(json.dumps(rec), flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
