"""Balanced-split Ewald with the PME (gridded) wave part vs all-pairs.

Round-4 recorded the balanced split (ewald_rc) LOSING to the all-pairs
in-kernel Clenshaw sweep at every size — its dense O(N·K) wave sum
dominated (k-count grows ~N at fixed rc).  The round-5 gridded wave part
(ops/ewald_pme.py) evaluates the same k-sum at O(N + G³p³ log G); this
harness measures whether the composed operator now wins, and from what
size.  One case per process (tunnel stability); run cases sequentially
with ~60 s between processes.

Usage: python scripts/tpu_ewald_pme_bench.py CASE_INDEX
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


CASES = [
    # (n, L, [(rc, grid_p or 0=dense wave)], measure_allpairs)
    (40960, 22.0, [(3.5, 0), (3.5, 4), (4.5, 4)], True),
    (102400, 30.0, [(3.5, 4), (4.5, 4)], True),
    # no all-pairs leg at 410k: the N² kernel compile kernel-faulted the
    # TPU worker at this size (measured once); extrapolate 690.5 ms × 16
    (409600, 48.0, [(4.5, 4), (5.5, 4)], False),
]


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import ewald, ewald_pallas, ewald_pme

    a, eta = 0.243553, 1.0
    REPS = 10
    n, L, variants, do_ap = CASES[int(sys.argv[1])]
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def _renorm(u):
        return u * jax.lax.rsqrt(jnp.mean(u * u) + 1e-30)

    def chain(apply_fn):
        @jax.jit
        def run(F):
            def body(_, v):
                return _renorm(apply_fn(v))
            return jax.lax.fori_loop(0, REPS, body, F)
        return run

    u_ref = None
    if do_ap:
        params0 = ewald.make_params((L, L, L), a, eta, tol=1e-4)
        ap = chain(lambda v: ewald_pallas.mobility_apply(v, r, params0))
        t0 = time.perf_counter()
        _sync(ap(F))
        comp = round(time.perf_counter() - t0, 0)
        t0 = time.perf_counter()
        _sync(ap(F))
        ms = round((time.perf_counter() - t0) / REPS * 1e3, 2)
        print(json.dumps({"n_blobs": n, "variant": "allpairs_pallas",
                          "apply_ms": ms, "compile_s": comp}), flush=True)
        u_ref = jax.jit(
            lambda v: ewald_pallas.mobility_apply(v, r, params0))(F)
        _sync(u_ref)
        time.sleep(5)

    for rc, gp in variants:
        params = ewald.make_params((L, L, L), a, eta, tol=1e-4, rc=rc)
        grid = ewald_pme.make_grid(params, p=gp) if gp else None
        rec = {"n_blobs": n, "variant": f"rc{rc}" + (f"_pme{gp}" if gp
                                                     else "_dense"),
               "k_vectors": int(len(params.kvecs)),
               "xi": round(float(params.xi), 3)}
        if gp:
            rec["fft_grid"] = list(grid.grid)
        fn = lambda v: ewald.mobility_apply(v, r, params, grid=grid)
        bal = chain(fn)
        t0 = time.perf_counter()
        _sync(bal(F))
        rec["compile_s"] = round(time.perf_counter() - t0, 0)
        t0 = time.perf_counter()
        _sync(bal(F))
        rec["apply_ms"] = round((time.perf_counter() - t0) / REPS * 1e3, 2)
        if u_ref is not None:
            u1 = jax.jit(fn)(F)
            rec["rel_err_vs_allpairs"] = float(
                jnp.max(jnp.abs(u1 - u_ref)) / jnp.max(jnp.abs(u_ref)))
        print(json.dumps(rec), flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
