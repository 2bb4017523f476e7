"""Balanced-splitting (sorted-tile) Ewald vs the all-pairs Pallas sweep.

Measures the periodic mobility matvec on the real chip at bench-like
density for several real-space cutoffs rc, including a periodic scale
point (102,400 blobs) the all-pairs O(N²) path cannot reach usefully.
Run as a background job; serialize with other TPU work.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import ewald, ewald_pallas

    a, eta = 0.243553, 1.0
    REPS = 10
    rng = np.random.default_rng(0)

    cases = [
        (10240, 14.0, (2.5, 3.5)),
        (40960, 22.0, (2.5, 3.5, 4.5)),
        (102400, 30.0, (3.5,)),
        # round 5: hunt the crossover the 10k-102k table ruled out — the
        # balanced path's wave k-count grows ~N at fixed rc while the
        # all-pairs sweep grows N² (and its VMEM packing tops out ~300k)
        (204800, 38.0, (4.5,)),
        (409600, 48.0, (5.5,)),
    ]
    if len(sys.argv) > 1:  # one case per process (tunnel stability)
        cases = [cases[int(sys.argv[1])]]
    for n, L, rcs in cases:
        r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
        F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        out = {"n_blobs": n, "box": L}

        if n <= 50000:  # all-pairs baseline (measured separately at 102k)
            params0 = ewald.make_params((L, L, L), a, eta, tol=1e-4)

            @jax.jit
            def ap_chain(F):
                def body(_, v):
                    return ewald_pallas.mobility_apply(v, r, params0)
                return jax.lax.fori_loop(0, REPS, body, F)

            t0 = time.perf_counter()
            _sync(ap_chain(F))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            _sync(ap_chain(F))
            out["allpairs_pallas_ms"] = round(
                (time.perf_counter() - t0) / REPS * 1e3, 2)
            out["allpairs_compile_s"] = round(comp, 0)
            print(json.dumps(out), flush=True)
            time.sleep(5)

        for rc in rcs:
            params = ewald.make_params((L, L, L), a, eta, tol=1e-4, rc=rc)

            @jax.jit
            def bal_chain(F):
                def body(_, v):
                    return ewald.mobility_apply(v, r, params)
                return jax.lax.fori_loop(0, REPS, body, F)

            rec = {"n_blobs": n, "rc": rc, "xi": round(params.xi, 3),
                   "k_vectors": int(len(params.kvecs))}
            t0 = time.perf_counter()
            u = bal_chain(F)
            s = _sync(u)
            rec["compile_s"] = round(time.perf_counter() - t0, 0)
            if not np.isfinite(s):
                rec["error"] = "non-finite (neighbor overflow?)"
                print(json.dumps(rec), flush=True)
                continue
            t0 = time.perf_counter()
            _sync(bal_chain(F))
            rec["balanced_ms"] = round(
                (time.perf_counter() - t0) / REPS * 1e3, 2)
            print(json.dumps(rec), flush=True)
            time.sleep(5)


if __name__ == "__main__":
    main()
