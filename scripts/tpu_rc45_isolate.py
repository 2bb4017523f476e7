"""Isolate the on-chip rc=4.5/L=30/102k anomaly (BENCH_NOTES round 5).

The composed balanced-split + PME operator measured rel err 0.27 on chip
at this configuration while every component matches f64 off-chip
(real 5.5e-4, PME wave 1.2e-6, PME-vs-dense 9e-6).  This harness runs
each component on the TPU against the saved f64 CPU references
(/tmp/rc45_ref.npz, produced by the CPU side of the round-5 diagnosis)
and re-runs the worst one under ``jax.default_matmul_precision
("highest")`` — the prime suspect is the TPU's default bf16 matmul
inputs in the big contraction axes (tile-sweep n-axis einsums, PME FFT
twiddle matmuls).

Usage: python scripts/tpu_rc45_isolate.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from rigid_body_light_tpu.ops import ewald, ewald_cells, ewald_pme

    ref = np.load("/tmp/rc45_ref.npz")
    a, n, L, rc = 0.243553, 102400, 30.0, 4.5
    pc = ewald.make_params((L, L, L), a, 1.0, tol=1e-4, rc=rc)
    g = ewald_pme.make_grid(pc, p=4)
    r = jnp.asarray(ref["r"])
    F = jnp.asarray(ref["F"])

    def err(u, key):
        u = np.asarray(u, np.float64)
        return float(np.abs(u - ref[key]).max() / np.abs(ref[key]).max())

    real_fn = jax.jit(lambda f: ewald_cells.real_space_apply_cells(
        f, r, pc))
    wave_fn = jax.jit(lambda f: ewald_pme.wave_space_apply_grid(
        f, r, pc, g))
    for name, fn, key in (("real_cells", real_fn, "ur"),
                          ("wave_pme", wave_fn, "uw")):
        t0 = time.perf_counter()
        u = fn(F)
        e = err(u, key)
        rec = {"component": name, "rel_err_vs_cpu_f64": e,
               "wall_s": round(time.perf_counter() - t0, 1)}
        with jax.default_matmul_precision("highest"):
            u_hi = jax.jit(lambda f: (
                ewald_cells.real_space_apply_cells(f, r, pc)
                if name == "real_cells"
                else ewald_pme.wave_space_apply_grid(f, r, pc, g)))(F)
        rec["rel_err_highest"] = err(u_hi, key)
        print(json.dumps(rec), flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
