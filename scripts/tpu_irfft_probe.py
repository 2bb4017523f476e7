"""Characterize the axon-TPU irfftn miscompile (round-5 rc45 anomaly).

tpu_fft_probe.py found: rfftn is clean at (1,80,80,80,B) for all B, but
the irfftn ROUNDTRIP at B=192 trailing lanes returns garbage (abs err
1.496 on unit-normal data) while B=8 is clean.  This harness bisects the
failing batch width and tests workaround layouts (leading batch, chunked
lanes) to pick the production fix for ewald_pme / farfield.

Usage: python scripts/tpu_irfft_probe.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.key(7)

    def run(name, shape, axes, stride):
        def fwd_bwd(k):
            x = jax.random.normal(k, shape, jnp.float32)
            xh = jnp.fft.rfftn(x, axes=axes)
            xr = jnp.fft.irfftn(xh, s=tuple(shape[a] for a in axes),
                                axes=axes)
            return jnp.max(jnp.abs(xr - x))

        t0 = time.perf_counter()
        dmax = jax.jit(fwd_bwd)(key)
        out = {"case": name, "abs_err_roundtrip": float(dmax),
               "wall_s": round(time.perf_counter() - t0, 1)}
        print(json.dumps(out), flush=True)
        time.sleep(3)

    G = 80
    # trailing-batch bisect
    for B in (16, 32, 64, 96, 128, 192):
        run(f"trail_B{B}", (1, G, G, G, B), (1, 2, 3), max(B // 8, 1))
    # leading batch (transposed layout candidate)
    run("lead_B192", (192, G, G, G), (1, 2, 3), 24)
    # clean row's grid for reference: rc=3.5/L=30 used a larger grid
    run("trail_G100_B192", (1, 100, 100, 100, 192), (1, 2, 3), 24)


if __name__ == "__main__":
    main()
