"""Round 2 of the irfftn-miscompile characterization: fix candidates.

tpu_irfft_probe.py: trailing-lane irfftn at G=80 breaks for B>=64;
PHYSICALLY lane-leading data is clean.  But wrapping the apply-path
FFTs in moveaxis pairs produced a BIT-IDENTICAL wrong answer — XLA
cancels the transposes against the FFT's internal ones and compiles the
same broken program.  This probe tests in-graph fix candidates on the
roundtrip at (1, 80, 80, 80, 192), axes (1,2,3):

  plain      — trailing lanes (known broken, control)
  moved      — moveaxis to lane-leading, no barrier (expect still broken)
  barrier    — moveaxis + lax.optimization_barrier pinning the layout
  chunk32    — lax.map over 6 lane-chunks of 32 (B<=32 measured clean)

Usage: python scripts/tpu_irfft_probe2.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    key = jax.random.key(7)
    shape = (1, 80, 80, 80, 192)
    axes = (1, 2, 3)
    s = (80, 80, 80)

    def plain(xh):
        return jnp.fft.irfftn(xh, s=s, axes=axes)

    def moved(xh):
        y = jnp.fft.irfftn(jnp.moveaxis(xh, -1, 0), s=s,
                           axes=(2, 3, 4))
        return jnp.moveaxis(y, 0, -1)

    def barrier(xh):
        z = lax.optimization_barrier(jnp.moveaxis(xh, -1, 0))
        y = lax.optimization_barrier(
            jnp.fft.irfftn(z, s=s, axes=(2, 3, 4)))
        return jnp.moveaxis(y, 0, -1)

    def chunk32(xh):
        xc = jnp.moveaxis(xh.reshape(xh.shape[:-1] + (6, 32)), -2, 0)
        yc = lax.map(lambda v: jnp.fft.irfftn(v, s=s, axes=axes), xc)
        return jnp.moveaxis(yc, 0, -2).reshape(xh.shape[:-1] + (192,))

    for name, inv in (("plain", plain), ("moved", moved),
                      ("barrier", barrier), ("chunk32", chunk32)):

        def fwd_bwd(k):
            x = jax.random.normal(k, shape, jnp.float32)
            xh = jnp.fft.rfftn(x, axes=axes)
            return jnp.max(jnp.abs(inv(xh) - x))

        t0 = time.perf_counter()
        dmax = float(jax.jit(fwd_bwd)(key))
        print(json.dumps({"case": name, "abs_err_roundtrip": dmax,
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        time.sleep(3)


if __name__ == "__main__":
    main()
