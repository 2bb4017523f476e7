"""Probe TPU rfftn/irfftn accuracy at the rc45-anomaly shapes.

The composed balanced-split + PME operator is clean on CPU but carries
rel err 0.35 on chip at grid (80,80,80) (BENCH_NOTES round 5, rc=4.5 /
L=30 / 102k).  ``jax.default_matmul_precision("highest")`` does not move
it, so the suspect list is the FFT stages and the scatter/einsum
layouts.  This harness isolates the FFTs: identical pseudo-random fields
are generated on BOTH backends from the same threefry key (JAX PRNG is
backend-deterministic), transformed, and compared against numpy f64.

Usage: python scripts/tpu_fft_probe.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    key = jax.random.key(7)

    cases = [
        # (name, shape, fft axes, lane stride for download bounding —
        # the FFT runs on the FULL buffer; only the comparison slices)
        ("cube80", (80, 80, 80), (0, 1, 2), 1),
        ("cube96", (96, 96, 96), (0, 1, 2), 1),
        ("batched80_B8", (1, 80, 80, 80, 8), (1, 2, 3), 1),
        ("batched80_B192", (1, 80, 80, 80, 192), (1, 2, 3), 24),
    ]
    for name, shape, axes, stride in cases:

        def fwd_bwd(k):
            x = jax.random.normal(k, shape, jnp.float32)
            xh = jnp.fft.rfftn(x, axes=axes)
            xr = jnp.fft.irfftn(xh, s=tuple(shape[a] for a in axes),
                                axes=axes)
            if stride > 1:
                x, xh, xr = (v[..., ::stride] for v in (x, xh, xr))
            # the axon tunnel cannot download complex arrays (UNIMPLEMENTED)
            return x, jnp.real(xh), jnp.imag(xh), xr

        t0 = time.perf_counter()
        x_t, xhr_t, xhi_t, xr_t = jax.jit(fwd_bwd)(key)
        x_t = np.asarray(x_t)
        xh_t = np.asarray(xhr_t) + 1j * np.asarray(xhi_t)
        xr_t = np.asarray(xr_t)
        wall = time.perf_counter() - t0
        with jax.default_device(cpu):
            x_c = np.asarray(jax.jit(
                lambda k: jax.random.normal(k, shape, jnp.float32))(key))
        if stride > 1:
            x_c = x_c[..., ::stride]
        same_input = bool(np.array_equal(x_t, x_c))
        ref = np.fft.rfftn(x_c.astype(np.float64), axes=axes)
        scale = np.abs(ref).max()
        err_f = float(np.abs(xh_t - ref).max() / scale)
        err_rt = float(np.abs(xr_t - x_c).max())
        print(json.dumps({
            "case": name, "same_input_bits": same_input,
            "rel_err_fwd": err_f, "abs_err_roundtrip": err_rt,
            "wall_s": round(wall, 1)}), flush=True)
        del x_t, xh_t, xr_t, ref
        time.sleep(3)


if __name__ == "__main__":
    main()
