"""Round 3: pin the corrupted op and lanes (forward-FFT hypothesis).

Probe 2 showed the inverse-FFT layout is irrelevant (bit-identical wrong
roundtrip with plain/moved/barrier inverses), and probe 1's "clean
forward" check only sampled every-24th lane.  Hypothesis: the FORWARD
rfftn with trailing lanes at (80,80,80,B>=64) corrupts lanes the stride
misses.  All comparisons here run on-device between layouts (no big
downloads), with a small exact CPU cross-check on a handful of
non-multiple-of-24 lanes.

Usage: python scripts/tpu_irfft_probe3.py
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
    G, B = 80, 192
    axes_lead = (1, 2, 3)

    def gen(k):
        return jax.random.normal(k, (B, G, G, G), jnp.float32)

    @jax.jit
    def fwd_compare(k):
        x = gen(k)
        xh_lead = jnp.fft.rfftn(x, axes=axes_lead)           # (B,G,G,Gh)
        xt = lax.optimization_barrier(jnp.moveaxis(x, 0, -1))
        xh_trail = jnp.fft.rfftn(xt, axes=(0, 1, 2))         # (G,G,Gh,B)
        d = jnp.abs(jnp.moveaxis(xh_trail, -1, 0) - xh_lead)
        scale = jnp.max(jnp.abs(xh_lead))
        per_lane = jnp.max(d.reshape(B, -1), axis=1) / scale
        return per_lane

    t0 = time.perf_counter()
    per_lane = np.asarray(fwd_compare(key))
    bad = np.where(per_lane > 1e-3)[0]
    print(json.dumps({
        "case": "fwd_trail_vs_lead", "n_bad_lanes": int(bad.size),
        "bad_lanes_first32": bad[:32].tolist(),
        "max_rel": float(per_lane.max()),
        "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)
    time.sleep(3)

    # CPU truth for 8 non-multiple-of-24 lanes of the LEAD layout
    lanes = [1, 2, 3, 50, 65, 97, 130, 191]

    @jax.jit
    def lead_slice(k):
        xh = jnp.fft.rfftn(gen(k), axes=axes_lead)
        sl = xh[jnp.asarray(lanes)]
        return jnp.real(sl), jnp.imag(sl)

    t0 = time.perf_counter()
    re_t, im_t = lead_slice(key)
    xh_t = np.asarray(re_t) + 1j * np.asarray(im_t)
    with jax.default_device(jax.devices("cpu")[0]):
        x_c = np.asarray(jax.jit(gen)(key))
    ref = np.fft.rfftn(x_c[lanes].astype(np.float64), axes=axes_lead)
    err = float(np.abs(xh_t - ref).max() / np.abs(ref).max())
    print(json.dumps({"case": "lead_vs_cpu_f64_lanes", "rel_err": err,
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
