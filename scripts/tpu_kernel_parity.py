"""Pallas kernel accuracy/speed vs the XLA path on the real TPU.

Expected (BENCH_NOTES.md): kernel ~3e-7 relative vs f64 oracle, XLA ~2e-3
(approximate VPU reciprocals), kernel ~2x faster at 10k blobs.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from rigid_body_light_tpu.ops import rpy, rpy_pallas

sys.path.insert(0, "tests")
import oracle  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


def main():
    rng = np.random.default_rng(0)
    # accuracy at N=600 vs the f64 oracle
    r64 = rng.uniform([-20, -20, 0.5], [20, 20, 30], (600, 3))
    F64 = rng.standard_normal((600, 3))
    for wall in (False, True):
        Uref = oracle.apply_M(F64, r64, 0.9, 1.3, wall).reshape(-1, 3)
        scale = np.abs(Uref).max()
        r = jnp.asarray(r64, jnp.float32)
        F = jnp.asarray(F64, jnp.float32)
        U_p = np.asarray(rpy_pallas.mobility_apply(F, r, 0.9, 1.3, wall))
        U_x = np.asarray(rpy.mobility_apply(F, r, 0.9, 1.3, wall))
        print(f"wall={wall}: pallas err {np.abs(U_p - Uref).max() / scale:.2e}  "
              f"xla err {np.abs(U_x - Uref).max() / scale:.2e}")
    # speed at N=10240
    N = 10240
    r = jnp.asarray(rng.uniform([-60, -60, 1], [60, 60, 60], (N, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    for name, f in (("pallas", lambda F_, r_: rpy_pallas.mobility_apply(F_, r_, 1.0, 1.0, True)),
                    ("xla", lambda F_, r_: rpy.mobility_apply(F_, r_, 1.0, 1.0, True))):
        def chain(F0):
            def body(Fc, _):
                U = f(Fc, r)
                return U / jnp.linalg.norm(U), None
            return jax.lax.scan(body, F0, None, length=10)[0]
        c = jax.jit(chain)
        sync(c(F))
        t0 = time.perf_counter()
        sync(c(F))
        print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/matvec @ N={N} (wall)")


if __name__ == "__main__":
    main()
