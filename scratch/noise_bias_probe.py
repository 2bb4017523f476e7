"""Probe the preconditioned-Lanczos noise covariance accuracy vs height.

Single shell_N_12 body near the wall (walkers in the failing equilibrium run
are effectively independent at 20-radii spacing) — compares the body-level
noise covariance K+ Cov K+^T of:
  - exact dense (BMB)^{1/2} (f64 oracle)
  - plain Lanczos f32 (iters=30)
  - preconditioned Lanczos f32 (iters=10)
and counts clamped (negative) T eigenvalues in both spaces.
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import tests.conftest  # cpu pin + x64
import numpy as np
import jax, jax.numpy as jnp
import oracle
from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.ops import kinematics as kin, lanczos, rpy
from rigid_body_light_tpu.state import make_state
from rigid_body_light_tpu.ops import saddle as sad

params, cfgb = load_structure("shell_N_12")
a = params["sep"] / 2
eta = 1.0
geom32 = kin.make_ref_geometry(cfgb, dtype=jnp.float32)
n = cfgb.shape[0]

def exact_body_cov(z):
    # dense f64: K+ (BMB) K+^T  (the body-velocity noise covariance)
    state = make_state([[0.,0.,z]], [[1.,0,0,0]], dtype=jnp.float64)
    geom64 = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    pos = np.asarray(kin.blob_positions(geom64, state.X, state.Q)).reshape(-1,3)
    M = oracle.rpy_matrix(pos, a, eta, wall=True)
    B3 = oracle.damping(pos, a)
    BMB = B3[:,None]*M*B3[None,:]
    offs = np.asarray(kin.blob_offsets(geom64, state.Q))[0]
    K = oracle.dense_K(offs[None])  # (3n, 6)
    Kp = np.linalg.pinv(K)
    return Kp @ BMB @ Kp.T, BMB, pos

def sampled_body_cov(z, mode, iters, n_draws=4000, dtype=jnp.float32):
    state = make_state([[0.,0.,z]], [[1.,0,0,0]], dtype=dtype)
    geom = kin.make_ref_geometry(cfgb, dtype=dtype)
    ops = sad.geometry_ops(geom, state)
    pos = ops.flat_positions
    cfg = SimulationConfig(a=a, dt=0.01, kBT=0.3, wall=True, dtype=dtype)
    mob = sad.mobility_apply_fn(cfg)
    if mode == "precond":
        L, Li = lanczos.make_noise_preconditioner(geom.ref_cfg, a, eta, dtype)
        def draw(key):
            x = lanczos.m_half_w_precond(mob, pos, ops.rot, L, Li, key, iters=iters)
            return kin.Kinv_dot(x.reshape(1, n, 3), ops.offsets, ops.ktkinv)[0]
    else:
        def draw(key):
            x = lanczos.m_half_w(mob, pos, key, iters=iters)
            return kin.Kinv_dot(x.reshape(1, n, 3), ops.offsets, ops.ktkinv)[0]
    draws = jax.jit(jax.vmap(draw))(jax.random.split(jax.random.key(0), n_draws))
    d = np.asarray(draws)
    return d.T @ d / n_draws

def clamp_counts(z, iters, dtype=jnp.float32):
    """Eigenvalues of the Lanczos T in M-space and G-space."""
    state = make_state([[0.,0.,z]], [[1.,0,0,0]], dtype=dtype)
    geom = kin.make_ref_geometry(cfgb, dtype=dtype)
    ops = sad.geometry_ops(geom, state)
    pos = np.asarray(ops.flat_positions)
    M = oracle.rpy_matrix(pos, a, eta, wall=True)
    B3 = oracle.damping(pos, a)
    BMB = B3[:,None]*M*B3[None,:]
    evM = np.linalg.eigvalsh(BMB)
    L, Li = lanczos.make_noise_preconditioner(geom.ref_cfg, a, eta, jnp.float64)
    R = np.asarray(ops.rot)[0]
    Rt = np.kron(np.eye(n), R)  # blkdiag per blob? careful: layout (n,3)
    # world vector x (3n,) ordered blob-major [b0x b0y b0z b1x ...]
    G = np.asarray(Li) @ Rt.T @ BMB @ Rt @ np.asarray(Li).T
    evG = np.linalg.eigvalsh(G)
    return evM, evG

for z in (0.85, 0.95, 1.1, 1.6, 2.5):
    exact, BMB, pos = exact_body_cov(z)
    evM, evG = clamp_counts(z, 10)
    zmin = pos[:,2].min()
    print(f"\n=== z={z} (lowest blob {zmin:.3f}) ===")
    print(f"  eig(BMB): min {evM.min():.3e} max {evM.max():.3e} neg {int((evM<0).sum())}")
    print(f"  eig(G):   min {evG.min():.3e} max {evG.max():.3e} neg {int((evG<0).sum())} cond {evG.max()/max(evG.min(),1e-30):.1f}")
    for mode, iters in (("plain", 30), ("precond", 10), ("precond", 25)):
        cov = sampled_body_cov(z, mode, iters)
        # z-z body translation variance ratio and worst diag ratio
        rzz = cov[2,2]/exact[2,2]
        diag_ratio = np.diag(cov)[:3]/np.diag(exact)[:3]
        print(f"  {mode:8s} it={iters:2d}: cov_zz ratio {rzz:.4f}, xyz diag ratios {np.round(diag_ratio,4)}")
