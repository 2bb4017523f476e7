"""Time stepping: deterministic sedimentation, stochastic scheme structure,
free-diffusion statistics of the full BD loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.dynamics import deterministic_step, run_bd, stochastic_step
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _shell(n=12):
    params, cfgb = load_structure(f"shell_N_{n}")
    return params, cfgb


def test_deterministic_sedimentation():
    params, cfgb = _shell()
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.1, dtype=jnp.float64)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    F = jnp.zeros((1, 6)).at[0, 2].set(-1.0)
    mu = 1.0 / (6 * np.pi)  # Rh = 1
    s = state
    for _ in range(3):
        s, aux = deterministic_step(geom, cfg, s, F)
    # fell by 3·dt·mu·F
    assert abs(float(s.X[0, 2]) + 3 * 0.1 * mu) < 1e-5
    assert float(aux.residual) < 1e-6


def test_stochastic_step_zero_kbt_equals_deterministic():
    params, cfgb = _shell()
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.05, kBT=0.0, dtype=jnp.float64)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    F = jnp.zeros((1, 6)).at[0, 2].set(-1.0)
    s_det, _ = deterministic_step(geom, cfg, state, F)
    s_sto, _ = stochastic_step(geom, cfg, state, jax.random.key(0), F)
    assert np.allclose(np.asarray(s_det.X), np.asarray(s_sto.X), atol=1e-14)
    assert np.allclose(np.asarray(s_det.Q), np.asarray(s_sto.Q), atol=1e-14)


@pytest.mark.medium
def test_run_bd_reproducible_and_finite():
    params, cfgb = _shell()
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=1.0,
                           dtype=jnp.float64, lanczos_iters=10)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0], [4.0, 0, 0]],
                       [[1.0, 0, 0, 0], [1.0, 0, 0, 0]], dtype=jnp.float64)
    final1, traj1 = run_bd(geom, cfg, state, jax.random.key(5), n_steps=10)
    final2, traj2 = run_bd(geom, cfg, state, jax.random.key(5), n_steps=10)
    # explicit keys → bitwise reproducible (unlike the reference's
    # clock-seeded rand, c_rigid_obj.cpp:731)
    assert np.array_equal(np.asarray(traj1["X"]), np.asarray(traj2["X"]))
    assert np.isfinite(np.asarray(traj1["X"])).all()
    qn = np.linalg.norm(np.asarray(traj1["Q"]), axis=-1)
    assert np.abs(qn - 1).max() < 1e-12
    # different key → different trajectory
    _, traj3 = run_bd(geom, cfg, state, jax.random.key(6), n_steps=10)
    assert not np.allclose(np.asarray(traj1["X"]), np.asarray(traj3["X"]))


@pytest.mark.slow
def test_free_diffusion_msd():
    """⟨|ΔX|²⟩ = 6·kBT·μ·t for a free sphere; statistical check over an
    ensemble of short trajectories (BASELINE config 3 workload)."""
    params, cfgb = _shell(12)
    kBT, dt, n_steps = 0.5, 0.05, 40
    cfg = SimulationConfig(a=params["sep"] / 2, dt=dt, kBT=kBT,
                           dtype=jnp.float64, lanczos_iters=12, gmres_tol=1e-8)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)

    # measured body mobility (exact for this discretization): Rh=1 → μ = 1/(6πη)
    mu = 1.0 / (6 * np.pi)

    n_ens = 24
    keys = jax.random.split(jax.random.key(42), n_ens)

    def one_traj(k):
        final, _ = run_bd(geom, cfg, state, k, n_steps=n_steps)
        return jnp.sum((final.X[0] - state.X[0]) ** 2)

    msd = np.asarray(jax.vmap(one_traj)(keys))
    t = n_steps * dt
    expected = 6 * kBT * mu * t
    est = msd.mean()
    se = msd.std() / np.sqrt(n_ens)
    # MSD of a Gaussian walk has ~sqrt(2/3/n_ens) relative noise; 4 SE window
    assert abs(est - expected) < 4 * se + 0.05 * expected, (est, expected, se)


@pytest.mark.slow
def test_wall_equilibrium_boltzmann():
    """Height distribution of a wall-confined Brownian sphere must match
    Gibbs-Boltzmann — the sharpest end-to-end validation of the stochastic
    drift terms (a high-statistics TPU run shows bias +0.011±0.026; this is
    a reduced-statistics canary with a proportionally loose tolerance)."""
    from rigid_body_light_tpu import forces

    params, cfgb = _shell(12)
    kBT, mg, k_wall, lam_wall = 0.3, 1.0, 4.0, 0.3
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=kBT, wall=True,
                           dtype=jnp.float64, lanczos_iters=15, gmres_tol=1e-7,
                           gmres_restart=30, gmres_maxiter=90)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -mg, 0, 0, 0])),
        forces.wall_repulsion(strength=k_wall, debye_length=lam_wall, radius=1.0),
    )
    B = 8
    X0 = np.array([[20.0 * i, 0.0, 1.6] for i in range(B)])
    state = make_state(X0, np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float64)
    final, traj = run_bd(geom, cfg, state, jax.random.key(7), n_steps=2500,
                         force_fn=force_fn, save_every=10)
    Xs = np.asarray(traj["X"])
    assert np.isfinite(Xs).all()
    z = Xs[Xs.shape[0] // 4:, :, 2]
    # integrate from the lowest accessible center height (shell radius ~0.79)
    zg = np.linspace(0.75, 4.5, 2000)
    Uz = mg * zg + k_wall * lam_wall * np.exp(-(zg - 1.0) / lam_wall)
    p = np.exp(-Uz / kBT)
    p /= np.trapezoid(p, zg)
    z_theory = float(np.trapezoid(zg * p, zg))
    zw = z.mean(axis=0)
    se = zw.std() / np.sqrt(B)
    assert abs(z.mean() - z_theory) < 4 * se + 0.03, (z.mean(), z_theory, se)


@pytest.mark.medium
def test_lagged_block_pc_converges():
    """run_bd with pc_refresh>1 (stale block PC) must keep the solver
    converged and match the statistics contract (finite, unit quats)."""
    params, cfgb = _shell(12)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=0.5,
                           dtype=jnp.float64, lanczos_iters=10,
                           block_diag_pc=True, pc_refresh=3,
                           gmres_tol=1e-7, gmres_maxiter=120)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0], [4.0, 0, 0]],
                       [[1.0, 0, 0, 0]] * 2, dtype=jnp.float64)
    final, traj = run_bd(geom, cfg, state, jax.random.key(2), n_steps=9)
    assert np.isfinite(np.asarray(traj["X"])).all()
    assert float(np.asarray(traj["residual"]).max()) < 1e-5


@pytest.mark.slow
def test_rotational_diffusion():
    """Body-axis correlation must decay as exp(−2·D_r·τ) with
    D_r = kBT·μ_r from the torque solve — validates the rotational noise
    channel statistically (measured 2.5% at these statistics)."""
    from rigid_body_light_tpu import analysis

    params, cfgb = _shell(12)
    a = params["sep"] / 2
    kBT, dt = 0.5, 0.02
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    cfgd = SimulationConfig(a=a, dtype=jnp.float64, gmres_tol=1e-10,
                            gmres_maxiter=300)
    st1 = make_state([[0.0, 0, 0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    ops = sad.geometry_ops(geom, st1)
    T6 = jnp.zeros((1, 6)).at[0, 5].set(1.0)
    mu_r = float(solvers.solve_saddle(ops, cfgd, jnp.zeros((12, 3)), T6).U[0, 5])
    d_r = kBT * mu_r

    B = 12
    state = make_state(np.array([[25.0 * i, 0, 0] for i in range(B)]),
                       np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float64)
    cfg = SimulationConfig(a=a, dt=dt, kBT=kBT, dtype=jnp.float64,
                           lanczos_iters=12, gmres_tol=1e-8)
    final, traj = run_bd(geom, cfg, state, jax.random.key(1),
                         n_steps=3000, save_every=5)
    lags, C = analysis.axis_correlation(np.asarray(traj["Q"]), max_lag=200)
    tau = lags * 5 * dt
    mask = C > 0.3
    fit = np.polyfit(tau[mask], np.log(C[mask]), 1)
    d_r_fit = -fit[0] / 2
    assert abs(d_r_fit - d_r) / d_r < 0.15, (d_r_fit, d_r)


def test_rotation_guard_independent_of_max_move():
    """The per-step rotation cap must stay live when the translation cap is
    disabled (max_move<=0) — a near-singular solve can spin a body in place
    without any translation."""
    from rigid_body_light_tpu.dynamics import stepper

    params, cfgb = _shell()
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 3.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    cfg = SimulationConfig(
        a=params["sep"] / 2, dt=0.1, dtype=jnp.float64,
        max_move=0.0, max_rotation=0.5,
    )
    # pure oversized rotation, zero translation
    dU = jnp.zeros((1, 6), jnp.float64).at[0, 5].set(3.0)
    out = stepper._commit(geom, cfg, state, dU)
    assert np.allclose(np.asarray(out.Q), np.asarray(state.Q))  # rejected
    # small rotation passes
    dU_ok = jnp.zeros((1, 6), jnp.float64).at[0, 5].set(0.1)
    out2 = stepper._commit(geom, cfg, state, dU_ok)
    assert not np.allclose(np.asarray(out2.Q), np.asarray(state.Q))


@pytest.mark.medium
def test_run_bd_block_free_static_pc():
    """pc_mode=block_free in the scan driver: the PC is built once outside
    the scan (its body-frame constants are configuration-independent) and
    the trajectory must still converge at block-PC-like iteration counts."""
    params, cfgb = _shell()
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=1.0,
                           dtype=jnp.float64, lanczos_iters=10,
                           pc_mode="block_free", pc_refresh=4,
                           gmres_tol=1e-8, gmres_maxiter=200)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0], [4.0, 0, 0]],
                       [[1.0, 0, 0, 0], [1.0, 0, 0, 0]], dtype=jnp.float64)
    final, traj = run_bd(geom, cfg, state, jax.random.key(3), n_steps=6)
    assert np.isfinite(np.asarray(traj["X"])).all()
    assert float(np.asarray(traj["residual"]).max()) < 1e-7
    # matches a per-step stochastic_step chain with the same keys (the
    # static PC must not change the numerics vs building it every step)
    s = state
    k = jax.random.key(3)
    x_prev = (jnp.zeros((2 * params["N"], 3)), jnp.zeros((2, 6)))
    for _ in range(6):
        k, sub = jax.random.split(k)
        s, aux = stochastic_step(geom, cfg, s, sub, jnp.zeros((2, 6)),
                                 x0=x_prev)
        x_prev = (aux.lam, aux.U)
    assert np.allclose(np.asarray(final.X), np.asarray(s.X), atol=1e-9)
