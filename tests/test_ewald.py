"""Triply-periodic Ewald RPY (ops/ewald.py) — correctness anchors.

The two Ewald parts have disjoint code paths (closed-form screened pair
sweep vs wave-space matmuls), so ξ-independence of their sum validates
both at once; Hasimoto's cubic-lattice constants pin the absolute
normalization; fluctuation–dissipation ties the Lanczos sampler to the
deterministic periodic solve.
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.dynamics import run_bd, stochastic_step
from rigid_body_light_tpu.ops import ewald, kinematics as kin, saddle, solvers
from rigid_body_light_tpu.state import make_state

A, ETA = 0.25, 1.3
BOX = (10.0, 10.0, 10.0)


def _config(n=16, seed=0):
    rng = np.random.default_rng(seed)
    r = jnp.asarray(rng.uniform(0, BOX[0], (n, 3)))
    F = jnp.asarray(rng.standard_normal((n, 3)))
    return r, F


def test_xi_independence():
    r, F = _config()
    outs = []
    for xi in (0.744, 1.1):
        p = ewald.make_params(BOX, A, ETA, xi=xi, tol=1e-9)
        outs.append(np.asarray(ewald.mobility_apply(F, r, p)))
    rel = np.abs(outs[0] - outs[1]).max() / np.abs(outs[1]).max()
    assert rel < 1e-6, rel


def test_hasimoto_self_mobility():
    for L in (20.0, 40.0):
        p = ewald.make_params((L, L, L), A, ETA, tol=1e-9)
        U = ewald.mobility_apply(jnp.asarray([[0.0, 0, 1.0]]),
                                 jnp.asarray([[1.2, 3.4, 5.6]]), p)
        mu = float(np.asarray(U)[0, 2])
        mu0 = 1 / (6 * np.pi * ETA * A)
        pred = mu0 * (1 - 2.837297 * A / L + 4 * np.pi / 3 * (A / L) ** 3)
        assert abs(mu - pred) / pred < 1e-6


def test_dense_symmetric_spd_translation_invariant():
    r, F = _config(n=12, seed=1)
    p = ewald.make_params(BOX, A, ETA, tol=1e-8)
    M = np.asarray(ewald.mobility_matrix(r, p))
    np.testing.assert_allclose(M, M.T, atol=1e-14)
    assert np.linalg.eigvalsh((M + M.T) / 2).min() > 0
    U1 = np.asarray(ewald.mobility_apply(F, r, p))
    U2 = np.asarray(ewald.mobility_apply(F, r + jnp.asarray([1.7, -2.3, 11.9]),
                                         p))
    np.testing.assert_allclose(U1, U2, atol=1e-12)


def test_multi_rhs_matches_single():
    r, F = _config(n=10, seed=2)
    p = ewald.make_params(BOX, A, ETA)
    Fs = jnp.stack([F, 2 * F])
    Um = np.asarray(ewald.mobility_apply_multi(Fs, r, p))
    Us = np.asarray(ewald.mobility_apply(F, r, p))
    np.testing.assert_allclose(Um[0], Us, atol=1e-13)
    np.testing.assert_allclose(Um[1], 2 * Us, atol=1e-13)


def test_config_dispatch_and_guards():
    with pytest.raises(ValueError, match="incompatible with"):
        SimulationConfig(box=(8.0, 8.0, 8.0), wall=True)
    cfg = SimulationConfig(a=A, eta=ETA, box=BOX, dtype=jnp.float64)
    mob = saddle.mobility_apply_fn(cfg)
    r, F = _config(n=8, seed=3)
    p = ewald.make_params(BOX, A, ETA, tol=cfg.ewald_tol)
    np.testing.assert_allclose(np.asarray(mob(F, r)),
                               np.asarray(ewald.mobility_apply(F, r, p)),
                               atol=1e-13)


@pytest.mark.medium
def test_periodic_bd_step_and_solve():
    """Saddle solve + full stochastic step through the Ewald operator."""
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    B = 3
    state = make_state(np.array([[1.0, 1.0, 1.0], [5.0, 5.0, 5.0],
                                 [8.0, 2.0, 6.0]]),
                       np.tile([1.0, 0, 0, 0], (B, 1)), dtype=jnp.float64)
    cfg = SimulationConfig(a=params["sep"] / 2, eta=1.0, dt=0.01, kBT=0.8,
                           box=(12.0, 12.0, 12.0), dtype=jnp.float64,
                           lanczos_iters=10, use_pallas=False, gmres_tol=1e-7,
                           pc_mode="block_free")
    F = jnp.zeros((B, 6), jnp.float64).at[:, 2].set(-1.0)
    ops = saddle.geometry_ops(geom, state)
    res = solvers.solve_saddle(ops, cfg, jnp.zeros((B * 12, 3), jnp.float64),
                               F)
    assert float(res.residual) < 1e-6
    # periodic self-mobility of the shell must be BELOW the open-domain one
    cfg_open = cfg.replace(box=None)
    res_open = solvers.solve_saddle(ops, cfg_open,
                                    jnp.zeros((B * 12, 3), jnp.float64), F)
    assert float(-res.U[1, 2]) < float(-res_open.U[1, 2])

    s2, aux = stochastic_step(geom, cfg, state, jax.random.key(0), F)
    assert np.isfinite(np.asarray(s2.X)).all()
    assert float(aux.residual) < 1e-6


@pytest.mark.slow
def test_periodic_fluctuation_dissipation():
    """Free diffusion in a periodic box: MSD-measured D must match
    kBT x (deterministic periodic mobility solve) — ties the Lanczos noise
    to the Ewald operator through the fluctuation-dissipation theorem,
    finite-size (Hasimoto) correction included."""
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    kBT, dt, L = 0.5, 0.05, 8.0
    cfg = SimulationConfig(a=params["sep"] / 2, dt=dt, kBT=kBT,
                           box=(L, L, L), dtype=jnp.float64, lanczos_iters=12,
                           use_pallas=False, gmres_tol=1e-6,
                           pc_mode="block_free")
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]],
                       dtype=jnp.float64)
    ops = saddle.geometry_ops(geom, state)
    F = jnp.zeros((1, 6), jnp.float64).at[0, 2].set(-1.0)
    mu = -float(solvers.solve_saddle(
        ops, cfg, jnp.zeros((12, 3), jnp.float64), F).U[0, 2])
    D_pred = kBT * mu

    n_steps = 1200
    runner = jax.jit(functools.partial(run_bd, geom, cfg, n_steps=n_steps))
    Ds = []
    for seed in range(8):
        _, traj = runner(state, jax.random.key(seed))
        X = np.asarray(traj["X"])[:, 0, :]
        lags = np.arange(1, 60)
        msd = np.array([((X[l:] - X[:-l]) ** 2).sum(-1).mean() for l in lags])
        Ds.append(np.polyfit(lags * dt, msd, 1)[0] / 6.0)
    Ds = np.asarray(Ds)
    sem = Ds.std() / np.sqrt(len(Ds))
    # measured (round 3): rel bias +8.4% +/- 5.2% over 8 runs — pure
    # statistics; the tolerance is ~3 sigma of this ensemble size
    assert abs(Ds.mean() - D_pred) < max(3.2 * sem, 0.16 * D_pred)
    # and the periodic correction itself is visible: D_pred differs from the
    # open-domain value by >5%
    mu_open = -float(solvers.solve_saddle(
        ops, cfg.replace(box=None), jnp.zeros((12, 3), jnp.float64),
        F).U[0, 2])
    assert abs(mu - mu_open) / mu_open > 0.05


@pytest.mark.slow
def test_periodic_gibbs_boltzmann_equilibrium():
    """Gibbs-Boltzmann equilibrium in a fully periodic box: walkers in a
    harmonic trap must sample <|x-c|^2> = 3 kBT/k regardless of the
    hydrodynamic coupling — any bias in the Ewald drift/noise pairing
    (fluctuation-dissipation violation) shows up directly."""
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    # stiff trap: relaxation time 1/(mu k) ~ 5 time units, so a 200-unit run
    # covers ~40 tau (a loose k=0.5 trap has tau ~ 50 and never equilibrates
    # in test-sized runs — measured 30% low from pure equilibration lag)
    kBT, k_trap, L = 0.5, 5.0, 10.0
    B = 4
    centers = jnp.asarray([[2.5, 2.5, 2.5], [7.5, 2.5, 5.0],
                           [2.5, 7.5, 7.5], [7.5, 7.5, 2.5]])
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.05, kBT=kBT,
                           box=(L, L, L), dtype=jnp.float64,
                           lanczos_iters=10, use_pallas=False,
                           gmres_tol=1e-6, pc_mode="block_free")
    state = make_state(np.asarray(centers), np.tile([1.0, 0, 0, 0], (B, 1)),
                       dtype=jnp.float64)

    def force_fn(s, i):
        f = -k_trap * (s.X - centers)
        return jnp.concatenate([f, jnp.zeros((B, 3), jnp.float64)], axis=1)

    n_steps = 4000
    runner = jax.jit(functools.partial(run_bd, geom, cfg, n_steps=n_steps,
                                       force_fn=force_fn, save_every=5))
    _, traj = runner(state, jax.random.key(42))
    X = np.asarray(traj["X"])[100:]          # discard ~5 tau equilibration
    r2 = ((X - np.asarray(centers)) ** 2).sum(-1)
    mean_r2 = r2.mean()
    pred = 3 * kBT / k_trap
    # measured (round 3): +1.4% at this config; ~160 correlation times
    assert abs(mean_r2 - pred) / pred < 0.08, (mean_r2, pred)
    assert np.asarray(traj["residual"]).max() < 1e-5


def test_polydisperse_ewald():
    """Polydisperse periodic RPY: sinc(ka_i)sinc(ka_j) symbol — equal-radii
    reduction exact, xi-independent, per-radius Hasimoto self mobility, and
    far pairs in a big box match the open-domain Zuk tensor to O(1/L)."""
    rng = np.random.default_rng(5)
    n = 12
    r = jnp.asarray(rng.uniform(0, BOX[0], (n, 3)))
    F = jnp.asarray(rng.standard_normal((n, 3)))
    radii = jnp.asarray(rng.uniform(0.15, 0.5, (n,)))

    p = ewald.make_params(BOX, A, ETA, tol=1e-9)
    U0 = np.asarray(ewald.mobility_apply(F, r, p))
    U1 = np.asarray(ewald.mobility_apply(F, r, p, radii=jnp.full((n,), A)))
    np.testing.assert_allclose(U1, U0, atol=1e-14)

    outs = []
    for xi in (0.744, 1.1):
        pp = ewald.make_params(BOX, A, ETA, xi=xi, tol=1e-9)
        outs.append(np.asarray(ewald.mobility_apply(F, r, pp, radii=radii)))
    assert np.abs(outs[0] - outs[1]).max() / np.abs(outs[1]).max() < 1e-6

    L = 30.0
    pp = ewald.make_params((L, L, L), A, ETA, tol=1e-9)
    for av in (0.15, 0.4):
        U = ewald.mobility_apply(jnp.asarray([[0.0, 0, 1.0]]),
                                 jnp.asarray([[2.0, 3.0, 4.0]]), pp,
                                 radii=jnp.asarray([av]))
        mu = float(np.asarray(U)[0, 2])
        pred = (1 / (6 * np.pi * ETA * av)
                - 2.837297 / (6 * np.pi * ETA * L))
        assert abs(mu - pred) / pred < 3e-5

    # close pair in a big box vs the (oracle-validated) open-domain tensor
    from rigid_body_light_tpu.ops import rpy
    Lb = 120.0
    pb = ewald.make_params((Lb, Lb, Lb), A, ETA, tol=1e-7)
    r2 = jnp.asarray([[0.0, 0, 0], [1.1, 0.4, 0.2]])
    rad2 = jnp.asarray([0.2, 0.45])
    Mp = np.asarray(ewald.mobility_matrix(r2, pb, radii=rad2))
    Mo = np.asarray(rpy.mobility_matrix(r2, a=A, eta=ETA, wall=False,
                                        radii=rad2))
    # periodic corrections are O(1/L) ~ 1e-3 absolute at this scale
    np.testing.assert_allclose(Mp, Mo, atol=2.5e-3)
    assert np.linalg.eigvalsh((Mp + Mp.T) / 2).min() > 0


@pytest.mark.medium
def test_f32_polydisperse_tables():
    """f32 polydisperse real-space scalars come from species-pair f64
    tables — the closed forms' J-cascade cancellation is catastrophic in
    f32 (measured ~1e-2 operator errors that ran BD diffusion 11x hot).
    The table path must track the f64 closed forms to f32 round-off and
    stay SPD; a tracer-radii f32 call without prebuilt tables must raise."""
    rng = np.random.default_rng(11)
    n = 40
    r = rng.uniform(0, BOX[0], (n, 3))
    F = rng.standard_normal((n, 3))
    radii = np.where(rng.random(n) < 0.5, 0.146, 0.244)
    p = ewald.make_params(BOX, A, ETA, tol=1e-6)

    U64 = np.asarray(ewald.mobility_apply(jnp.asarray(F), jnp.asarray(r), p,
                                          radii=jnp.asarray(radii)))
    U32 = np.asarray(ewald.mobility_apply(
        jnp.asarray(F, jnp.float32), jnp.asarray(r, jnp.float32), p,
        radii=jnp.asarray(radii, jnp.float32)))
    rel = np.abs(U32 - U64).max() / np.abs(U64).max()
    assert rel < 1e-5, rel

    M32 = np.asarray(ewald.mobility_matrix(
        jnp.asarray(r[:14], jnp.float32), p,
        radii=jnp.asarray(radii[:14], jnp.float32)))
    assert np.abs(M32 - M32.T).max() / np.abs(M32).max() < 1e-6
    assert np.linalg.eigvalsh((M32 + M32.T) / 2).min() > 0

    # prebuilt tables thread through jit; tracer radii without them raise
    pt = ewald.make_poly_tables(p, radii)
    fn = jax.jit(lambda Fj, rj: ewald.mobility_apply(
        Fj, rj, p, radii=jnp.asarray(radii, jnp.float32), poly_tables=pt))
    U32j = np.asarray(fn(jnp.asarray(F, jnp.float32),
                         jnp.asarray(r, jnp.float32)))
    np.testing.assert_allclose(U32j, U32, atol=1e-6)
    with pytest.raises(TypeError, match="concrete"):
        jax.jit(lambda rad: ewald.mobility_apply(
            jnp.asarray(F, jnp.float32), jnp.asarray(r, jnp.float32), p,
            radii=rad))(jnp.asarray(radii, jnp.float32))


@pytest.mark.medium
def test_f32_poly_stepper_covariance():
    """One-step rigid displacement covariance of the f32 polydisperse
    periodic stepper matches 2·kBT·dt·N (N from the f64 deterministic
    solve) — the end-to-end fluctuation–dissipation pin for the path the
    broken f32 closed forms used to blow up."""
    from rigid_body_light_tpu import multi

    _, cfg_small = load_structure("shell_N_12")
    cfg = SimulationConfig(a=0.3, eta=ETA, dt=0.004, kBT=0.4, box=BOX,
                           dtype=jnp.float32, lanczos_iters=12,
                           gmres_tol=1e-5, pc_mode="block_free",
                           use_pallas=False)
    mgeom = multi.MultiGeometry.create([cfg_small, cfg_small * 0.5],
                                       dtype=jnp.float32,
                                       radii=[None, 0.18])
    states = (make_state(np.array([[2.0, 2.0, 2.0]]),
                         np.array([[1.0, 0, 0, 0]]), dtype=jnp.float32),
              make_state(np.array([[7.0, 7.0, 7.0]]),
                         np.array([[1.0, 0, 0, 0]]), dtype=jnp.float32))

    zero_f = tuple(jnp.zeros((1, 6), jnp.float32) for _ in states)

    def one(key):
        sts, aux = multi.stochastic_step_multi(mgeom, cfg, states, key,
                                               zero_f)
        return jnp.concatenate([sts[0].X - states[0].X,
                                sts[1].X - states[1].X], axis=0)

    n_samp = 384
    dX = np.asarray(jax.vmap(one)(jax.random.split(jax.random.key(7),
                                                   n_samp)))
    var = (dX ** 2).mean(axis=0)          # (2, 3) per-body displacement var

    # f64 per-body mobility DIAGONAL: force ONE body at a time (forcing both
    # at once would fold the cross-mobility N_01 — negative periodic
    # backflow — into the prediction, which the per-body variance excludes)
    cfg64 = cfg.replace(dtype=jnp.float64, gmres_tol=1e-9)
    mgeom64 = multi.MultiGeometry.create([cfg_small, cfg_small * 0.5],
                                         dtype=jnp.float64,
                                         radii=[None, 0.18])
    states64 = tuple(make_state(np.asarray(s.X), np.asarray(s.Q),
                                dtype=jnp.float64) for s in states)
    mu = np.zeros((2, 3))
    for body in range(2):
        for axis in range(3):
            forces = tuple(
                jnp.zeros((1, 6), jnp.float64).at[:, axis].set(
                    1.0 if s == body else 0.0)
                for s in range(2))
            res = multi.solve_saddle_multi(mgeom64, cfg64, states64, None,
                                           forces)
            mu[body, axis] = float(res.Us[body][0, axis])
    pred = 2 * cfg.kBT * cfg.dt * mu                 # (2, 3)
    # per-body mean over components: sampling σ ≈ √(2/(3·384)) ≈ 4%; the
    # 12% gate is ~3σ yet catches the old broken-f32 path (11x hot) cold.
    # (Deterministic key: variance estimates are χ²-skewed — a 3σ-high draw
    # was observed at other seeds, so this is a pinned-sample regression
    # gate, not an ensemble guarantee.)
    ratio = (var / pred).mean(axis=1)
    assert np.abs(ratio - 1).max() < 0.12, (var, pred, ratio)
