"""Multi-species mixtures: consistency with the single-species stack when
all species are identical, cross-species hydrodynamic coupling, stepping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import utils
from rigid_body_light_tpu import SimulationConfig, load_structure, multi
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as sad
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _mixture(dtype=jnp.float64):
    _, cfg12 = load_structure("shell_N_12")
    _, cfg42 = load_structure("shell_N_42")
    mgeom = multi.MultiGeometry.create([cfg12, cfg42], dtype=dtype)
    s12 = make_state([[0.0, 0, 0], [6.0, 0, 0]], [[1.0, 0, 0, 0]] * 2, dtype=dtype)
    s42 = make_state([[0.0, 6.0, 0]], [[1.0, 0, 0, 0]], dtype=dtype)
    return mgeom, (s12, s42)


def test_single_species_mixture_matches_plain_stack():
    """A 1-species mixture must reproduce solve_saddle exactly."""
    _, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(dtype=jnp.float64, gmres_tol=1e-10, gmres_maxiter=200)
    X, Q = utils.create_random_positions(3, seed=0)
    mgeom = multi.MultiGeometry.create([cfgb], dtype=jnp.float64)
    state = make_state(X, Q, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    F = jnp.asarray(rng.standard_normal((3, 6)))
    res_multi = multi.solve_saddle_multi(mgeom, cfg, (state,), None, (F,))
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    res_single = solvers.solve_saddle(ops, cfg, jnp.zeros((36, 3)), F)
    assert np.allclose(np.asarray(res_multi.Us[0]), np.asarray(res_single.U), atol=1e-9)
    assert np.allclose(np.asarray(res_multi.lam), np.asarray(res_single.lam), atol=1e-8)


def test_mixture_solve_and_coupling():
    """Mixed 12-blob + 42-blob suspension: solve converges, and the large
    sphere's sedimentation speed is perturbed by the small ones (HI)."""
    mgeom, states = _mixture()
    cfg = SimulationConfig(dtype=jnp.float64, gmres_tol=1e-9, gmres_maxiter=300,
                           a=0.24)
    F12 = jnp.zeros((2, 6), jnp.float64)
    F42 = jnp.zeros((1, 6), jnp.float64).at[0, 2].set(-1.0)
    res = multi.solve_saddle_multi(mgeom, cfg, states, None, (F12, F42))
    assert float(res.residual) < 1e-7
    u_mixture = float(res.Us[1][0, 2])
    # isolated 42-sphere for comparison
    _, cfg42 = load_structure("shell_N_42")
    geom42 = kin.make_ref_geometry(cfg42, dtype=jnp.float64)
    ops42 = sad.geometry_ops(geom42, states[1])
    res_iso = solvers.solve_saddle(ops42, cfg, jnp.zeros((42, 3)), F42)
    u_iso = float(res_iso.U[0, 2])
    assert u_mixture != pytest.approx(u_iso, rel=1e-6)  # neighbors matter
    # passive small spheres get entrained downward
    assert np.all(np.asarray(res.Us[0])[:, 2] < 0)


@pytest.mark.medium
def test_mixture_stochastic_step():
    mgeom, states = _mixture()
    cfg = SimulationConfig(dtype=jnp.float64, a=0.24, dt=0.01, kBT=0.5,
                           lanczos_iters=10, gmres_tol=1e-6, gmres_maxiter=120)
    F = (jnp.zeros((2, 6), jnp.float64), jnp.zeros((1, 6), jnp.float64))
    step = jax.jit(lambda st, k: multi.stochastic_step_multi(mgeom, cfg, st, k, F))
    new_states, res = step(states, jax.random.key(0))
    for s_new, s_old in zip(new_states, states):
        assert np.isfinite(np.asarray(s_new.X)).all()
        assert not np.allclose(np.asarray(s_new.X), np.asarray(s_old.X))
        qn = np.linalg.norm(np.asarray(s_new.Q), axis=-1)
        assert np.abs(qn - 1).max() < 1e-12
    assert float(res.residual) < 1e-4


@pytest.mark.medium
def test_mixture_em_exact_step():
    """em_exact drift mode now supported for mixtures (round-2 parity)."""
    mgeom, states = _mixture()
    cfg = SimulationConfig(dtype=jnp.float64, a=0.24, dt=0.01, kBT=0.5,
                           drift_mode="em_exact", lanczos_iters=10,
                           gmres_tol=1e-8, gmres_maxiter=150)
    F = (jnp.zeros((2, 6), jnp.float64), jnp.zeros((1, 6), jnp.float64))
    step = jax.jit(lambda st, k: multi.stochastic_step_multi(mgeom, cfg, st, k, F))
    new_states, res = step(states, jax.random.key(2))
    for s_new, s_old in zip(new_states, states):
        assert np.isfinite(np.asarray(s_new.X)).all()
        assert not np.allclose(np.asarray(s_new.X), np.asarray(s_old.X))
    assert float(res.residual) < 1e-6


def test_mixture_warm_start_cuts_iterations():
    """Passing the previous solve as x0 must reduce executed GMRES work on a
    barely-moved configuration."""
    mgeom, states = _mixture()
    cfg = SimulationConfig(dtype=jnp.float64, a=0.24, gmres_tol=1e-9,
                           gmres_maxiter=300)
    F12 = jnp.zeros((2, 6), jnp.float64)
    F42 = jnp.zeros((1, 6), jnp.float64).at[0, 2].set(-1.0)
    cold = multi.solve_saddle_multi(mgeom, cfg, states, None, (F12, F42))
    warm = multi.solve_saddle_multi(
        mgeom, cfg, states, None, (F12, F42), x0=(cold.lam, cold.Us)
    )
    assert int(warm.iters) < int(cold.iters)
    assert int(warm.iters) <= 1
    assert float(warm.residual) < 1e-7


def test_mixture_preconditioned_noise_exact_factor():
    """Per-species factor-preconditioned mixture noise must use a valid
    factor of the coupled mixture mobility (X·Xᵀ = M) and reproduce the
    dense truth at full iteration count."""
    import scipy.linalg as sla

    import oracle

    _, cfg12 = load_structure("shell_N_12")
    _, cfg42 = load_structure("shell_N_42")
    mgeom = multi.MultiGeometry.create([cfg12, cfg42], dtype=jnp.float64)
    rng = np.random.default_rng(17)
    q3 = rng.standard_normal((3, 4))
    q3 /= np.linalg.norm(q3, axis=1, keepdims=True)
    s12 = make_state([[0.0, 0, 2.0], [6.0, 0, 2.2]], q3[:2], dtype=jnp.float64)
    s42 = make_state([[0.0, 6.0, 2.4]], q3[2:], dtype=jnp.float64)
    states = (s12, s42)
    a, eta = 0.24, 1.1
    cfg = SimulationConfig(dtype=jnp.float64, a=a, eta=eta, wall=True)
    opses = multi.geometry_ops_multi(mgeom, states)
    pos = multi.concat_positions(opses)
    npcs = multi.make_noise_preconditioner_multi(mgeom, a, eta, jnp.float64)

    M = oracle.rpy_matrix(np.asarray(pos), a, eta, True)
    b = oracle.damping(np.asarray(pos), a)
    M = np.diag(b) @ M @ np.diag(b)
    blocks = []
    for o, (L, _) in zip(opses, npcs):
        n = o.offsets.shape[1]
        for Rb in np.asarray(o.rot):
            blocks.append(np.kron(np.eye(n), Rb) @ np.asarray(L))
    C12 = sla.block_diag(*blocks)
    G = np.linalg.solve(C12, np.linalg.solve(C12, M.T).T)
    Xf = C12 @ sla.sqrtm(G).real
    assert np.abs(Xf @ Xf.T - M).max() < 1e-11  # valid factor of M

    sz = M.shape[0]
    key = jax.random.key(11)
    w = np.asarray(jax.random.normal(key, (sz,), dtype=jnp.float64))
    truth = C12 @ (sla.sqrtm(G).real @ w)
    mob2 = sad.mobility_apply_multi_fn(cfg)
    (y,) = multi.m_half_w_precond_multi(mob2, opses, npcs, (key,), iters=sz)
    assert np.abs(np.asarray(y).ravel() - truth).max() < 1e-9


def test_single_species_mixture_precond_noise_matches_plain_stack():
    """A 1-species mixture's preconditioned draw must equal the
    single-species sampler with the same keys (identical algebra)."""
    from rigid_body_light_tpu.ops import lanczos

    _, cfgb = load_structure("shell_N_12")
    mgeom = multi.MultiGeometry.create([cfgb], dtype=jnp.float64)
    X, Q = utils.create_random_positions(3, wall_PC=True, seed=9)
    state = make_state(X, Q, dtype=jnp.float64)
    cfg = SimulationConfig(dtype=jnp.float64, a=0.4, wall=True)
    opses = multi.geometry_ops_multi(mgeom, (state,))
    npcs = multi.make_noise_preconditioner_multi(mgeom, 0.4, 1.0, jnp.float64)
    mob2 = sad.mobility_apply_multi_fn(cfg)
    k1, k2 = jax.random.key(3), jax.random.key(4)
    m1, m2 = multi.m_half_w_precond_multi(mob2, opses, npcs, (k1, k2), iters=15)
    s1, s2 = lanczos.m_half_w_precond(
        mob2, opses[0].flat_positions, opses[0].rot, npcs[0][0], npcs[0][1],
        (k1, k2), iters=15, multi=True,
    )
    assert float(jnp.abs(m1 - s1).max()) < 1e-12
    assert float(jnp.abs(m2 - s2).max()) < 1e-12


@pytest.mark.medium
def test_run_bd_multi_trajectory():
    """The mixture scan driver: reproducible, finite, converged, with warm
    starts + lagged PC threaded through the scan."""
    mgeom, states = _mixture()
    cfg = SimulationConfig(dtype=jnp.float64, a=0.24, dt=0.005, kBT=0.3,
                           lanczos_iters=10, gmres_tol=1e-6, gmres_maxiter=120,
                           block_diag_pc=True, pc_refresh=4)

    def grav(ss, i):
        return (jnp.zeros((2, 6), jnp.float64),
                jnp.zeros((1, 6), jnp.float64).at[0, 2].set(-0.5))

    final, traj = multi.run_bd_multi(
        mgeom, cfg, states, jax.random.key(7), 12, force_fn=grav, save_every=3
    )
    assert traj["X"][0].shape == (4, 2, 3)
    assert traj["X"][1].shape == (4, 1, 3)
    assert np.isfinite(traj["X"][0]).all() and np.isfinite(traj["X"][1]).all()
    assert np.asarray(traj["residual"]).max() < 1e-4
    # bitwise reproducibility from the same key
    final2, traj2 = multi.run_bd_multi(
        mgeom, cfg, states, jax.random.key(7), 12, force_fn=grav, save_every=3
    )
    assert np.array_equal(np.asarray(traj["X"][0]), np.asarray(traj2["X"][0]))
    # bodies actually moved (12 steps at kBT=0.3 — thermal motion dominates
    # the weak pull, so no directional assertion at this trajectory length)
    assert not np.allclose(np.asarray(final[1].X), np.asarray(states[1].X))


# ---------------------------------------------------------------------------
# mixture RAS preconditioner (polydisperse generalization of build_pc_ras —
# the settled-suspension PC of c_rigid_obj.cpp:589-616, extended to mixtures)
# ---------------------------------------------------------------------------

def _dense_wall_mixture():
    """6 small (12-blob) + 3 large (42-blob) bodies packed near a wall —
    the cross-species near-contact regime the mixture RAS halo is for."""
    _, cfg12 = load_structure("shell_N_12")
    _, cfg42 = load_structure("shell_N_42")
    mgeom = multi.MultiGeometry.create([cfg12, cfg42], dtype=jnp.float64)
    X12 = np.array([[0, 0, 1.2], [1.4, 0, 1.2], [0, 1.4, 1.1],
                    [1.4, 1.4, 1.25], [0.7, 0.7, 2.3], [2.1, 0.7, 1.3]])
    X42 = np.array([[0.7, -1.3, 1.4], [-1.3, 0.7, 1.45], [2.8, 2.2, 1.5]])
    s12 = make_state(X12, np.tile([1.0, 0, 0, 0], (6, 1)), dtype=jnp.float64)
    s42 = make_state(X42, np.tile([1.0, 0, 0, 0], (3, 1)), dtype=jnp.float64)
    return mgeom, (s12, s42)


def test_mixture_ras_pc_cuts_iterations_and_matches_block_free():
    """Dense near-wall mixture: RAS must converge in strictly fewer GMRES
    iterations than block_free while producing the SAME solution (a PC
    changes convergence, never the answer)."""
    mgeom, states = _dense_wall_mixture()
    rng = np.random.default_rng(7)
    F12 = jnp.asarray(rng.standard_normal((6, 6)))
    F42 = jnp.asarray(rng.standard_normal((3, 6)))
    common = dict(dtype=jnp.float64, a=0.24, wall=True, gmres_tol=1e-9,
                  gmres_maxiter=300)
    res_bf = multi.solve_saddle_multi(
        mgeom, SimulationConfig(pc_mode="block_free", **common),
        states, None, (F12, F42))
    res_ras = multi.solve_saddle_multi(
        mgeom, SimulationConfig(pc_mode="ras", **common),
        states, None, (F12, F42))
    assert float(res_bf.residual) < 1e-8 and float(res_ras.residual) < 1e-8
    # measured on this geometry: 54 -> 19 iterations
    assert int(res_ras.iters) < int(res_bf.iters) - 10, (
        int(res_ras.iters), int(res_bf.iters))
    for u_r, u_b in zip(res_ras.Us, res_bf.Us):
        np.testing.assert_allclose(np.asarray(u_r), np.asarray(u_b),
                                   atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_ras.lam),
                               np.asarray(res_bf.lam), atol=1e-6)


def test_mixture_ras_dispersed_reduces_to_block_free():
    """Bodies farther apart than the halo cutoff: all halo slots mask out
    and the mixture RAS solve IS the block_free solve (same iters)."""
    _, cfg12 = load_structure("shell_N_12")
    _, cfg42 = load_structure("shell_N_42")
    mgeom = multi.MultiGeometry.create([cfg12, cfg42], dtype=jnp.float64)
    s1 = make_state([[0, 0, 3.0], [20.0, 0, 3.0]],
                    np.tile([1.0, 0, 0, 0], (2, 1)), dtype=jnp.float64)
    s2 = make_state([[0, 20.0, 3.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    rng = np.random.default_rng(3)
    F1 = jnp.asarray(rng.standard_normal((2, 6)))
    F2 = jnp.asarray(rng.standard_normal((1, 6)))
    iters, Us = {}, {}
    for pc in ("block_free", "ras"):
        cfg = SimulationConfig(dtype=jnp.float64, a=0.24, wall=True,
                               gmres_tol=1e-9, gmres_maxiter=300, pc_mode=pc,
                               pc_halo=2.0, pc_halo_max=8)
        r = multi.solve_saddle_multi(mgeom, cfg, (s1, s2), None, (F1, F2))
        iters[pc], Us[pc] = int(r.iters), np.asarray(r.Us[0])
    assert iters["ras"] == iters["block_free"]
    np.testing.assert_allclose(Us["ras"], Us["block_free"], atol=1e-9)


def test_single_species_mixture_ras_matches_plain_ras():
    """A 1-species mixture under pc_mode='ras' must reproduce the
    single-species RAS path exactly (same iteration count, same answer)."""
    _, cfgb = load_structure("shell_N_12")
    X = np.array([[0, 0, 1.1], [1.3, 0, 1.15], [0, 1.3, 1.1],
                  [1.3, 1.3, 1.2]])
    Q = np.tile([1.0, 0, 0, 0], (4, 1))
    cfg = SimulationConfig(dtype=jnp.float64, a=0.24, wall=True,
                           gmres_tol=1e-9, gmres_maxiter=300, pc_mode="ras",
                           pc_halo=4.0, pc_halo_max=24)
    state = make_state(X, Q, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    F = jnp.asarray(rng.standard_normal((4, 6)))
    mgeom = multi.MultiGeometry.create([cfgb], dtype=jnp.float64)
    res_m = multi.solve_saddle_multi(mgeom, cfg, (state,), None, (F,))
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    ops = sad.geometry_ops(geom, state)
    res_s = solvers.solve_saddle(ops, cfg, jnp.zeros((48, 3)), F)
    assert int(res_m.iters) == int(res_s.iters)
    np.testing.assert_allclose(np.asarray(res_m.Us[0]),
                               np.asarray(res_s.U), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_m.lam),
                               np.asarray(res_s.lam), atol=1e-7)
