"""Preconditioner exactness (port of the reference's internal ``test_PC``,
``c_rigid_obj.cpp:569-587``) and full saddle solves vs a dense direct solve."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
import utils
from rigid_body_light_tpu.config import SimulationConfig
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import saddle as saddle_mod
from rigid_body_light_tpu.ops import solvers
from rigid_body_light_tpu.state import make_state


def _setup(N_rigid, wall, block, seed=0):
    X, Q = utils.create_random_positions(N_rigid, wall_PC=wall, seed=seed)
    _, config = utils.load_config(utils.struct_shell_12)
    cfg = SimulationConfig(wall=wall, block_diag_pc=block, dtype=jnp.float64,
                           gmres_tol=1e-10, gmres_maxiter=400)
    geom = kin.make_ref_geometry(config, dtype=jnp.float64)
    state = make_state(X, Q, dtype=jnp.float64)
    ops = saddle_mod.geometry_ops(geom, state)
    return cfg, geom, state, ops


@pytest.mark.parametrize("wall", [False, True])
@pytest.mark.parametrize("block", [False, True, "block_free"])
def test_pc_is_exact_inverse_of_approximate_saddle(wall, block):
    """PC([M̃Λ − KU; −KᵀΛ]) must return exactly (Λ, U)."""
    cfg, geom, state, ops = _setup(3, wall, block is True, seed=2)
    if block == "block_free":
        cfg = cfg.replace(pc_mode="block_free")
    pc = saddle_mod.build_pc(ops, cfg)
    B, n, _ = ops.offsets.shape
    rng = np.random.default_rng(7)
    lam = jnp.asarray(rng.standard_normal((B, n, 3)))
    U = jnp.asarray(rng.standard_normal((B, 6)))

    # M̃Λ: invert the PC's own approximate inverse mobility
    if block == "block_free":
        m_ref = jnp.linalg.inv(pc.minv_ref)
        lam_body = jnp.einsum("bji,bnj->bni", ops.rot, lam).reshape(B, 3 * n)
        m_lam = jnp.einsum("pq,bq->bp", m_ref, lam_body).reshape(B, n, 3)
        m_lam = jnp.einsum("bij,bnj->bni", ops.rot, m_lam)
    elif block:
        m_lam = jnp.linalg.solve(pc.inv_m_block, lam.reshape(B, 3 * n, 1))[..., 0].reshape(B, n, 3)
    else:
        m_lam = jnp.linalg.solve(pc.inv_m_diag.reshape(B, n, 3, 3), lam[..., None])[..., 0]
    slip = (m_lam - kin.K_dot(U, ops.offsets)).reshape(-1, 3)
    F = -kin.KT_dot(lam, ops.offsets)
    lam_pc, U_pc = saddle_mod.apply_pc(pc, slip, F, ops, cfg)
    assert np.allclose(np.asarray(U_pc), np.asarray(U), atol=1e-9)
    assert np.allclose(np.asarray(lam_pc), np.asarray(lam).reshape(-1, 3), atol=1e-9)


@pytest.mark.parametrize("wall", [False, True])
def test_saddle_solve_matches_dense_direct(wall):
    cfg, geom, state, ops = _setup(2, wall, False, seed=4)
    B, n, _ = ops.offsets.shape
    rng = np.random.default_rng(9)
    slip = rng.standard_normal((B * n, 3))
    force = rng.standard_normal((B, 6))

    res = solvers.solve_saddle(ops, cfg, jnp.asarray(slip), jnp.asarray(force))
    assert float(res.residual) < 1e-8

    # dense direct solve of [M −K; Kᵀ 0][λ;U] = [slip; F]
    pos = np.asarray(ops.flat_positions)
    M = oracle.rpy_matrix(pos, 1.0, 1.0, wall)
    if wall:
        b = oracle.damping(pos)
        M = np.diag(b) @ M @ np.diag(b)
    K = oracle.dense_K(np.asarray(ops.offsets))
    nn = 3 * B * n
    A = np.zeros((nn + 6 * B, nn + 6 * B))
    A[:nn, :nn] = M
    A[:nn, nn:] = -K
    A[nn:, :nn] = K.T
    rhs = np.concatenate([slip.ravel(), force.ravel()])
    x = np.linalg.solve(A, rhs)
    assert np.allclose(np.asarray(res.U).ravel(), x[nn:], atol=1e-7)
    assert np.allclose(np.asarray(res.lam).ravel(), x[:nn], atol=1e-6)


def test_solve_mobility_api():
    X, Q = utils.create_random_positions(2, seed=5)
    cb = utils.create_solver(X, Q, dtype=jnp.float64)
    force = np.zeros((2, 6))
    force[:, 2] = -1.0
    U, lam, res = cb.solve_mobility(force)
    assert res < 1e-5
    assert U.shape == (2, 6)
    # downward force → downward velocity
    assert np.all(U[:, 2] < 0)


def test_resistance_problem():
    """F = 6πηRh·U for a unit sphere, and mobility ∘ resistance = identity."""
    import numpy as np
    from rigid_body_light_tpu import load_structure

    params, cfgb = load_structure("shell_N_42")
    cfg = SimulationConfig(a=params["sep"] / 2, dtype=jnp.float64,
                           gmres_tol=1e-10, gmres_maxiter=400)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0]], [[1.0, 0, 0, 0]], dtype=jnp.float64)
    ops = saddle_mod.geometry_ops(geom, state)
    U = jnp.zeros((1, 6)).at[0, 2].set(1.0)
    F, lam, res = solvers.solve_resistance(ops, cfg, U)
    assert abs(float(F[0, 2]) - 6 * np.pi) / (6 * np.pi) < 1e-3
    assert float(res) < 1e-8
    round_trip = solvers.solve_saddle(ops, cfg, jnp.zeros((42, 3)), F)
    assert np.allclose(np.asarray(round_trip.U), np.asarray(U), atol=1e-8)


@pytest.mark.parametrize("wall", [False, True])
def test_true_residual_reporting(wall):
    """true_residual=True reports the UNpreconditioned relative residual:
    it must certify the same convergence (small when converged) and equal
    an independently computed ‖b − A·x‖/‖b‖."""
    cfg, geom, state, ops = _setup(2, wall, False, seed=12)
    B, n, _ = ops.offsets.shape
    rng = np.random.default_rng(3)
    slip = jnp.asarray(rng.standard_normal((B * n, 3)))
    force = jnp.asarray(rng.standard_normal((B, 6)))
    res = solvers.solve_saddle(ops, cfg, slip, force, true_residual=True)
    assert res.true_residual is not None
    assert float(res.residual) < 1e-8
    s, f = saddle_mod.apply_saddle(res.lam, res.U, ops, cfg)
    num = np.linalg.norm(np.concatenate([
        (np.asarray(slip) - np.asarray(s)).ravel(),
        (np.asarray(force) - np.asarray(f)).ravel()]))
    den = np.linalg.norm(np.concatenate([np.asarray(slip).ravel(),
                                         np.asarray(force).ravel()]))
    assert float(res.true_residual) == pytest.approx(num / den, rel=1e-10)
    assert float(res.true_residual) < 1e-6  # converged in the true norm too
    # default path must not compute it
    assert solvers.solve_saddle(ops, cfg, slip, force).true_residual is None


# ---------------------------------------------------------------- RAS PC
def _settled_layer(B=8, spacing=2.3, z=1.35, seed=11, **cfg_kw):
    """A dense near-wall layer of 12-blob shells — the regime whose
    inter-body coupling no body-diagonal PC captures."""
    params, config = utils.load_config(utils.struct_shell_12)
    rng = np.random.default_rng(seed)
    xs = np.array([[spacing * (i % 4), spacing * (i // 4), z]
                   for i in range(B)], float)
    xs[:, :2] += 0.1 * rng.standard_normal((B, 2))
    xs[:, 2] += 0.05 * rng.standard_normal(B)
    qs = rng.standard_normal((B, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    kw = dict(wall=True, dtype=jnp.float64, gmres_tol=1e-8,
              gmres_maxiter=200, a=params["sep"] / 2)
    kw.update(cfg_kw)
    cfg = SimulationConfig(**kw)
    geom = kin.make_ref_geometry(config, dtype=cfg.dtype)
    state = make_state(xs, qs, dtype=cfg.dtype)
    return cfg, geom, state, saddle_mod.geometry_ops(geom, state)


def test_ras_pc_cuts_iterations_and_matches_block_free_solution():
    """On a settled layer the RAS halo coupling must reduce GMRES
    iterations vs block_free while solving the SAME saddle system (the PC
    only changes convergence, never the answer)."""
    cfg, geom, state, ops = _settled_layer()
    B, n, _ = ops.offsets.shape
    rng = np.random.default_rng(3)
    slip = jnp.asarray(rng.standard_normal((B * n, 3)))
    force = jnp.asarray(rng.standard_normal((B, 6)))

    cfg_bf = cfg.replace(pc_mode="block_free")
    cfg_ras = cfg.replace(pc_mode="ras", pc_halo=4.0, pc_halo_max=16)
    res_bf = solvers.solve_saddle(ops, cfg_bf, slip, force)
    res_ras = solvers.solve_saddle(ops, cfg_ras, slip, force)
    assert float(res_bf.residual) < 1e-8
    assert float(res_ras.residual) < 1e-8
    np.testing.assert_allclose(np.asarray(res_ras.U), np.asarray(res_bf.U),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_ras.lam),
                               np.asarray(res_bf.lam), atol=1e-5)
    assert int(res_ras.iters) < int(res_bf.iters), (
        int(res_ras.iters), int(res_bf.iters))


def test_ras_pc_reduces_to_block_free_when_dispersed():
    """Bodies farther apart than the halo cutoff: every halo slot masks
    out, the Woodbury correction vanishes, and the solve behaves exactly
    like block_free (same iteration count, same answer)."""
    cfg, geom, state, ops = _settled_layer(spacing=9.0, z=4.0)
    B, n, _ = ops.offsets.shape
    rng = np.random.default_rng(5)
    slip = jnp.asarray(rng.standard_normal((B * n, 3)))
    force = jnp.asarray(rng.standard_normal((B, 6)))
    res_bf = solvers.solve_saddle(ops, cfg.replace(pc_mode="block_free"),
                                  slip, force)
    res_ras = solvers.solve_saddle(
        ops, cfg.replace(pc_mode="ras", pc_halo=2.0, pc_halo_max=8),
        slip, force)
    assert int(res_ras.iters) == int(res_bf.iters)
    np.testing.assert_allclose(np.asarray(res_ras.U), np.asarray(res_bf.U),
                               atol=1e-9)


def test_ras_pc_single_body_falls_back():
    params, config = utils.load_config(utils.struct_shell_12)
    X, Q = utils.create_random_positions(1, wall_PC=True, seed=8)
    cfg = SimulationConfig(wall=True, dtype=jnp.float64, gmres_tol=1e-9,
                           pc_mode="ras")
    geom = kin.make_ref_geometry(config, dtype=jnp.float64)
    state = make_state(X, Q, dtype=jnp.float64)
    ops = saddle_mod.geometry_ops(geom, state)
    pc = saddle_mod.build_pc_ras(ops, cfg)
    assert pc.halo_w is None  # bare static tier
    res = solvers.solve_saddle(ops, cfg, jnp.zeros((12, 3)),
                               jnp.ones((1, 6)))
    assert float(res.residual) < 1e-9


def test_ras_pc_fluctuating_trajectory_runs():
    """run_bd with pc_mode='ras': static tier outside the scan, per-solve
    halo coupling inside — finite physics, converged solves, f32."""
    import jax

    from rigid_body_light_tpu import forces
    from rigid_body_light_tpu.dynamics import run_bd

    cfg, geom, state, _ = _settled_layer(
        dtype=jnp.float32, gmres_tol=1e-4, kBT=1.0, dt=0.01,
        lanczos_iters=8, pc_mode="ras", pc_halo=4.0, pc_halo_max=16,
        use_pallas=False)
    force_fn = forces.gravity(np.array([0, 0, -0.5, 0, 0, 0]))
    final, traj = jax.jit(
        lambda s, k: run_bd(geom, cfg, s, k, n_steps=3, force_fn=force_fn)
    )(state, jax.random.key(0))
    assert np.isfinite(np.asarray(final.X)).all()
    assert float(np.asarray(traj["residual"]).max()) < 1e-2
