"""Memory-scaling distributed BD: ring pair sweep + fully-sharded steps.

Unlike tests/test_sharding.py (1-D all_gather / 2-D SUMMA paths, where each
device still materializes global arrays), everything here keeps bodies —
positions, λ, Krylov and Lanczos bases — sharded over the 8-virtual-device
mesh; cross-device coupling is the ring ppermute plus scalar psums.
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from rigid_body_light_tpu import SimulationConfig, forces, load_structure, parallel
from rigid_body_light_tpu.dynamics import deterministic_step, run_bd
from rigid_body_light_tpu.ops import kinematics as kin, rpy, saddle
from rigid_body_light_tpu.state import make_state

AX = "bodies"


def _setup(B=8, kBT=0.0):
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    xs = np.array([[2.5 * (i % 4), 2.5 * (i // 4), 2.0 + 0.2 * (i % 3)]
                   for i in range(B)])
    rng = np.random.default_rng(0)
    qs = rng.standard_normal((B, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    state = make_state(xs, qs, dtype=jnp.float64)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=kBT, wall=True,
                           dtype=jnp.float64, lanczos_iters=8,
                           use_pallas=False, gmres_tol=1e-8,
                           pc_mode="block_free")
    mesh = parallel.make_mesh(8, axis_name=AX)
    return geom, cfg, state, mesh


@pytest.mark.medium
def test_ring_pair_sum_matches_single_device():
    geom, cfg, state, mesh = _setup()
    ops = saddle.geometry_ops(geom, state)
    pos = ops.flat_positions
    F = jnp.asarray(np.random.default_rng(1).standard_normal(pos.shape))
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    ref = rpy.pair_sum(pos, ids, pos, ids, F, a=cfg.a, wall=True)
    ring = shard_map(
        functools.partial(parallel.ring_pair_sum_local, n_devices=8,
                          axis_name=AX, a=cfg.a, wall=True),
        mesh=mesh, in_specs=(P(AX), P(AX)), out_specs=P(AX),
        check_vma=False)(pos, F)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref), atol=1e-13)


def test_distributed_deterministic_step_matches_single_device():
    """Exact parity: same physics, same GMRES iteration count — the sharded
    Krylov recurrence psums reproduce the replicated arithmetic."""
    geom, cfg, state, mesh = _setup()
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    s_ref, aux_ref = deterministic_step(geom, cfg, state, F)
    step_d = jax.jit(parallel.make_distributed_step(geom, cfg, mesh,
                                                    deterministic=True))
    s_sh, aux_sh = step_d(state, jax.random.key(0), F)
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh.U), np.asarray(aux_ref.U),
                               atol=1e-10)
    assert int(aux_sh.iters) == int(aux_ref.iters)


@pytest.mark.medium
def test_distributed_stochastic_step_runs_and_reproduces():
    geom, cfg, state, mesh = _setup(kBT=1.0)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    step = jax.jit(parallel.make_distributed_step(geom, cfg, mesh))
    s1, a1 = step(state, jax.random.key(3), F)
    s2, _ = step(state, jax.random.key(3), F)
    assert np.isfinite(np.asarray(s1.X)).all()
    assert float(a1.residual) < 1e-7
    assert float(a1.noise_err) > 0
    assert np.array_equal(np.asarray(s1.X), np.asarray(s2.X))
    # different key → different step
    s3, _ = step(state, jax.random.key(4), F)
    assert not np.allclose(np.asarray(s1.X), np.asarray(s3.X))


@pytest.mark.medium
def test_distributed_farfield_apply_matches_single_device():
    """The sliced-near-sweep + psum'd-moment proxy-grid apply reproduces the
    single-device far-field operator to machine precision (the slicing and
    regather are exact rearrangements), including wall + polydisperse."""
    from rigid_body_light_tpu.ops import farfield

    _, _, _, mesh = _setup()
    rng = np.random.default_rng(3)
    n = 800
    r = jnp.asarray(rng.uniform(0, 14, (n, 3)) + [0, 0, 1.0], jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.7, 1.2], n), jnp.float64)
    kw = dict(a=0.9, eta=1.3, grid=(3, 3, 2), p=3, wall=True)
    U_ref = farfield.mobility_apply(F, r, radii=radii, **kw)

    def local(F_l, r_l, a_l):
        return farfield.mobility_apply_local(F_l, r_l, 8, AX, radii_l=a_l,
                                             **kw)

    U = shard_map(local, mesh=mesh, in_specs=(P(AX), P(AX), P(AX)),
                  out_specs=P(AX), check_vma=False)(F, r, radii)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-13)


@pytest.mark.medium
def test_distributed_step_on_farfield_backend():
    """Fully-distributed deterministic step with cfg.farfield_grid set
    matches the single-device far-field step exactly (same backend both
    sides, so the comparison is machine-precision, not interpolation)."""
    geom, cfg, state, mesh = _setup()
    cfg = cfg.replace(farfield_grid=(2, 2, 2), farfield_p=3)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    s_ref, aux_ref = deterministic_step(geom, cfg, state, F)
    step_d = jax.jit(parallel.make_distributed_step(geom, cfg, mesh,
                                                    deterministic=True))
    s_sh, aux_sh = step_d(state, jax.random.key(0), F)
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh.U), np.asarray(aux_ref.U),
                               atol=1e-10)
    assert int(aux_sh.iters) == int(aux_ref.iters)


@pytest.mark.medium
def test_distributed_farfield_prepare_ctx_parity():
    """prepare_local/prepare_geometry_local: a prebuilt ctx (with or
    without a reused geometry tier) is bit-identical to the ctx-free
    apply — the hoisted setup is the SAME computation, just moved."""
    from rigid_body_light_tpu.ops import farfield

    _, _, _, mesh = _setup()
    rng = np.random.default_rng(5)
    n = 640
    r = jnp.asarray(rng.uniform(0, 12, (n, 3)) + [0, 0, 1.0], jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    kw = dict(a=0.9, eta=1.3, grid=(3, 3, 2), p=3, wall=True)

    def local(F_l, r_l):
        base = farfield.mobility_apply_local(F_l, r_l, 8, AX, **kw)
        ctx = farfield.prepare_local(r_l, 8, AX, **kw)
        hoisted = farfield.mobility_apply_local(F_l, r_l, 8, AX, ctx=ctx,
                                                **kw)
        geo = farfield.prepare_geometry_local(r_l, 8, AX, **kw)
        ctx_g = farfield.prepare_local(r_l, 8, AX, geo=geo, **kw)
        pinned = farfield.mobility_apply_local(F_l, r_l, 8, AX, ctx=ctx_g,
                                               **kw)
        return base, hoisted, pinned

    base, hoisted, pinned = shard_map(
        local, mesh=mesh, in_specs=(P(AX), P(AX)),
        out_specs=(P(AX), P(AX), P(AX)), check_vma=False)(F, r)
    np.testing.assert_array_equal(np.asarray(hoisted), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(pinned), np.asarray(base))


def _fft_eqn_counts(jaxpr, inside_while=False):
    """(ffts inside any while body, total ffts) over a jaxpr, recursively."""
    try:
        from jax.extend import core as jcore
    except ImportError:  # older jax
        from jax import core as jcore
    inside = 0
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if "fft" in name:
            total += 1
            if inside_while:
                inside += 1
        sub_inside = inside_while or name == "while"
        for val in eqn.params.values():
            subs = val if isinstance(val, (tuple, list)) else (val,)
            for v in subs:
                if isinstance(v, jcore.ClosedJaxpr):
                    v = v.jaxpr
                if isinstance(v, jcore.Jaxpr):
                    i, t = _fft_eqn_counts(v, sub_inside)
                    inside += i
                    total += t
    return inside, total


@pytest.mark.medium
def test_distributed_farfield_hoist_leaves_no_lattice_build_in_krylov(
        monkeypatch):
    """The kernel-lattice build must execute once per solve, not once per
    GMRES iteration: with the hoist active, the only FFTs inside the
    Krylov ``while`` body are the per-iteration spread/convolve ones;
    disabling the hoist (identity hoist_positions) pulls the whole
    lattice build into the loop body — strictly more FFTs there."""
    geom, cfg, state, mesh = _setup()
    cfg = cfg.replace(farfield_grid=(2, 2, 2), farfield_p=3)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)

    step = parallel.make_distributed_step(geom, cfg, mesh,
                                          deterministic=True)
    jaxpr = jax.make_jaxpr(step)(state, jax.random.key(0), F).jaxpr
    in_while, total = _fft_eqn_counts(jaxpr)
    assert total > in_while > 0  # build FFTs outside, apply FFTs inside

    monkeypatch.setattr(saddle, "hoist_positions", lambda mob, r: mob)
    step_bare = parallel.make_distributed_step(geom, cfg, mesh,
                                               deterministic=True)
    jaxpr_bare = jax.make_jaxpr(step_bare)(state, jax.random.key(0), F).jaxpr
    in_while_bare, _ = _fft_eqn_counts(jaxpr_bare)
    assert in_while_bare > in_while


def test_distributed_body_count_must_divide():
    geom, cfg, state, mesh = _setup(B=8)
    step = parallel.make_distributed_step(geom, cfg, mesh)
    bad = make_state(np.zeros((6, 3)) + [0, 0, 2.0],
                     np.tile([1.0, 0, 0, 0], (6, 1)), dtype=jnp.float64)
    with pytest.raises(ValueError, match="divisible"):
        step(bad, jax.random.key(0), jnp.zeros((6, 6), jnp.float64))


@pytest.mark.medium
def test_distributed_run_bd_trajectory():
    """Whole sharded trajectory: finite, converged, bodies sedimenting, and
    the kBT=0 limit matches the single-device scan exactly."""
    geom, cfg, state, mesh = _setup(kBT=0.0)
    force_fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(strength=2.0, debye_length=0.5, radius=1.0),
    )
    n_steps = 4
    run_sh = jax.jit(parallel.make_distributed_run_bd(
        geom, cfg, mesh, n_steps=n_steps, force_fn=force_fn))
    s_sh, traj_sh = run_sh(state, jax.random.key(0))
    s_ref, traj_ref = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=n_steps, force_fn=force_fn))(
        state, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj_sh["residual"]),
                               np.asarray(traj_ref["residual"]), atol=1e-9)

    # stochastic run: statistically sane (sediments towards the wall)
    cfg_t = cfg.replace(kBT=0.5, gmres_tol=1e-6)
    run_t = jax.jit(parallel.make_distributed_run_bd(
        geom, cfg_t, mesh, n_steps=6, force_fn=force_fn))
    s_t, traj_t = run_t(state, jax.random.key(1))
    assert np.isfinite(np.asarray(s_t.X)).all()
    assert np.asarray(traj_t["residual"]).max() < 1e-5
    assert np.asarray(traj_t["noise_err"]).max() > 0


def _setup_periodic(B=8):
    params, cfgb = load_structure("shell_N_12")
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    box = (12.0, 12.0, 10.0)
    xs = np.array([[3.0 + 5.0 * (i % 2), 3.0 + 5.0 * ((i // 2) % 2),
                    2.0 + 2.5 * (i // 4)] for i in range(B)])
    qs = np.tile([1.0, 0, 0, 0], (B, 1))
    state = make_state(xs, qs, dtype=jnp.float64)
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.01, kBT=0.0, wall=False,
                           box=box, dtype=jnp.float64, use_pallas=False,
                           gmres_tol=1e-9, pc_mode="block_free")
    mesh = parallel.make_mesh(8, axis_name=AX)
    return geom, cfg, state, mesh


@pytest.mark.medium
def test_distributed_ewald_apply_matches_single_device():
    """The ring real-space sweep + psum'd wave moments reproduce the exact
    single-device periodic operator to machine precision — unlike the
    ring's minimum-image fallback, this IS the Ewald operator.  (The
    driver dryrun covers open/wall/far-field paths; the periodic path is
    covered here to keep the dryrun's compile budget small.)"""
    from rigid_body_light_tpu.ops import ewald

    _, _, _, mesh = _setup_periodic()
    rng = np.random.default_rng(5)
    n = 256
    box = (9.0, 11.0, 8.0)
    r = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(box), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    params = ewald.make_params(box, 0.5, 1.3)
    U_ref = ewald.mobility_apply(F, r, params)

    def local(F_l, r_l):
        return ewald.mobility_apply_local(F_l, r_l, params, 8, AX)

    U = shard_map(local, mesh=mesh, in_specs=(P(AX), P(AX)),
                  out_specs=P(AX), check_vma=False)(F, r)
    assert float(jnp.abs(U - U_ref).max() / jnp.abs(U_ref).max()) < 1e-14


@pytest.mark.medium
def test_distributed_step_in_periodic_box():
    """Fully-distributed deterministic step with a 3-D box routes through
    the distributed Ewald operator and matches the single-device periodic
    step exactly (same Ewald parameters both sides)."""
    geom, cfg, state, mesh = _setup_periodic()
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    s_ref, aux_ref = deterministic_step(geom, cfg, state, F)
    step_d = jax.jit(parallel.make_distributed_step(geom, cfg, mesh,
                                                    deterministic=True))
    s_sh, aux_sh = step_d(state, jax.random.key(0), F)
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh.U), np.asarray(aux_ref.U),
                               atol=1e-10)
    assert int(aux_sh.iters) == int(aux_ref.iters)


@pytest.mark.medium
def test_distributed_ewald_cells_matches_single_device():
    """Balanced-splitting (rc) distributed Ewald routes the real part
    through the sliced sorted-tile sweep (O(N·ρ·rc³/D) per device) and
    matches the single-device linked-cell operator to machine precision,
    single- and multi-RHS."""
    from rigid_body_light_tpu.ops import ewald

    _, _, _, mesh = _setup_periodic()
    rng = np.random.default_rng(7)
    n = 512
    box = (12.0, 12.0, 12.0)
    r = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(box), jnp.float64)
    F = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float64)
    params = ewald.make_params(box, 0.5, 1.3, rc=3.0)
    assert params.rc is not None
    U_ref = ewald.mobility_apply_multi(F, r, params)

    def local(F_l, r_l):
        return ewald.mobility_apply_local(F_l, r_l, params, 8, AX)

    U = shard_map(local, mesh=mesh, in_specs=(P(None, AX), P(AX)),
                  out_specs=P(None, AX), check_vma=False)(F, r)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-13)


@pytest.mark.medium
def test_distributed_ewald_cells_polydisperse_matches_single_device():
    """Per-blob radii through the distributed balanced split: the sliced
    tile sweep carries the species-pair scalars and the psum'd wave
    moments carry per-blob sinc weights — exact parity with the
    single-device polydisperse operator.  The classic split (no rc)
    stays monodisperse and must say so."""
    from rigid_body_light_tpu.ops import ewald

    _, _, _, mesh = _setup_periodic()
    rng = np.random.default_rng(17)
    n = 512
    box = (12.0, 12.0, 12.0)
    r = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.array(box), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.4, 0.5, 0.65], size=n), jnp.float64)
    params = ewald.make_params(box, 0.5, 1.3, rc=3.0)
    U_ref = ewald.mobility_apply(F, r, params, radii=radii)

    def local(F_l, r_l, a_l):
        return ewald.mobility_apply_local(F_l, r_l, params, 8, AX,
                                          radii_l=a_l)

    U = shard_map(local, mesh=mesh, in_specs=(P(AX), P(AX), P(AX)),
                  out_specs=P(AX), check_vma=False)(F, r, radii)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-13)

    params0 = ewald.make_params(box, 0.5, 1.3)

    def local0(F_l, r_l, a_l):
        return ewald.mobility_apply_local(F_l, r_l, params0, 8, AX,
                                          radii_l=a_l)

    with pytest.raises(NotImplementedError, match="balanced splitting"):
        shard_map(local0, mesh=mesh, in_specs=(P(AX), P(AX), P(AX)),
                  out_specs=P(AX), check_vma=False)(F, r, radii)


@pytest.mark.medium
def test_distributed_run_bd_with_slip():
    """Active slip (squirmers) rides the distributed trajectory: slip_fn is
    per-blob-local, and the kBT=0 distributed run matches the single-device
    one exactly."""
    geom, cfg, state, mesh = _setup(kBT=0.0)
    n = geom.ref_cfg.shape[0]

    def slip_fn(s, i):
        # push fluid along -x on every blob → bodies swim +x (local B_l·n)
        B_l = s.X.shape[0]
        return jnp.tile(jnp.asarray([-0.05, 0.0, 0.0], jnp.float64),
                        (B_l * n, 1))

    run_sh = jax.jit(parallel.make_distributed_run_bd(
        geom, cfg, mesh, n_steps=3, slip_fn=slip_fn))
    s_sh, traj_sh = run_sh(state, jax.random.key(0))
    s_ref, _ = jax.jit(functools.partial(
        run_bd, geom, cfg, n_steps=3, slip_fn=slip_fn))(
        state, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-11)
    # force-free swimming: bodies actually moved in +x
    assert (np.asarray(s_sh.X)[:, 0] > np.asarray(state.X)[:, 0]).all()


@pytest.mark.medium
def test_distributed_stochastic_farfield_and_adaptive_noise():
    """Two robustness compositions in one compile: a fluctuating step on
    the distributed far-field backend (multi-RHS fused Lanczos through the
    sliced near sweep), and the adaptive noise mode (while_loop Lanczos
    with psum'd recurrences) under the mesh axis."""
    geom, cfg, state, mesh = _setup(kBT=1.0)
    cfg = cfg.replace(farfield_grid=(2, 2, 2), farfield_p=3,
                      lanczos_max_iters=24, lanczos_err_tol=1e-6)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    step = jax.jit(parallel.make_distributed_step(geom, cfg, mesh))
    s1, a1 = step(state, jax.random.key(5), F)
    assert np.isfinite(np.asarray(s1.X)).all()
    assert float(a1.residual) < 1e-7
    # adaptive mode drove the truncation estimate to (near) tolerance
    assert 0 < float(a1.noise_err) < 1e-5
    # reproducible
    s2, _ = step(state, jax.random.key(5), F)
    assert np.array_equal(np.asarray(s1.X), np.asarray(s2.X))


@pytest.mark.medium
def test_distributed_noise_covariance_trace():
    """⟨‖M^{1/2}W‖²⟩ → tr(M) with the SHARDED sampler: per-device folded
    keys draw independent local W shards, the Lanczos recurrence closes
    over the mesh with psums — the global covariance must still be exactly
    M.  Certifies the distributed stepper's noise statistics (the other
    distributed tests only check determinism/convergence)."""
    import oracle
    from rigid_body_light_tpu.ops import lanczos
    from jax import lax as jlax

    _, cfg, _, mesh = _setup()
    cfg = cfg.replace(wall=False)
    rng = np.random.default_rng(9)
    n = 64
    pos = jnp.asarray(rng.uniform(0, 10, (n, 3)), jnp.float64)
    M = oracle.rpy_matrix(np.asarray(pos), cfg.a, cfg.eta, False)
    mob_local = parallel.ring_mobility_apply_fn(cfg, 8, AX)

    def local(r_l, k):
        k = jax.random.fold_in(k, jlax.axis_index(AX))
        y = lanczos.m_half_w(mob_local, r_l, k, iters=30, axis_name=AX)
        return jlax.psum(jnp.vdot(y, y), AX)  # global ‖y‖², replicated

    draw = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(AX), P()),
                             out_specs=P(), check_vma=False))
    n_samp = 400
    keys = jax.random.split(jax.random.key(11), n_samp)
    traces = np.array([float(draw(pos, k)) for k in keys])
    est, se = traces.mean(), traces.std() / np.sqrt(n_samp)
    assert abs(est - np.trace(M)) < 5 * se + 1e-9


def _setup_mixture():
    from rigid_body_light_tpu import multi

    pa, ca = load_structure("shell_N_12")
    pb, cb = load_structure("shell_N_42")
    rng = np.random.default_rng(21)
    Xa = rng.uniform(0, 20, (8, 3)) + [0, 0, 4.0]
    Xb = rng.uniform(0, 20, (8, 3)) + [0, 0, 9.0]
    qa = rng.standard_normal((8, 4))
    qa /= np.linalg.norm(qa, axis=1, keepdims=True)
    qb = rng.standard_normal((8, 4))
    qb /= np.linalg.norm(qb, axis=1, keepdims=True)
    a = pa["sep"] / 2
    cfg = SimulationConfig(a=a, dt=0.02, kBT=0.0, wall=True,
                           dtype=jnp.float64, gmres_tol=1e-9,
                           pc_mode="block_free", use_pallas=False,
                           lanczos_iters=8)
    mgeom = multi.MultiGeometry.create([ca, cb], dtype=jnp.float64,
                                       radii=(None, 1.4 * a))
    states = (make_state(Xa, qa, dtype=jnp.float64),
              make_state(Xb, qb, dtype=jnp.float64))
    F = (jnp.tile(jnp.asarray([0.0, 0, -1, 0, 0, 0], jnp.float64), (8, 1)),
         jnp.tile(jnp.asarray([0.0, 0, -2, 0, 0, 0], jnp.float64), (8, 1)))
    mesh = parallel.make_mesh(8, axis_name=AX)
    return mgeom, cfg, states, F, mesh


@pytest.mark.medium
def test_distributed_mixture_step_matches_single_device():
    """Two-species polydisperse mixture on the fully-sharded path: the
    per-blob radii ride the ppermute ring, every per-species transform is
    body-local, and the kBT=0 step matches the single-device mixture step
    to machine precision with the same GMRES iteration count."""
    from rigid_body_light_tpu import multi

    mgeom, cfg, states, F, mesh = _setup_mixture()
    s_ref, res_ref = multi.stochastic_step_multi(mgeom, cfg, states,
                                                 jax.random.key(0), F)
    step_d = jax.jit(parallel.make_distributed_step_multi(mgeom, cfg, mesh))
    s_sh, res_sh = step_d(states, jax.random.key(0), F)
    for a_, b_ in zip(s_sh, s_ref):
        np.testing.assert_allclose(np.asarray(a_.X), np.asarray(b_.X),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(a_.Q), np.asarray(b_.Q),
                                   atol=1e-12)
    assert int(res_sh.iters) == int(res_ref.iters)
    assert float(res_sh.residual) < 1e-8


@pytest.mark.medium
def test_distributed_em_exact_step():
    """drift_mode='em_exact' on the fully-sharded path (round-4 closure):
    the inner RFD saddle solves psum over the axis.  Runs, converges,
    reproduces, and differs from the midpoint scheme's step (different
    drift construction) while agreeing with it statistically-scale-wise."""
    geom, cfg, state, mesh = _setup(kBT=1.0)
    cfg = cfg.replace(drift_mode="em_exact", gmres_tol=1e-6)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    step = jax.jit(parallel.make_distributed_step(geom, cfg, mesh))
    s1, a1 = step(state, jax.random.key(7), F)
    s2, _ = step(state, jax.random.key(7), F)
    assert np.isfinite(np.asarray(s1.X)).all()
    assert float(a1.residual) < 1e-5
    assert np.array_equal(np.asarray(s1.X), np.asarray(s2.X))
    # moves are O(sqrt(2 kBT dt)) — sane magnitude, not an unmoved state
    dX = np.asarray(s1.X) - np.asarray(state.X)
    assert 0 < np.abs(dX).max() < 5.0


@pytest.mark.medium
def test_distributed_mixture_em_exact_step():
    """Mixture em_exact on the fully-sharded path (round-4 closure)."""
    from rigid_body_light_tpu import multi

    mgeom, cfg, states, F, mesh = _setup_mixture()
    cfg = cfg.replace(kBT=0.5, drift_mode="em_exact", gmres_tol=1e-6)
    step = jax.jit(parallel.make_distributed_step_multi(mgeom, cfg, mesh))
    s1, r1 = step(states, jax.random.key(5), F)
    s2, _ = step(states, jax.random.key(5), F)
    assert all(np.isfinite(np.asarray(s.X)).all() for s in s1)
    assert float(r1.residual) < 1e-5
    for a_, b_ in zip(s1, s2):
        assert np.array_equal(np.asarray(a_.X), np.asarray(b_.X))


@pytest.mark.medium
def test_distributed_mixture_stochastic_and_trajectory():
    """Fluctuating distributed mixture stepping (preconditioned fused
    Lanczos noise with psum'd recurrences over the polydisperse ring) runs,
    converges and reproduces; the kBT=0 distributed trajectory matches the
    single-device scan exactly."""
    from rigid_body_light_tpu import multi

    mgeom, cfg, states, F, mesh = _setup_mixture()
    # stochastic step: runs + reproduces
    cfg_t = cfg.replace(kBT=0.5)
    step = jax.jit(parallel.make_distributed_step_multi(mgeom, cfg_t, mesh))
    s1, r1 = step(states, jax.random.key(3), F)
    s2, _ = step(states, jax.random.key(3), F)
    assert all(np.isfinite(np.asarray(s.X)).all() for s in s1)
    assert float(r1.residual) < 1e-7
    for a_, b_ in zip(s1, s2):
        assert np.array_equal(np.asarray(a_.X), np.asarray(b_.X))
    s3, _ = step(states, jax.random.key(4), F)
    assert not np.allclose(np.asarray(s1[0].X), np.asarray(s3[0].X))

    # kBT=0 trajectory parity.  force_fn must be per-body-LOCAL (it sees
    # the local species shards inside shard_map); a uniform per-species
    # wrench built from the states' own shapes works on both sides.
    def force_fn(ss, i):
        return tuple(
            jnp.zeros((s.X.shape[0], 6), jnp.float64).at[:, 2].set(v)
            for s, v in zip(ss, (-1.0, -2.0))
        )

    run_sh = jax.jit(parallel.make_distributed_run_bd_multi(
        mgeom, cfg, mesh, n_steps=3, force_fn=force_fn))
    f_sh, traj_sh = run_sh(states, jax.random.key(0))
    f_ref, traj_ref = jax.jit(functools.partial(
        multi.run_bd_multi, mgeom, cfg, n_steps=3, force_fn=force_fn))(
        states, jax.random.key(0))
    for a_, b_ in zip(f_sh, f_ref):
        np.testing.assert_allclose(np.asarray(a_.X), np.asarray(b_.X),
                                   atol=1e-11)
    np.testing.assert_allclose(np.asarray(traj_sh["residual"]),
                               np.asarray(traj_ref["residual"]), atol=1e-9)


@pytest.mark.medium
def test_distributed_pseudo2d_farfield_matches_single_device():
    """Distributed pseudo-2D (doubly-periodic wall) far field: the
    replicated image-summed cyclic lattice + seam-wrapped sharded near
    sweep reproduces the single-device pseudo-2D operator to machine
    precision (same backend both sides — exact rearrangement)."""
    from rigid_body_light_tpu.ops import farfield

    _, _, _, mesh = _setup()
    rng = np.random.default_rng(7)
    n = 640
    box = (14.0, 14.0)
    r = jnp.asarray(np.stack([
        rng.uniform(0, box[0], n), rng.uniform(0, box[1], n),
        rng.uniform(1.0, 3.5, n)], axis=1), jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    kw = dict(a=1.0, eta=1.3, grid=(4, 4, 2), p=3, wall=True, box=box,
              image_shells=3)
    U_ref = farfield.mobility_apply(F, r, **kw)

    def local(F_l, r_l):
        base = farfield.mobility_apply_local(F_l, r_l, 8, AX, **kw)
        ctx = farfield.prepare_local(r_l, 8, AX, **kw)
        hoisted = farfield.mobility_apply_local(F_l, r_l, 8, AX, ctx=ctx,
                                                **kw)
        geo = farfield.prepare_geometry_local(r_l, 8, AX, **kw)
        ctx_g = farfield.prepare_local(r_l, 8, AX, geo=geo, **kw)
        pinned = farfield.mobility_apply_local(F_l, r_l, 8, AX, ctx=ctx_g,
                                               **kw)
        return base, hoisted, pinned

    base, hoisted, pinned = shard_map(
        local, mesh=mesh, in_specs=(P(AX), P(AX)),
        out_specs=(P(AX), P(AX), P(AX)), check_vma=False)(F, r)
    np.testing.assert_allclose(np.asarray(base), np.asarray(U_ref),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                               atol=0)
    np.testing.assert_allclose(np.asarray(pinned), np.asarray(base),
                               atol=1e-13)


@pytest.mark.medium
def test_distributed_step_on_pseudo2d_farfield_backend():
    """Fully-distributed deterministic step through the config routing
    (2-D box + wall + farfield_grid) matches the single-device pseudo-2D
    far-field step exactly; the ring sweep still rejects image_shells."""
    geom, cfg, state, mesh = _setup()
    cfg = cfg.replace(box=(11.0, 11.0), image_shells=2,
                      farfield_grid=(4, 4, 2), farfield_p=3,
                      gmres_tol=1e-6)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    s_ref, aux_ref = deterministic_step(geom, cfg, state, F)
    step_d = jax.jit(parallel.make_distributed_step(geom, cfg, mesh,
                                                    deterministic=True))
    s_sh, aux_sh = step_d(state, jax.random.key(0), F)
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh.U), np.asarray(aux_ref.U),
                               atol=1e-10)
    assert int(aux_sh.iters) == int(aux_ref.iters)


@pytest.mark.medium
def test_distributed_exact_image_ring_matches_single_device():
    """image_shells ≥ 1 over the ring (round-5): every ring slab carries
    the exact doubly-periodic offset lattice (incl. self-images at the
    diagonal step), so the fully-distributed step reproduces the
    single-device exact image sweep — same answer, same iterations."""
    geom, cfg, state, mesh = _setup()
    cfg = cfg.replace(box=(11.0, 11.0), image_shells=2, gmres_tol=1e-8)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    s_ref, aux_ref = deterministic_step(geom, cfg, state, F)
    step_d = jax.jit(parallel.make_distributed_step(geom, cfg, mesh,
                                                    deterministic=True))
    s_sh, aux_sh = step_d(state, jax.random.key(0), F)
    np.testing.assert_allclose(np.asarray(s_sh.X), np.asarray(s_ref.X),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_sh.U), np.asarray(aux_ref.U),
                               atol=1e-10)
    assert int(aux_sh.iters) == int(aux_ref.iters)
    # the image sum actually engages: it differs from minimum-image
    _, aux_mi = deterministic_step(geom, cfg.replace(image_shells=0),
                                   state, F)
    assert not np.allclose(np.asarray(aux_sh.U), np.asarray(aux_mi.U),
                           atol=1e-8)


# ------------------------------------------------------------------ RAS PC
def _settled_layer_8(seed=11, **cfg_kw):
    """Dense near-wall layer of 12-blob shells (the RAS regime — see
    tests/test_solver.py::_settled_layer), sized for the 8-device mesh."""
    params, cfgb = load_structure("shell_N_12")
    rng = np.random.default_rng(seed)
    B = 8
    xs = np.array([[2.3 * (i % 4), 2.3 * (i // 4), 1.35]
                   for i in range(B)], float)
    xs[:, :2] += 0.1 * rng.standard_normal((B, 2))
    xs[:, 2] += 0.05 * rng.standard_normal(B)
    qs = rng.standard_normal((B, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    kw = dict(a=params["sep"] / 2, wall=True, dtype=jnp.float64,
              gmres_tol=1e-8, gmres_maxiter=200, use_pallas=False,
              pc_mode="ras", pc_halo=4.0, pc_halo_max=16)
    kw.update(cfg_kw)
    cfg = SimulationConfig(**kw)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state(xs, qs, dtype=jnp.float64)
    mesh = parallel.make_mesh(8, axis_name=AX)
    return geom, cfg, state, mesh


def test_distributed_ras_solve_matches_single_device():
    """pc_mode='ras' distributed (round-5): the gathered-halo build +
    sharded Woodbury apply reproduce the single-device RAS solve — same
    solution AND the same GMRES iteration count (the PC algebra is
    identical, only sharded; one body per device here, so every halo
    cluster crosses shards)."""
    from rigid_body_light_tpu.ops import solvers
    from rigid_body_light_tpu.state import BodyState

    geom, cfg, state, mesh = _settled_layer_8()
    ops_g = saddle.geometry_ops(geom, state)
    B, n, _ = ops_g.offsets.shape
    rng = np.random.default_rng(3)
    slip = jnp.asarray(rng.standard_normal((B * n, 3)))
    force = jnp.asarray(rng.standard_normal((B, 6)))
    res_ref = solvers.solve_saddle(ops_g, cfg, slip, force)
    res_bf = solvers.solve_saddle(ops_g, cfg.replace(pc_mode="block_free"),
                                  slip, force)
    assert float(res_ref.residual) < 1e-8
    # the halo coupling must actually engage on this geometry — otherwise
    # this parity test silently degrades to block_free-vs-block_free
    assert int(res_ref.iters) < int(res_bf.iters)

    mob_local = parallel.ring_mobility_apply_fn(cfg, 8, AX)

    def local(X_l, Q_l, slip_l, force_l):
        ops_l = saddle.geometry_ops(geom, BodyState(X=X_l, Q=Q_l))
        res = solvers.solve_saddle(ops_l, cfg, slip_l, force_l,
                                   mob_apply=mob_local, axis_name=AX)
        return res.lam, res.U, res.residual, res.iters

    lam, U, resid, iters = shard_map(
        local, mesh=mesh,
        in_specs=(P(AX), P(AX), P(AX), P(AX)),
        out_specs=(P(AX), P(AX), P(), P()),
        check_vma=False,
    )(state.X, state.Q, slip.reshape(B, n, 3), force)
    assert float(resid) < 1e-8
    assert int(iters) == int(res_ref.iters)
    np.testing.assert_allclose(np.asarray(U), np.asarray(res_ref.U),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam).reshape(-1, 3),
                               np.asarray(res_ref.lam), atol=1e-9)


@pytest.mark.medium
def test_distributed_ras_stochastic_step_runs():
    """End-to-end distributed BD step with pc_mode='ras' (the settled
    production config, sharded): finite, converged, reproducible."""
    geom, cfg, state, mesh = _settled_layer_8(kBT=1.0, dt=0.005,
                                              lanczos_iters=8,
                                              gmres_tol=1e-6)
    F = jnp.zeros((8, 6), jnp.float64).at[:, 2].set(-1.0)
    step = jax.jit(parallel.make_distributed_step(geom, cfg, mesh))
    s1, a1 = step(state, jax.random.key(3), F)
    assert np.isfinite(np.asarray(s1.X)).all()
    assert float(a1.residual) < 1e-5
    s2, _ = step(state, jax.random.key(3), F)
    assert np.array_equal(np.asarray(s1.X), np.asarray(s2.X))


@pytest.mark.medium
def test_distributed_farfield_band_tier_matches_single_device():
    """Band tier (farfield_band_p) under shard_map: the high-order band
    moments psum along with the FFT-tier moments, so the distributed
    apply reproduces the single-device band operator to machine
    precision (wall + polydisperse included)."""
    from rigid_body_light_tpu.ops import farfield

    _, _, _, mesh = _setup()
    rng = np.random.default_rng(9)
    n = 800
    r = jnp.asarray(rng.uniform(0, 16, (n, 3)) + [0, 0, 1.0], jnp.float64)
    F = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    radii = jnp.asarray(rng.choice([0.7, 1.2], n), jnp.float64)
    kw = dict(a=0.9, eta=1.3, grid=(4, 4, 2), p=3, band_p=4, wall=True)
    U_ref = farfield.mobility_apply(F, r, radii=radii, **kw)

    def local(F_l, r_l, a_l):
        return farfield.mobility_apply_local(F_l, r_l, 8, AX, radii_l=a_l,
                                             **kw)

    U = shard_map(local, mesh=mesh, in_specs=(P(AX), P(AX), P(AX)),
                  out_specs=P(AX), check_vma=False)(F, r, radii)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-13)
