"""Multi-chip path on the 8-virtual-device CPU mesh: sharded matvec parity
with the single-device path, and the full BD step under sharding."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu import SimulationConfig, load_structure
from rigid_body_light_tpu.dynamics import stochastic_step
from rigid_body_light_tpu.ops import kinematics as kin
from rigid_body_light_tpu.ops import rpy
from rigid_body_light_tpu.parallel import make_mesh, sharded_mobility_apply_fn
from rigid_body_light_tpu.state import make_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device mesh"
)


@pytest.mark.parametrize("wall", [False, True])
@pytest.mark.parametrize("n", [64, 101])  # divisible and non-divisible by 8
def test_sharded_matvec_parity(wall, n):
    mesh = make_mesh()
    cfg = SimulationConfig(a=0.5, eta=1.3, wall=wall, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.uniform([-5, -5, 0.5], [5, 5, 6], (n, 3)))
    F = jnp.asarray(rng.standard_normal((n, 3)))
    U_sharded = jax.jit(sharded_mobility_apply_fn(cfg, mesh))(F, r)
    U_single = rpy.mobility_apply(F, r, a=0.5, eta=1.3, wall=wall)
    assert np.abs(np.asarray(U_sharded - U_single)).max() < 1e-13


@pytest.mark.medium
def test_sharded_bd_step_matches_replicated():
    """Full stochastic step with the sharded matvec must match the
    single-device step bit-for-tolerance (same keys, same scheme)."""
    mesh = make_mesh()
    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=1.0,
                           dtype=jnp.float64, lanczos_iters=10)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0], [3.0, 0, 0], [0, 3.0, 0]],
                       [[1.0, 0, 0, 0]] * 3, dtype=jnp.float64)
    F = jnp.zeros((3, 6)).at[:, 2].set(-1.0)
    key = jax.random.key(9)

    mob_sharded = sharded_mobility_apply_fn(cfg, mesh)
    step_sharded = jax.jit(
        functools.partial(stochastic_step, geom, cfg, mob_apply=mob_sharded)
    )
    step_single = jax.jit(functools.partial(stochastic_step, geom, cfg))

    s_sh, aux_sh = step_sharded(state, key, F)
    s_si, aux_si = step_single(state, key, F)
    assert np.allclose(np.asarray(s_sh.X), np.asarray(s_si.X), atol=1e-10)
    assert np.allclose(np.asarray(s_sh.Q), np.asarray(s_si.Q), atol=1e-10)
    assert float(aux_sh.residual) < 1e-5


def test_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4


@pytest.mark.parametrize("wall", [False, True])
@pytest.mark.parametrize("n", [64, 101])
def test_2d_sharded_matvec_parity(wall, n):
    """SUMMA-style (2, 4) mesh: rows x cols slab sweep + psum must match the
    single-device matvec."""
    from rigid_body_light_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d((2, 4))
    cfg = SimulationConfig(a=0.5, eta=1.3, wall=wall, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.uniform([-5, -5, 0.5], [5, 5, 6], (n, 3)))
    F = jnp.asarray(rng.standard_normal((n, 3)))
    U_sharded = jax.jit(sharded_mobility_apply_fn(cfg, mesh))(F, r)
    U_single = rpy.mobility_apply(F, r, a=0.5, eta=1.3, wall=wall)
    assert np.abs(np.asarray(U_sharded - U_single)).max() < 1e-13


@pytest.mark.medium
def test_2d_sharded_bd_step():
    from rigid_body_light_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d((2, 4))
    params, cfgb = load_structure("shell_N_12")
    cfg = SimulationConfig(a=params["sep"] / 2, dt=0.02, kBT=1.0,
                           dtype=jnp.float64, lanczos_iters=10)
    geom = kin.make_ref_geometry(cfgb, dtype=jnp.float64)
    state = make_state([[0.0, 0.0, 0.0], [3.0, 0, 0], [0, 3.0, 0]],
                       [[1.0, 0, 0, 0]] * 3, dtype=jnp.float64)
    F = jnp.zeros((3, 6)).at[:, 2].set(-1.0)
    mob = sharded_mobility_apply_fn(cfg, mesh)
    step = jax.jit(functools.partial(stochastic_step, geom, cfg, mob_apply=mob))
    s2, aux = step(state, jax.random.key(4), F)
    assert np.isfinite(np.asarray(s2.X)).all()
    assert float(aux.residual) < 1e-5
