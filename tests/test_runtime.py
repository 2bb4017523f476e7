"""Native runtime: trajectory writer/reader round-trip (C++ path and Python
fallback must produce identical files), checkpoint round-trip, forces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.runtime import TrajectoryWriter, native_available, read_trajectory
from rigid_body_light_tpu.state import BodyState, make_state
from rigid_body_light_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from rigid_body_light_tpu import forces


@pytest.mark.parametrize("force_python", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_trajectory_roundtrip(tmp_path, force_python, dtype):
    if not force_python and not native_available():
        pytest.skip("no C++ toolchain")
    path = str(tmp_path / "traj.rblt")
    B, T = 7, 25
    rng = np.random.default_rng(0)
    Xs = rng.standard_normal((T, B, 3)).astype(dtype)
    Qs = rng.standard_normal((T, B, 4)).astype(dtype)
    with TrajectoryWriter(path, B, dtype=dtype, force_python=force_python) as w:
        for t in range(T):
            w.append(t, 0.01 * t, Xs[t], Qs[t])
        w.flush()
        assert w.frames == T
    steps, times, X, Q = read_trajectory(path)
    assert steps.tolist() == list(range(T))
    assert np.allclose(times, 0.01 * np.arange(T))
    assert np.array_equal(X, Xs)
    assert np.array_equal(Q, Qs)


def test_native_and_python_writers_bitwise_identical(tmp_path):
    if not native_available():
        pytest.skip("no C++ toolchain")
    B, T = 3, 9
    rng = np.random.default_rng(1)
    Xs = rng.standard_normal((T, B, 3)).astype(np.float32)
    Qs = rng.standard_normal((T, B, 4)).astype(np.float32)
    paths = []
    for force_python in (False, True):
        p = str(tmp_path / f"t{force_python}.rblt")
        with TrajectoryWriter(p, B, force_python=force_python) as w:
            for t in range(T):
                w.append(t, float(t), Xs[t], Qs[t])
        paths.append(p)
    assert open(paths[0], "rb").read() == open(paths[1], "rb").read()


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    state = make_state(np.random.randn(4, 3), np.random.randn(4, 4), dtype=jnp.float64)
    key = jax.random.key(123)
    save_checkpoint(path, state, key, step=77, metadata={"note": "hello"})
    s2, k2, step, meta = load_checkpoint(path, dtype=jnp.float64)
    assert np.array_equal(np.asarray(state.X), np.asarray(s2.X))
    assert np.array_equal(np.asarray(state.Q), np.asarray(s2.Q))
    assert step == 77
    assert meta == {"note": "hello"}
    # restored key must generate the same stream
    a = jax.random.normal(key, (5,))
    b = jax.random.normal(k2, (5,))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_without_key(tmp_path):
    path = str(tmp_path / "ckpt2.npz")
    state = make_state(np.zeros((2, 3)), np.tile([1.0, 0, 0, 0], (2, 1)))
    save_checkpoint(path, state)
    s2, k2, step, meta = load_checkpoint(path)
    assert k2 is None and step == 0


def test_forces_compose():
    state = make_state(np.array([[0.0, 0, 2.0], [3.0, 0, 1.0]]),
                       np.tile([1.0, 0, 0, 0], (2, 1)), dtype=jnp.float64)
    g = forces.gravity(np.array([0, 0, -1.0, 0, 0, 0]))
    w = forces.wall_repulsion(strength=2.0, debye_length=0.5, radius=1.0)
    trap = forces.harmonic_trap(0.1, np.zeros(3))
    yuk = forces.pair_yukawa(strength=1.0, debye_length=1.0, diameter=2.0)
    total = forces.sum_forces(g, w, trap, yuk)(state)
    assert total.shape == (2, 6)
    assert np.isfinite(np.asarray(total)).all()
    # gravity pulls down; wall pushes up more strongly for the lower body
    fz = np.asarray(w(state))[:, 2]
    assert fz[1] > fz[0] > 0
    # yukawa: equal and opposite on the pair, along x
    fy = np.asarray(yuk(state))
    assert np.allclose(fy[0, :3], -fy[1, :3])
    assert fy[0, 0] < 0 < fy[1, 0]


def test_forces_jit_in_scan():
    """Force fields must compose under jit/scan (the run_bd contract)."""
    state = make_state(np.array([[0.0, 0, 2.0]]), np.array([[1.0, 0, 0, 0]]),
                       dtype=jnp.float64)
    fn = forces.sum_forces(
        forces.gravity(np.array([0, 0, -1.0, 0, 0, 0])),
        forces.wall_repulsion(1.0, 0.5),
    )
    out = jax.jit(lambda s: fn(s, 0))(state)
    assert out.shape == (1, 6)


def test_checkpoint_format_versions(tmp_path):
    """Mixture checkpoints carry format v2 (distinct layout) so pre-mixture
    readers fail with a clear version error, not a KeyError; single-species
    checkpoints stay v1; unknown future versions are rejected cleanly."""
    import json as _json

    import pytest

    single = str(tmp_path / "single.npz")
    save_checkpoint(single, make_state(np.zeros((2, 3)),
                                       np.tile([1.0, 0, 0, 0], (2, 1))))
    with np.load(single) as z:
        assert int(z["format_version"]) == 1

    mix = str(tmp_path / "mix.npz")
    states = (
        make_state(np.zeros((2, 3)), np.tile([1.0, 0, 0, 0], (2, 1))),
        make_state(np.ones((1, 3)), np.array([[1.0, 0, 0, 0]])),
    )
    save_checkpoint(mix, states, step=5)
    with np.load(mix) as z:
        assert int(z["format_version"]) == 2
    loaded, _, step, _ = load_checkpoint(mix)
    assert isinstance(loaded, tuple) and len(loaded) == 2 and step == 5
    assert np.array_equal(np.asarray(loaded[1].X), np.ones((1, 3)))

    future = str(tmp_path / "future.npz")
    np.savez(future, format_version=np.asarray(99), step=np.asarray(0),
             metadata=_json.dumps({}))
    with pytest.raises(RuntimeError, match="format v99"):
        load_checkpoint(future)
