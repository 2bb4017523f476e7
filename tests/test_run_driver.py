"""End-to-end CLI driver: config → trajectory + checkpoint → resume."""

import json
import os

import numpy as np
import pytest

from rigid_body_light_tpu.run import main
from rigid_body_light_tpu.runtime import read_trajectory
from rigid_body_light_tpu.utils.checkpoint import load_checkpoint


def _config(tmp_path, **overrides):
    conf = {
        "structure": "shell_N_12",
        "n_bodies": 2,
        "placement": {"type": "grid", "spacing": 4.0, "z0": 2.0},
        "a": None,
        "eta": 1.0,
        "dt": 0.02,
        "kBT": 0.5,
        "wall": True,
        "dtype": "float64",
        "n_steps": 8,
        "save_every": 2,
        "checkpoint_every": 4,
        "forces": [
            {"type": "gravity", "value": [0, 0, -0.5, 0, 0, 0]},
            {"type": "wall_repulsion", "strength": 2.0, "debye_length": 0.5},
        ],
        "seed": 3,
        "output_dir": str(tmp_path / "out"),
        "solver": {"gmres_tol": 1e-7, "gmres_restart": 30, "gmres_maxiter": 90,
                   "lanczos_iters": 10},
    }
    conf.update(overrides)
    p = str(tmp_path / "config.json")
    with open(p, "w") as f:
        json.dump(conf, f)
    return p, conf


@pytest.mark.medium
def test_run_and_resume(tmp_path, capsys):
    cfg_path, conf = _config(tmp_path)
    main([cfg_path])
    out_dir = conf["output_dir"]
    steps, times, X, Q = read_trajectory(os.path.join(out_dir, "trajectory.rblt"))
    assert steps.tolist() == [2, 4, 6, 8]
    assert np.isfinite(X).all()
    assert np.allclose(times, np.asarray(steps, float) * conf["dt"])
    state, key, step, meta = load_checkpoint(os.path.join(out_dir, "checkpoint.npz"))
    assert step == 8 and key is not None
    assert meta["config"]["n_steps"] == 8

    # resume: trajectory must append, not truncate
    main([cfg_path, "--resume", os.path.join(out_dir, "checkpoint.npz")])
    steps2, _, X2, _ = read_trajectory(os.path.join(out_dir, "trajectory.rblt"))
    assert steps2.tolist() == [2, 4, 6, 8, 10, 12, 14, 16]
    assert np.array_equal(X2[:4], X)


def test_invalid_chunking_rejected(tmp_path):
    cfg_path, _ = _config(tmp_path, save_every=3)  # 4 % 3 != 0
    with pytest.raises(ValueError, match="multiple of save_every"):
        main([cfg_path])
    cfg_path, _ = _config(tmp_path, n_steps=10)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="multiple of checkpoint_every"):
        main([cfg_path])


def test_random_and_file_placement(tmp_path):
    init = str(tmp_path / "init.npz")
    X = np.array([[0.0, 0, 2.0], [5.0, 0, 2.0]])
    Q = np.tile([1.0, 0, 0, 0], (2, 1))
    np.savez(init, X=X, Q=Q)
    cfg_path, conf = _config(
        tmp_path, placement={"type": "file", "path": init}, kBT=0.0,
        forces=[{"type": "gravity", "value": [0, 0, -1.0, 0, 0, 0]}],
    )
    main([cfg_path])
    _, _, Xs, _ = read_trajectory(os.path.join(conf["output_dir"], "trajectory.rblt"))
    # deterministic sedimentation from the file-supplied positions (xy only
    # drifts weakly through pair-wall hydrodynamics)
    assert Xs[0, 0, 2] < 2.0
    assert np.allclose(Xs[0, :, :2], X[:, :2], atol=1e-2)


@pytest.mark.medium
def test_mixture_run_and_resume(tmp_path):
    """'species' config drives the multi stack: concatenated trajectory
    frames, mixture checkpoint (per-species X/Q), exact resume."""
    conf = {
        "species": [
            {"structure": "shell_N_12", "n_bodies": 2,
             "placement": {"type": "grid", "spacing": 4.0, "z0": 2.0}},
            {"structure": "shell_N_12", "n_bodies": 1, "scale": 0.5,
             "placement": {"type": "grid", "spacing": 4.0, "z0": 4.0},
             "forces": [{"type": "gravity", "value": [0, 0, -0.1, 0, 0, 0]}]},
        ],
        "a": 0.4, "eta": 1.0, "dt": 0.02, "kBT": 0.4, "wall": True,
        "dtype": "float64", "n_steps": 8, "save_every": 2,
        "checkpoint_every": 4,
        "forces": [{"type": "gravity", "value": [0, 0, -0.5, 0, 0, 0]},
                   {"type": "wall_repulsion", "strength": 2.0,
                    "debye_length": 0.5}],
        "seed": 5, "output_dir": str(tmp_path / "out"),
        "solver": {"gmres_tol": 1e-7, "gmres_restart": 30,
                   "gmres_maxiter": 90, "lanczos_iters": 10},
    }
    cfg_path = str(tmp_path / "mix.json")
    with open(cfg_path, "w") as f:
        json.dump(conf, f)
    main([cfg_path])
    out_dir = conf["output_dir"]
    steps, times, X, Q = read_trajectory(os.path.join(out_dir, "trajectory.rblt"))
    assert steps.tolist() == [2, 4, 6, 8]
    assert X.shape[1] == 3  # 2 + 1 bodies concatenated
    assert np.isfinite(X).all()
    states, key, step, meta = load_checkpoint(os.path.join(out_dir, "checkpoint.npz"))
    assert isinstance(states, tuple) and len(states) == 2
    assert states[0].X.shape == (2, 3) and states[1].X.shape == (1, 3)
    assert meta["species_sizes"] == [2, 1]
    assert step == 8 and key is not None
    # checkpointed state matches the last trajectory frame
    assert np.allclose(np.concatenate([states[0].X, states[1].X]), X[-1],
                       atol=1e-12)

    main([cfg_path, "--resume", os.path.join(out_dir, "checkpoint.npz")])
    steps2, _, X2, _ = read_trajectory(os.path.join(out_dir, "trajectory.rblt"))
    assert steps2.tolist() == [2, 4, 6, 8, 10, 12, 14, 16]
    assert np.array_equal(X2[:4], X)


@pytest.mark.medium
def test_mesh_run_matches_single_device(tmp_path):
    """'mesh' config key routes the pair sweep through the sharded path on
    the 8-virtual-device mesh; the trajectory must match the single-device
    run (same seed, f64 — only summation order differs)."""
    cfg_ref, conf_ref = _config(tmp_path, output_dir=str(tmp_path / "ref"))
    main([cfg_ref])
    refX = read_trajectory(
        os.path.join(conf_ref["output_dir"], "trajectory.rblt"))[2]

    for shape in ([8], [2, 4]):
        out = str(tmp_path / f"mesh{len(shape)}")
        cfg_m, conf_m = _config(tmp_path, output_dir=out,
                                mesh={"shape": shape})
        main([cfg_m])
        mX = read_trajectory(os.path.join(out, "trajectory.rblt"))[2]
        np.testing.assert_allclose(mX, refX, atol=1e-8,
                                   err_msg=f"mesh shape {shape}")


def test_mesh_too_many_devices_rejected(tmp_path):
    cfg_path, _ = _config(tmp_path, mesh={"shape": [64]})
    with pytest.raises(ValueError, match="64 devices"):
        main([cfg_path])


@pytest.mark.medium
def test_mesh_distributed_run_matches_single_device(tmp_path):
    """mesh mode 'distributed' routes the production driver through the
    fully-sharded stepper (ring sweep, sharded Krylov state); the kBT=0
    trajectory must match the single-device run exactly (the stochastic
    path folds keys per device, so only the deterministic limit is
    bit-comparable)."""
    kw = dict(n_bodies=8, kBT=0.0)
    cfg_ref, conf_ref = _config(tmp_path, output_dir=str(tmp_path / "dref"),
                                **kw)
    main([cfg_ref])
    refX = read_trajectory(
        os.path.join(conf_ref["output_dir"], "trajectory.rblt"))[2]

    out = str(tmp_path / "dist")
    cfg_d, _ = _config(tmp_path, output_dir=out,
                       mesh={"shape": [8], "mode": "distributed"}, **kw)
    main([cfg_d])
    dX = read_trajectory(os.path.join(out, "trajectory.rblt"))[2]
    np.testing.assert_allclose(dX, refX, atol=1e-10)


def test_mesh_distributed_mode_validation(tmp_path):
    cfg_path, _ = _config(tmp_path, mesh={"shape": [2, 4],
                                          "mode": "distributed"})
    with pytest.raises(ValueError, match="1-D"):
        main([cfg_path])
    cfg_path, _ = _config(tmp_path, mesh={"shape": [8], "mode": "ring"})
    with pytest.raises(ValueError, match="gather"):
        main([cfg_path])
