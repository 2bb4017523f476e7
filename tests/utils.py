"""Test fixtures mirroring the reference's ``tests/utils.py``."""

import numpy as np

from rigid_body_light_tpu import RigidBody, load_structure, structure_path

struct_shell_12 = structure_path("shell_N_12")


def load_config(file_name):
    params, cfg = load_structure(file_name)
    return params, cfg


def create_solver(X, Q, rigid_config=None, wall_PC=False, block_PC=False, **kw):
    if rigid_config is None:
        _, rigid_config = load_config(struct_shell_12)
    return RigidBody(
        rigid_config,
        X,
        Q,
        a=1.0,
        eta=1.0,
        dt=1.0,
        wall_PC=wall_PC,
        block_PC=block_PC,
        **kw,
    )


def create_random_positions(N, wall_PC=False, seed=None):
    rng = np.random.default_rng(seed)
    n_placed = 0
    X = np.zeros((N, 3))
    while n_placed < N:
        lower_limit = 1.0 if wall_PC else -10.0
        x_i = rng.uniform(lower_limit, 10.0, (N, 3))
        dists = np.linalg.norm(X[:n_placed, :] - x_i[n_placed, :], axis=1)
        if np.all(dists > 2.0):
            X[n_placed, :] = x_i[n_placed, :]
            n_placed += 1
    Q = rng.standard_normal((N, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    return X, Q
