"""Shared helpers for the API-contract tests.

These provide the canonical setup the reference's suite builds its contract
on — a unit-parameter solver (a = eta = dt = 1) over the 12-blob icosphere
and random, well-separated body placements — with our own implementation
(seeded RNG, vectorized dart-throwing).  The reference's ``tests/utils.py``
is the behavioral spec, not the source.
"""

import numpy as np

from rigid_body_light_tpu import RigidBody, load_structure, structure_path

#: canonical geometry for the contract tests
struct_shell_12 = structure_path("shell_N_12")

#: bodies in random placements never approach closer than this
MIN_CENTER_DISTANCE = 2.0


def load_config(file_name):
    """(params dict, (n, 3) blob config) for a structure CSV."""
    return load_structure(file_name)


def create_solver(X, Q, rigid_config=None, wall_PC=False, block_PC=False, **kw):
    """Unit-parameter ``RigidBody`` on the 12-blob shell (or a given one)."""
    if rigid_config is None:
        rigid_config = load_config(struct_shell_12)[1]
    return RigidBody(
        rigid_config, X, Q, 1.0, 1.0, 1.0,
        wall_PC=wall_PC, block_PC=block_PC, **kw,
    )


def create_random_positions(N, wall_PC=False, seed=None):
    """N body centers ≥ ``MIN_CENTER_DISTANCE`` apart plus N random unit
    quaternions.  With ``wall_PC`` every coordinate is ≥ 1 (bodies clear of
    the wall); otherwise centers land in [-10, 10]³.

    Dart-throwing: draw candidate batches, greedily accept each candidate
    that clears every already-accepted center.
    """
    rng = np.random.default_rng(seed)
    low = 1.0 if wall_PC else -10.0
    accepted: list[np.ndarray] = []
    while len(accepted) < N:
        for cand in rng.uniform(low, 10.0, (max(4 * N, 16), 3)):
            if len(accepted) == N:
                break
            if accepted:
                gaps = np.linalg.norm(np.asarray(accepted) - cand, axis=1)
                if gaps.min() <= MIN_CENTER_DISTANCE:
                    continue
            accepted.append(cand)
    quats = rng.standard_normal((N, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return np.asarray(accepted), quats
