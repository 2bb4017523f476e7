"""Blob-geometry structure files.

Icosphere shells discretizing a unit sphere, shipped as CSV exactly as the
reference does (``structures/shell_N_{12,42,162,642,2562}.csv``).  Format
(reference parser ``tests/utils.py:9-19``):

    # sep,N,rg,rh
    # <sep> <extra>,<N>,<Rg>,<Rh>
    x y z            (N rows, space separated)

``sep`` is the blob spacing, ``N`` the blob count, ``Rg`` the geometric
radius and ``Rh`` the hydrodynamic radius (1.0 for all shipped shells).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

_STRUCT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "structures")

SHELLS = (12, 42, 162, 642, 2562)


def structure_path(name: str) -> str:
    """Path to a shipped structure file, e.g. ``structure_path('shell_N_12')``."""
    if not name.endswith(".csv"):
        name = name + ".csv"
    return os.path.join(_STRUCT_DIR, name)


def load_structure(file_name: str) -> Tuple[Dict, np.ndarray]:
    """Parse a structure CSV → (params, (N,3) reference config).

    Matches the reference parser (``tests/utils.py:9-19``): two comment
    lines, the second carrying ``sep,N,Rg,Rh`` after a leading ``# ``, then
    whitespace-separated xyz rows.
    """
    if os.sep not in file_name and not os.path.exists(file_name):
        file_name = structure_path(file_name)
    with open(file_name, "r") as f:
        _ = f.readline()
        params_line = f.readline().strip().split(",")
        sep = float(params_line[0].split(" ")[1])
        n = int(params_line[1])
        rg = float(params_line[2])
        rh = float(params_line[3])
        cfg = np.loadtxt(f, delimiter=" ")
    params = {"sep": sep, "N": n, "Rg": rg, "Rh": rh}
    if cfg.shape != (n, 3):
        raise RuntimeError(
            f"Structure file {file_name} declares N={n} blobs but has shape {cfg.shape}"
        )
    return params, cfg


def shell(n_blobs: int) -> Tuple[Dict, np.ndarray]:
    """Load one of the shipped icosphere shells by blob count."""
    if n_blobs not in SHELLS:
        raise ValueError(f"No shipped shell with {n_blobs} blobs; have {SHELLS}")
    return load_structure(structure_path(f"shell_N_{n_blobs}"))
