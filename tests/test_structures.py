import numpy as np
import pytest

from rigid_body_light_tpu import structures


@pytest.mark.parametrize("n", structures.SHELLS)
def test_shells_load(n):
    params, cfg = structures.shell(n)
    assert params["N"] == n
    assert cfg.shape == (n, 3)
    assert params["Rh"] == 1
    # geometric radius matches the header
    rad = np.linalg.norm(cfg, axis=1)
    assert np.allclose(rad.mean(), params["Rg"], atol=2e-4)
    # all blobs on a sphere
    assert rad.std() < 1e-6
    # minimal blob spacing matches the header sep
    d = np.linalg.norm(cfg[:, None] - cfg[None, :], axis=-1)
    d[np.arange(n), np.arange(n)] = np.inf
    assert np.isclose(d.min(), params["sep"], rtol=1e-6)


def test_load_by_name_and_path():
    p1, c1 = structures.load_structure("shell_N_12")
    p2, c2 = structures.load_structure(structures.structure_path("shell_N_12.csv"))
    assert p1 == p2
    assert np.array_equal(c1, c2)
