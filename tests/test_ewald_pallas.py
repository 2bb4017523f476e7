"""Ewald real-space Pallas kernel parity — interpreter mode on CPU.

The compiled kernel is exercised on TPU by ``scripts/tpu_ewald_bench.py``;
here we pin the kernel logic (tiling, symmetry, 3-D wrap, in-kernel
Clenshaw) against the XLA streamed sweep it replaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.ops import ewald, ewald_pallas


@pytest.fixture(scope="module")
def setup():
    box = (9.0, 11.0, 10.0)
    params = ewald.make_params(box, 0.45)
    rng = np.random.default_rng(11)
    n = 700  # not a multiple of the 512-column tile: covers padding
    r = jnp.asarray(rng.uniform(0, 9, (n, 3)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float32)
    return params, r, F


@pytest.mark.parametrize("nrhs", [1, 2])
def test_real_pair_sum_matches_xla(setup, nrhs):
    params, r, F = setup
    Uref = ewald.real_space_apply(F[:nrhs] if nrhs == 2 else F[0], r, params)
    U = ewald_pallas.real_pair_sum(F[:nrhs], r, params, interpret=True)
    if nrhs == 1:
        Uref = Uref[None]
    scale = float(jnp.abs(Uref).max())
    assert float(jnp.abs(U - Uref).max()) / scale < 5e-6


def test_mobility_apply_matches_xla(setup):
    params, r, F = setup
    Uref = ewald.mobility_apply(F[0], r, params)
    U = ewald_pallas.mobility_apply(F[0], r, params, interpret=True)
    scale = float(jnp.abs(Uref).max())
    assert float(jnp.abs(U - Uref).max()) / scale < 5e-6


def test_mobility_apply_multi_matches_xla(setup):
    params, r, F = setup
    Uref = ewald.mobility_apply_multi(F, r, params)
    U = ewald_pallas.mobility_apply_multi(F, r, params, interpret=True)
    scale = float(jnp.abs(Uref).max())
    assert float(jnp.abs(U - Uref).max()) / scale < 5e-6
