"""Neighbor-tile Pallas near sweep (``rpy_pallas.near_sweep``) — parity
with the XLA ``farfield._near_sweep`` in interpreter mode (CPU), across
all four operator modes.  On chip the compiled kernel is validated by
``scripts/tpu_ffwall_profile.py`` and exercised by the far-field bench.

Pad rows are excluded from the comparison: both sweeps produce
(different) garbage there by design — every caller discards them
(``[:, :n]`` in sorted order before the scatter back to blob order).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rigid_body_light_tpu.ops import farfield, rpy_pallas


@pytest.mark.parametrize("case", ["open", "wall", "poly", "pseudo2d"])
def test_near_sweep_kernel_parity(case):
    rng = np.random.default_rng(3)
    n = 700
    if case == "pseudo2d":
        box = (20.0, 20.0)
        r = np.stack([rng.uniform(0, 20, n), rng.uniform(0, 20, n),
                      rng.uniform(1.0, 4.0, n)], 1)
        kw = dict(wall=True, grid=(5, 5, 2), p=4, box=box, image_shells=2)
    else:
        r = rng.uniform(0, 14, (n, 3)) + [0, 0, 1.0]
        kw = dict(wall=case in ("wall", "poly"), grid=(3, 3, 2), p=3)
    radii = (jnp.asarray(rng.uniform(0.7, 1.3, n), jnp.float32)
             if case == "poly" else None)
    F = jnp.asarray(rng.standard_normal((2, n, 3)), jnp.float32)
    rj = jnp.asarray(r, jnp.float32)
    ctx = farfield.prepare(rj, radii=radii, **kw)
    t = ctx.nbr.shape[0]
    pad = t * farfield.TILE - n
    F_s = jnp.concatenate(
        [F[:, ctx.order], jnp.zeros((2, pad, 3), jnp.float32)], 1)
    grid = kw["grid"]
    box_n = kw.get("box")
    wrap = (grid[0], grid[1]) if box_n else None
    U_ref = farfield._near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s, F_s,
                                 ctx.ah_s, ctx.nbr, ctx.nbr.shape[1],
                                 kw["wall"], 0.75, 0, t, box_n=box_n,
                                 wrap_xy=wrap)
    U = rpy_pallas.near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s >= 0, F_s,
                              ctx.nbr, kw["wall"], 0.75,
                              box_over_a=box_n, wrap_cells=wrap,
                              ahat_s=ctx.ah_s, interpret=True)
    live = np.asarray(ctx.id_s) >= 0
    U_ref = np.asarray(U_ref)[:, live]
    U = np.asarray(U)[:, live]
    err = float(np.abs(U - U_ref).max()) / float(np.abs(U_ref).max())
    assert err < 1e-5, (case, err)


def test_near_sweep_tile_slice_parity():
    """The distributed path sweeps a device-local tile slice [t0, t0+nt):
    slice outputs must match the corresponding rows of the full sweep
    (traced t0, like the in-shard_map lax.axis_index-derived offset)."""
    import jax

    rng = np.random.default_rng(11)
    n = 900
    r = rng.uniform(0, 16, (n, 3)) + [0, 0, 1.0]
    kw = dict(wall=True, grid=(3, 3, 2), p=3)
    F = jnp.asarray(rng.standard_normal((1, n, 3)), jnp.float32)
    rj = jnp.asarray(r, jnp.float32)
    ctx = farfield.prepare(rj, **kw)
    t = ctx.nbr.shape[0]
    pad = t * farfield.TILE - n
    F_s = jnp.concatenate(
        [F[:, ctx.order], jnp.zeros((1, pad, 3), jnp.float32)], 1)
    full = rpy_pallas.near_sweep(ctx.x_s, ctx.ci_s, ctx.id_s >= 0, F_s,
                                 ctx.nbr, True, 0.75, interpret=True)
    nt = 2
    for t0 in range(0, t - nt + 1, nt):
        t0_traced = jnp.asarray(t0, jnp.int32) * 1  # keep it traced-like
        part = jax.jit(
            lambda t0v: rpy_pallas.near_sweep(
                ctx.x_s, ctx.ci_s, ctx.id_s >= 0, F_s, ctx.nbr, True,
                0.75, t0=t0v, nt=nt, interpret=True))(t0_traced)
        ref = np.asarray(full)[:, t0 * 128:(t0 + nt) * 128]
        np.testing.assert_allclose(np.asarray(part), ref, atol=1e-6)
