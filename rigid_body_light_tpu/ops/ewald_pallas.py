"""Pallas TPU kernel for the Ewald real-space pair sweep.

Same contract as :func:`rigid_body_light_tpu.ops.ewald.real_space_apply`
(monodisperse float32 path): U_real = Σ_{j≠i} [A(r)·I + B(r)·r̂r̂]·F_j with
3-D minimum image, A/B evaluated from the host-fitted piecewise-Chebyshev
representation (``EwaldParams.cheb_*``).  Hand-tiled like the RPY symmetric
kernel (``ops/rpy_pallas.py``): one packed VMEM-resident operand, grid over
row tiles, inner ``fori_loop`` over strict-upper column tiles, coefficient
fields computed ONCE per unordered pair and applied forward + transposed —
the Clenshaw chains dominate the sweep, so symmetry is worth ~1.9× here
(vs ~1.4× for the cheaper RPY fields).

The Chebyshev coefficients are baked into the kernel as python-float
constants (static args): the unrolled Clenshaw is a pure FMA chain with
3-way selects on broadcast scalars — no table, no gather (an 8k-entry
gather variant reproducibly kernel-faulted the axon TPU runtime).

Polydisperse periodic sweeps stay on the XLA path (masked per-species-pair
Clenshaw; rare enough not to justify a kernel yet).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import is safe everywhere; compilation is TPU-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TR = 128
TC = 512
_R2_FLOOR = 1e-24


def available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


def _cheb_ab_tiles(r, bounds, coefA, coefB):
    """In-kernel piecewise Clenshaw on a (TR, TC) distance tile.

    bounds/coefA/coefB are python tuples (static) — every coefficient is a
    compile-time scalar, so each unrolled step is FMA + two scalar selects.
    """
    b0, b1, b2, b3 = bounds
    in1 = r >= b1
    in2 = r >= b2
    lo = jnp.where(in2, b2, jnp.where(in1, b1, b0))
    inv_w = jnp.where(in2, 1.0 / (b3 - b2),
                      jnp.where(in1, 1.0 / (b2 - b1), 1.0 / (b1 - b0)))
    x = jnp.clip(2.0 * (r - lo) * inv_w - 1.0, -1.0, 1.0)
    two_x = 2.0 * x

    def clenshaw(coef):
        bk1 = jnp.zeros_like(x)
        bk2 = jnp.zeros_like(x)
        for j in range(len(coef[0]) - 1, 0, -1):
            cj = jnp.where(in2, coef[2][j],
                           jnp.where(in1, coef[1][j], coef[0][j]))
            bk1, bk2 = cj + two_x * bk1 - bk2, bk1
        c0 = jnp.where(in2, coef[2][0], jnp.where(in1, coef[1][0],
                                                  coef[0][0]))
        return c0 + x * bk1 - bk2

    return clenshaw(coefA), clenshaw(coefB)


def _kernel_ewald_sym(P_ref, out_ref, *, n_pad: int, nrhs: int,
                      box_x: float, box_y: float, box_z: float,
                      bounds, coefA, coefB):
    """Symmetric unordered-pair Ewald real-space sweep (see module doc)."""
    i = pl.program_id(0)
    row_start = i * TR

    xR = P_ref[0, pl.ds(row_start, TR)].reshape(TR, 1)
    yR = P_ref[1, pl.ds(row_start, TR)].reshape(TR, 1)
    zR = P_ref[2, pl.ds(row_start, TR)].reshape(TR, 1)
    row_ids = row_start + jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0)
    FR = [
        P_ref[3 + 3 * k + c, pl.ds(row_start, TR)].reshape(TR, 1)
        for k in range(nrhs) for c in range(3)
    ]

    @pl.when(i == 0)
    def _zero():
        out_ref[...] = jnp.zeros((8, n_pad), jnp.float32)

    n_col_tiles = n_pad // TC
    j_start = row_start // TC

    def col_tile(j, acc):
        c0 = j * TC
        xC = P_ref[0, pl.ds(c0, TC)].reshape(1, TC)
        yC = P_ref[1, pl.ds(c0, TC)].reshape(1, TC)
        zC = P_ref[2, pl.ds(c0, TC)].reshape(1, TC)
        col_ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
        upper = col_ids > row_ids

        dx = xR - xC
        dy = yR - yC
        dz = zR - zC
        dx = dx - box_x * jnp.round(dx * (1.0 / box_x))
        dy = dy - box_y * jnp.round(dy * (1.0 / box_y))
        dz = dz - box_z * jnp.round(dz * (1.0 / box_z))
        r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)
        invr = jax.lax.rsqrt(r2)
        r = r2 * invr
        A, B = _cheb_ab_tiles(r, bounds, coefA, coefB)
        # fold r̂r̂ normalization into B so the apply uses raw d
        Bh = B * invr * invr
        A = jnp.where(upper, A, 0.0)
        Bh = jnp.where(upper, Bh, 0.0)

        new_acc = []
        for k in range(nrhs):
            ux, uy, uz = acc[3 * k], acc[3 * k + 1], acc[3 * k + 2]
            fx = P_ref[3 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
            fy = P_ref[4 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)
            fz = P_ref[5 + 3 * k, pl.ds(c0, TC)].reshape(1, TC)

            dF = dx * fx + dy * fy + dz * fz
            bdF = Bh * dF
            cx = A * fx + bdF * dx
            cy = A * fy + bdF * dy
            cz = A * fz + bdF * dz
            new_acc.extend([
                ux + jnp.sum(cx, axis=1, keepdims=True),
                uy + jnp.sum(cy, axis=1, keepdims=True),
                uz + jnp.sum(cz, axis=1, keepdims=True),
            ])

            fxR, fyR, fzR = FR[3 * k], FR[3 * k + 1], FR[3 * k + 2]
            dFr = dx * fxR + dy * fyR + dz * fzR
            bdFr = Bh * dFr
            tx = A * fxR + bdFr * dx
            ty = A * fyR + bdFr * dy
            tz = A * fzR + bdFr * dz
            out_ref[3 * k + 0, pl.ds(c0, TC)] += jnp.sum(tx, axis=0)
            out_ref[3 * k + 1, pl.ds(c0, TC)] += jnp.sum(ty, axis=0)
            out_ref[3 * k + 2, pl.ds(c0, TC)] += jnp.sum(tz, axis=0)
        return tuple(new_acc)

    zero = jnp.zeros((TR, 1), jnp.float32)
    acc = jax.lax.fori_loop(j_start, n_col_tiles, col_tile,
                            (zero,) * (3 * nrhs))
    for k in range(nrhs):
        for c in range(3):
            out_ref[3 * k + c, pl.ds(row_start, TR)] += (
                acc[3 * k + c].reshape(1, TR)[0]
            )


@functools.partial(
    jax.jit, static_argnames=("n_pad", "nrhs", "interpret", "box_x", "box_y",
                              "box_z", "bounds", "coefA", "coefB")
)
def _sweep(P, n_pad: int, nrhs: int, box_x: float, box_y: float,
           box_z: float, bounds, coefA, coefB, interpret: bool = False):
    n_row_tiles = n_pad // TR
    deg = len(coefA[0]) - 1
    kernel = functools.partial(
        _kernel_ewald_sym, n_pad=n_pad, nrhs=nrhs, box_x=box_x, box_y=box_y,
        box_z=box_z, bounds=bounds, coefA=coefA, coefB=coefB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_row_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * (6 * deg + 12 * nrhs) // 2,
            bytes_accessed=8 * n_pad * 4 * n_row_tiles,
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(P)


def _as_tuples(arr):
    return tuple(tuple(float(v) for v in row) for row in arr)


def real_pair_sum(Fs, r, params, interpret: bool = False):
    """Σ_{j≠i} [A·I + B·r̂r̂]·F_j via the Pallas kernel.

    Fs: (k, N, 3) with k ∈ {1, 2}; r: (N, 3) physical positions.
    Monodisperse f32 only — the caller guards.  Returns (k, N, 3) f32.
    No VJP rule: differentiable periodic runs use the XLA Ewald path
    (``cfg.use_pallas=False``), as with the open-domain kernels.
    """
    k, n, _ = Fs.shape
    n_pad = TC * (-(-n // TC))
    used = 3 + 3 * k
    rows = 8 * (-(-used // 8))
    P = jnp.zeros((rows, n_pad), jnp.float32)
    P = P.at[0:3, :n].set(jnp.asarray(r, jnp.float32).T)
    for i in range(k):
        P = P.at[3 + 3 * i: 6 + 3 * i, :n].set(
            jnp.asarray(Fs[i], jnp.float32).T)
    out = _sweep(
        P, n_pad=n_pad, nrhs=k,
        box_x=float(params.box[0]), box_y=float(params.box[1]),
        box_z=float(params.box[2]),
        bounds=tuple(float(b) for b in params.cheb_bounds),
        coefA=_as_tuples(params.cheb_A), coefB=_as_tuples(params.cheb_B),
        interpret=interpret,
    )
    return jnp.stack([out[3 * i: 3 * i + 3, :n].T for i in range(k)])


def mobility_apply(F, r, params, interpret: bool = False):
    """Full periodic product U = M_per·F with the real sweep on the kernel.

    Same contract as :func:`rigid_body_light_tpu.ops.ewald.mobility_apply`
    (monodisperse f32): kernel real-space pairs + closed-form self term +
    MXU wave part.
    """
    from rigid_body_light_tpu.ops import ewald

    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    F = jnp.asarray(F, jnp.float32).reshape(-1, 3)
    a = jnp.float32(params.a)
    U = real_pair_sum(F[None], r, params, interpret=interpret)[0]
    U = U + ewald.self_coeff(a, jnp.float32(params.xi),
                             jnp.float32(params.eta)) * F
    return U + ewald.wave_space_apply(F, r, params)


def mobility_apply_multi(Fs, r, params, interpret: bool = False):
    """Multi-RHS periodic product (k, N, 3) → (k, N, 3), shared pair fields."""
    from rigid_body_light_tpu.ops import ewald

    r = jnp.asarray(r, jnp.float32).reshape(-1, 3)
    Fs = jnp.asarray(Fs, jnp.float32)
    a = jnp.float32(params.a)
    U = real_pair_sum(Fs, r, params, interpret=interpret)
    U = U + ewald.self_coeff(a, jnp.float32(params.xi),
                             jnp.float32(params.eta)) * Fs
    return U + ewald.wave_space_apply(Fs, r, params)
