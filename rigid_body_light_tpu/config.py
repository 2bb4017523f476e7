"""Simulation configuration.

The reference scatters its knobs across constructor args, two booleans and
hard-coded internals (``split_rand=true`` at ``c_rigid_obj.cpp:150``, RFD
deltas at ``:745,820,844``, ``kbt=1.0`` at ``Rigid.py:23``).  Here they are a
single frozen dataclass so a config can be closed over by ``jax.jit`` without
retracing on value changes that are static (flags) vs dynamic (physics
scalars are carried in arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """Static (trace-time) configuration of a rigid multiblob system.

    Attributes:
      a: blob hydrodynamic radius (reference ``setParameters``,
        ``c_rigid_obj.cpp:183``).
      eta: fluid viscosity.
      dt: timestep.
      kBT: thermal energy; 0 disables Brownian terms (reference hardcodes 1.0
        at ``Rigid.py:23`` — exposed properly here).
      wall: apply the Swan–Brady single-wall correction at z=0 everywhere
        (mobility, preconditioner, noise).  Reference flag ``PC_wall``
        (``c_rigid_obj.cpp:147``).
      block_diag_pc: use the per-body block-diagonal approximate inverse
        mobility in the preconditioner instead of the per-blob diagonal one.
        Reference flag ``block_diag_PC`` (``c_rigid_obj.cpp:148``).
      split_rand: use the split random increment in the midpoint scheme
        (reference ``split_rand=true``, ``c_rigid_obj.cpp:150``).
      rfd_delta: random-finite-difference displacement (reference
        ``delta=1e-4``, ``c_rigid_obj.cpp:745,771``).
      dtype: compute dtype.  Runtime choice, not a build flag (reference
        bakes precision in at compile time, ``eigen_defines.h:17-37``).
      m_scale: mobility scaling in the preconditioner output (reference
        ``M_scale=1.0``, ``c_rigid_obj.cpp:194``).
      lanczos_iters: fixed Lanczos iteration count for M^{1/2}·W.
      gmres_tol / gmres_maxiter / gmres_restart: Krylov solve controls.
      matvec_row_tile: row-tile size for the matrix-free streamed mobility
        matvec (memory/perf knob; never materializes the 3N×3N matrix).
      use_pallas: use the Pallas TPU kernel for the mobility matvec when
        available (falls back to the XLA path off-TPU).
    """

    a: float = 1.0
    eta: float = 1.0
    dt: float = 1.0
    kBT: float = 0.0
    wall: bool = False
    box: Any = None  # None (open domain); (Lx, Ly): pseudo-periodic in the plane via minimum-image wrapping (z open — the wall geometry; not guaranteed SPD at high density); or (Lx, Ly, Lz): TRUE triply-periodic RPY via positively-split Ewald (ops/ewald.py) — exact periodic operator, SPD for every splitting, validated against Hasimoto's lattice constants.  3-D boxes require wall=False; per-blob radii are supported exactly (species-pair real-space fits + sinc(kaᵢ)sinc(kaⱼ) wave symbol) on every splitting, incl. balanced (ewald_rc) and gridded (ewald_grid_p).  Trajectories keep unwrapped coordinates; only pair interactions see the wrap.
    image_shells: int = 0  # 2-D boxes only: 0 = minimum-image wrapping (the classic pseudo-periodic approximation); S ≥ 1 = exact doubly-periodic operator truncated at the (2S+1)² nearest in-plane lattice images (ops/rpy.image_offsets).  The wall-corrected pair mobility decays like 1/ρ³, so the sum converges absolutely with an O(1/S) tail (measured in tests/test_pseudo2d.py).  Cost ≈ (2S+1)² × the pair sweep — on every backend: the Pallas kernels carry the offset lattice in-kernel, and the distributed ring/gather/SUMMA sweeps sum it per slab (round 5).  With farfield_grid, sets the kernel-lattice image depth instead (two-ring tail extrapolation; ~2e-4 lattice accuracy at S=6).
    ewald_xi: float = 0.0  # Ewald splitting parameter for 3-D boxes; 0 = auto (real-space error ~ewald_tol at min(L)/2, so the real sweep needs no image loop)
    ewald_tol: float = 1.0e-6  # truncation tolerance of both Ewald parts (sets xi and kmax)
    ewald_rc: float = 0.0  # balanced splitting: real-space cutoff (2a < rc < min(L)/2).  Shifts cost from the O(N²) real sweep to MXU wave matmuls and runs the real part over a sorted-tile neighbor structure at O(N·ρ·rc³) — the at-scale periodic mode (ops/ewald_cells.py).  0 = off (classic min(L)/2 split).  Polydisperse supported (species-pair Chebyshev scalars in the tile sweep); incompatible with ewald_xi.
    ewald_nbr_tiles: int = 0  # balanced splitting: static neighbor-list width (tiles of 128 sorted blobs per row tile).  0 = auto (4× the uniform-density estimate + 8).  Overflow NaN-poisons the step (caught by the stepper's rejection guards) — raise for extreme density contrast.
    ewald_grid_p: int = 0  # gridded (PME-style) wave part for the balanced split (ops/ewald_pme.py): 0 = dense O(N·K) k-sum; p ≥ 2 = evaluate the SAME k-sum on p³ Chebyshev nodes per cell of an oversampled FFT grid at O(N·p³ + G³·p³·log G) — with ewald_rc this makes the whole periodic operator O(N·ρ·rc³ + G³·p³·log G), the at-scale periodic mode.  Exactly symmetric PSD (P2M/L2P share one basis); measured wave-part accuracy p=4 ≈ 3e-5, p=6 ≈ 1e-8 relative (tests/test_ewald_pme.py).  Requires ewald_rc > 0 (with the classic min(L)/2 split K is already small); polydisperse via species-split spread/interp grids (S FFT fields for S distinct radii); single-device.
    farfield_grid: Any = None  # proxy-grid far field for open/wall domains (ops/farfield.py): None = off (exact O(N²) sweeps); "auto" = near-cubic grid of ~tile-sized cells; int or (Gx, Gy, Gz) = explicit supercell counts (pass anisotropic counts for flat sedimented slabs).  Splits M into exact near pairs (adjacent cells) + Chebyshev-interpolated far field evaluated as FFT convolutions on the MXU — O(N) at fixed density instead of O(N²).  The operator is approximate (farfield_p controls accuracy) but symmetric to roundoff; polydisperse supported via radius-split kernel lattices.  With a 2-D (Lx, Ly) box + wall=True this becomes the PSEUDO-2D doubly-periodic far field: cyclic xy convolution with image-summed combined (free+wall) kernel lattices — exact in-plane periodicity at O(N) per apply, image depth = image_shells (must be ≥ 1; tail-extrapolated).  Polydisperse supported (four radius-split image lattices); works single-device AND distributed (replicated lattice build + seam-wrapped sharded near sweep).
    farfield_p: int = 4  # Chebyshev nodes per dim for the far field: 4 ≈ 5e-3 relative operator error, 6 ≈ 3e-4 (measured, tests/test_farfield.py)
    farfield_band_p: int = 0  # two-tier mixed-order far field (round 5): 0 = off; ≥ 3 adds a high-order BAND tier — cell offsets with ∞-norm in [2, 3] evaluated at band_p as a direct banded block convolution (a few hundred MXU matmuls, storage ∝ the 316-offset band only, no p⁶ spectrum) while the FFT tier is masked to offsets ≥ 4 where low farfield_p is already accurate (measured interpolation error by offset: p=4 → 6e-3 at 2, 2.3e-4 at ≥4; band_p=6 at 2 → 1.7e-4).  band_p=6 over farfield_p=4 ≈ p=6-class operator error at p=4 lattice cost.  Open/wall domains; does not compose with the pseudo-2D 2-D-box far field.
    farfield_nbr_tiles: int = 0  # static neighbor-tile list width for the near sweep; 0 = auto (overflow NaN-poisons the step, caught by the stepper's rejection guards — raise for extreme density contrast)
    block_diag_pc: bool = False
    pc_mode: str = ""  # "", "diag", "block", "block_free", "ras" — "" derives from block_diag_pc.  "ras" = block_free static core + per-solve restricted-additive-Schwarz halo coupling (ops/saddle.build_pc_ras): the dense-settled-suspension PC — captures inter-body near-contact coupling via per-body overlapping clusters solved exactly (Woodbury around the static core), with a consistent coupled (6B)² body matrix.  Works single-device AND distributed (gathered-halo Woodbury clusters + replicated coupled Ñ, round 5); mixtures too (multi.build_pc_ras_multi — polydisperse cross-species halos, single-device; distributed mixtures keep the static per-species PC); dispersed suspensions see block_free behavior (empty halos reduce to it exactly).
    pc_halo: float = 4.0  # "ras": halo cutoff — other-body blobs within this many radii of a body's nearest blob join its cluster
    pc_halo_max: int = 64  # "ras": fixed cluster-halo width H (top-H closest within pc_halo; more near blobs than H degrades the PC gracefully, never correctness).  0 disables the coupling (pure block_free).
    pc_refresh: int = 1  # rebuild the preconditioner every k steps in run_bd (k>1 = lagged PC)
    split_rand: bool = True
    drift_mode: str = "midpoint_slip"  # or "em_exact" — see dynamics/stepper.py
    reject_below_wall: bool = True  # reject per-body moves that sink blobs below z=0 (wall runs only)
    max_step_residual: float = 1e-2  # steps whose solve residual exceeds this are rejected (no move)
    max_move: float = 5.0  # reject per-body moves whose translation exceeds max_move*a per step (<=0 disables)
    max_rotation: float = 0.5  # reject per-body moves rotating more than this many radians per step
    rfd_delta: float = 1.0e-4
    dtype: Any = jnp.float32
    m_scale: float = 1.0
    lanczos_iters: int = 30
    lanczos_max_iters: int = 0  # adaptive noise accuracy: with lanczos_err_tol > 0, keep iterating past lanczos_iters (up to this cap) while the per-step truncation estimate exceeds the tolerance.  0 disables (fixed lanczos_iters).
    lanczos_err_tol: float = 0.0  # target relative truncation error of M^{1/2}W for the adaptive mode; the estimate itself is always surfaced per step as StepAux.noise_err
    lanczos_precond: bool = True  # factor-preconditioned M^{1/2}W: body-frame free-space factor drops cond(G) ~30x, so ~10 iterations replace ~30.  Round-1's equilibrium bias at large ensembles is root-caused and fixed (wall_h_floor indefiniteness + TPU bf16 matmuls — VALIDATION.md); the failing 64-walker workload now passes (bias -0.013 ± 0.023).
    gmres_tol: float = 1.0e-6
    gmres_maxiter: int = 200
    gmres_restart: int = 40
    matvec_row_tile: int = 512
    use_pallas: bool = True
    wall_h_floor: float = 0.75  # evaluate the Swan–Brady wall correction at blob heights floored to this many radii.  The raw correction's image terms diverge as h⁻⁵ — faster than the B² damping decays — so the reference's formulas give an INDEFINITE mobility for blobs below ~0.6a (measured min-eig −2.3e3 at h=0.02a), which breaks M^{1/2} noise sampling and BD well-posedness near the wall.  0.75 restores positive-definiteness on every tested configuration; exact physics is unchanged for all blobs above 0.75a.  Set 0 for the reference's exact (ill-posed) formulas.
    validate_config: bool = True  # RigidBody API: check blob overlap on set_config/apply_M (O(N²) pairwise sweep + host sync — disable for very large N or latency-critical callers; the jitted device paths never run it)

    def __post_init__(self):
        if self.box is not None:
            box = tuple(float(b) for b in self.box)
            if len(box) not in (2, 3) or any(b <= 0 for b in box):
                raise ValueError(
                    f"box must be None, a positive (Lx, Ly) pair or a "
                    f"positive (Lx, Ly, Lz) triple, got {self.box!r}"
                )
            if len(box) == 3 and self.wall:
                raise ValueError(
                    "a 3-D (triply periodic Ewald) box is incompatible with "
                    "wall=True — use a 2-D (Lx, Ly) box for wall-bounded "
                    "pseudo-periodicity"
                )
            # normalized tuple keeps the frozen dataclass hashable/jit-static
            object.__setattr__(self, "box", box)
        if self.image_shells:
            if self.image_shells < 0:
                raise ValueError(
                    f"image_shells must be ≥ 0, got {self.image_shells}"
                )
            if self.box is None or len(self.box) != 2:
                raise ValueError(
                    "image_shells needs a 2-D (Lx, Ly) box — the exact "
                    "image sum is the doubly-periodic (pseudo-2D) geometry"
                )
        if 0 < self.lanczos_max_iters <= self.lanczos_iters:
            raise ValueError(
                f"lanczos_max_iters={self.lanczos_max_iters} ≤ "
                f"lanczos_iters={self.lanczos_iters}: the adaptive noise "
                f"mode would silently never engage (it extends PAST "
                f"lanczos_iters up to the cap) — raise the cap or drop it"
            )
        if self.farfield_grid is not None:
            if self.box is not None and len(self.box) == 3:
                raise ValueError(
                    "farfield_grid needs an open or 2-D-periodic domain — "
                    "3-D boxes already have the Ewald wave-space far field"
                )
            if self.box is not None and not self.wall:
                raise ValueError(
                    "farfield_grid with a 2-D (Lx, Ly) box is the pseudo-2D "
                    "doubly-periodic WALL mode — needs wall=True (the free-"
                    "space Stokeslet's in-plane lattice sum diverges)"
                )
            if self.box is not None and self.image_shells < 1:
                raise ValueError(
                    "the pseudo-2D far field (farfield_grid + 2-D box) "
                    "needs image_shells ≥ 1: its cyclic kernel lattice "
                    "picks one signed representative per cell offset, so "
                    "without an image sum seam pairs are evaluated at the "
                    "wrong-side image — set image_shells (6 ≈ 1e-4 with "
                    "tail extrapolation) or farfield_grid=None for the "
                    "minimum-image sweep"
                )
            g = self.farfield_grid
            if isinstance(g, str):
                if g != "auto":
                    raise ValueError(
                        f"farfield_grid must be None, 'auto', an int or a "
                        f"(Gx, Gy, Gz) triple, got {g!r}"
                    )
            elif not isinstance(g, int):
                g = tuple(int(v) for v in g)
                if len(g) != 3 or any(v < 2 for v in g):
                    raise ValueError(
                        f"farfield_grid triple must be 3 counts ≥ 2, got "
                        f"{self.farfield_grid!r}"
                    )
                # normalized tuple keeps the dataclass hashable/jit-static
                object.__setattr__(self, "farfield_grid", g)
            # The proxy-grid operator is APPROXIMATE: a Krylov solve running
            # on it converges to the p-accurate operator's solution, so a
            # gmres_tol below the operator error reports residuals the
            # physics can't honor.  Measured operator error (BENCH_NOTES,
            # monodisperse wall — the worst case): p=4 ≈ 5e-3, p=6 ≈ 5e-4.
            est = {3: 2e-2, 4: 5e-3, 5: 1.5e-3, 6: 5e-4}.get(
                self.farfield_p, 1e-4 if self.farfield_p > 6 else 5e-2)
            if self.farfield_band_p:
                # two-tier: error = max(band order at offset 2, FFT order
                # at offsets ≥ 4) — measured per-offset interpolation table
                band_tbl = {3: 2e-2, 4: 6e-3, 5: 1.6e-3, 6: 2e-4, 7: 1e-4}
                far4_tbl = {3: 1e-3, 4: 3e-4, 5: 2e-5, 6: 3e-6}
                est = max(band_tbl.get(self.farfield_band_p, 5e-5),
                          far4_tbl.get(self.farfield_p, 1e-6))
            if self.gmres_tol < est:
                import warnings

                warnings.warn(
                    f"gmres_tol={self.gmres_tol:g} is below the proxy-grid "
                    f"far field's measured operator error at farfield_p="
                    f"{self.farfield_p} (~{est:g}): the solve will converge "
                    f"to the approximate operator's solution, not to "
                    f"gmres_tol of the exact one.  Raise farfield_p (6 ≈ "
                    f"5e-4) or relax gmres_tol.",
                    stacklevel=2,
                )
        if self.ewald_rc > 0:
            if self.ewald_xi > 0:
                raise ValueError(
                    "pass either ewald_rc (balanced splitting) or ewald_xi, "
                    "not both — rc determines xi"
                )
            if self.box is None or len(self.box) != 3:
                raise ValueError("ewald_rc needs a 3-D (Lx, Ly, Lz) box")
        if self.ewald_grid_p:
            if self.ewald_rc <= 0:
                raise ValueError(
                    "ewald_grid_p needs ewald_rc > 0 (balanced splitting): "
                    "with the classic min(L)/2 split the wavevector count "
                    "is already small and the dense k-sum is optimal"
                )
            if self.ewald_grid_p < 2:
                raise ValueError(
                    f"ewald_grid_p must be >= 2 nodes per dim (or 0 = off), "
                    f"got {self.ewald_grid_p}"
                )
        if self.drift_mode not in ("midpoint_slip", "em_exact"):
            raise ValueError(
                f"unknown drift_mode {self.drift_mode!r}; use 'midpoint_slip' "
                "or 'em_exact' (a typo here would otherwise silently run the "
                "midpoint scheme)"
            )
        if self.pc_mode == "ras" and self.pc_refresh > 1:
            raise ValueError(
                "pc_refresh > 1 with pc_mode='ras' is not supported: a "
                "lagged halo tier is MEASURED catastrophic (settled 9.2 → "
                "27-29 mean GMRES iters even at refresh 4 — the stale "
                "Woodbury blocks are inconsistent with the fresh rotation "
                "core; BENCH_NOTES round 4).  The RAS build is cheap per "
                "step instead (bf16 matmuls + Newton–Schulz inverses)."
            )
        if self.max_step_residual > 0 and self.gmres_tol >= self.max_step_residual:
            raise ValueError(
                f"gmres_tol ({self.gmres_tol}) must be below max_step_residual "
                f"({self.max_step_residual}) — otherwise every 'converged' solve "
                "is rejected and the trajectory silently freezes"
            )

    def replace(self, **kw) -> "SimulationConfig":
        return dataclasses.replace(self, **kw)

    # dataclass is frozen + all fields hashable → usable as a static jit arg.
