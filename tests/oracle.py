"""Independent numpy oracle for parity tests.

Direct, loop-based numpy transcription of the physics the reference C++
implements (RPY pair mobility with near/far branches, Swan–Brady wall
correction, mirrored upper-triangle dense assembly, damping, dense K).
Deliberately written in the dumbest possible style so it can't share bugs
with the vectorized JAX implementation under test.
"""

import numpy as np


def rpy_matrix(r, a=1.0, eta=1.0, wall=False, h_floor=0.75, box=None):
    """Dense 3N×3N RPY mobility, upper triangle + mirror (reference
    ``rotne_prager_tensor``, ``c_rigid_obj.cpp:413-459``).

    h_floor: blob-height floor (units of a) for the wall-correction
    evaluation — mirrors rpy.WALL_H_FLOOR (the raw image terms give an
    indefinite mobility at deep wall overlap); 0 = exact reference formulas.
    box: None, or (Lx, Ly) pseudo-periodic minimum-image wrap in the plane
    (absolute units — mirrors rpy._wrap_xy).
    """
    r = np.asarray(r, dtype=np.float64).reshape(-1, 3)
    n = len(r)
    M = np.zeros((3 * n, 3 * n))
    inv_a = 1.0 / a
    for i in range(n):
        for j in range(i, n):
            d = (r[i] - r[j]) * inv_a
            if box is not None:
                for c in range(2):
                    lc = box[c] * inv_a
                    d[c] -= lc * np.round(d[c] / lc)
            if i == j:
                B = (4.0 / 3.0) * np.eye(3)
            else:
                rr = np.linalg.norm(d)
                if rr >= 2:
                    c1 = 1 + 2 / (3 * rr * rr)
                    c2 = (1 - 2 / rr**2) / rr**2
                    B = (c1 * np.eye(3) + c2 * np.outer(d, d)) / rr
                else:
                    c1 = (4 / 3) * (1 - 0.28125 * rr)
                    c2 = (4 / 3) * 0.09375 / rr
                    B = c1 * np.eye(3) + c2 * np.outer(d, d)
            if wall:
                B = B + wall_correction(
                    d, r[i, 2] * inv_a, r[j, 2] * inv_a,
                    self_pair=(i == j), h_floor=h_floor,
                )
            M[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] = B
            if i != j:
                M[3 * j : 3 * j + 3, 3 * i : 3 * i + 3] = B.T
    return M / (8 * np.pi * eta * a)


def wall_correction(d, hi, hj, self_pair, h_floor=0.75):
    """Swan–Brady finite-size wall correction block (normalized by a);
    reference ``mobilityUFSingleWallCorrection`` (``c_rigid_obj.cpp:85-142``),
    evaluated at heights floored to h_floor (both source and receiver, so
    C_ji = C_ijᵀ is preserved)."""
    if hj < 0 or hi < 0:
        raise RuntimeError("blob below wall")
    hi = max(hi, h_floor)
    hj = max(hj, h_floor)
    if self_pair:
        iz = 1 / hj
        iz3, iz5 = iz**3, iz**5
        return np.diag(
            [
                -(9 * iz - 2 * iz3 + iz5) / 12,
                -(9 * iz - 2 * iz3 + iz5) / 12,
                -(9 * iz - 4 * iz3 + iz5) / 6,
            ]
        )
    rim = d.copy()
    rim[2] = hi + hj
    h_hat = hj / rim[2]
    invR = 1 / np.linalg.norm(rim)
    e = rim * invR
    ez = e[2]
    invR3, invR5 = invR**3, invR**5
    f1 = -(3 * (1 + 2 * h_hat * (1 - h_hat) * ez**2) * invR
           + 2 * (1 - 3 * ez**2) * invR3 - 2 * (1 - 5 * ez**2) * invR5) / 3
    f2 = -(3 * (1 - 6 * h_hat * (1 - h_hat) * ez**2) * invR
           - 6 * (1 - 5 * ez**2) * invR3 + 10 * (1 - 7 * ez**2) * invR5) / 3
    f3 = ez * (3 * h_hat * (1 - 6 * (1 - h_hat) * ez**2) * invR
               - 6 * (1 - 5 * ez**2) * invR3 + 10 * (2 - 7 * ez**2) * invR5) * 2 / 3
    f4 = ez * (3 * h_hat * invR - 10 * invR5) * 2 / 3
    f5 = -(3 * h_hat**2 * ez**2 * invR + 3 * ez**2 * invR3
           + (2 - 15 * ez**2) * invR5) * 4 / 3
    zh = np.array([0.0, 0.0, 1.0])
    return (f1 * np.eye(3) + f2 * np.outer(e, e) + f3 * np.outer(e, zh)
            + f4 * np.outer(zh, e) + f5 * np.outer(zh, zh))


def rpy_matrix_2p(r, a=1.0, eta=1.0, shells=2, box=(20.0, 20.0),
                  h_floor=0.75, wall=True):
    """Dense doubly-periodic (pseudo-2D) wall mobility by brute-force
    image summation: every ordered pair block is the full wall-corrected
    RPY block summed over the (2S+1)² nearest in-plane lattice images of
    the minimum-imaged displacement (a blob DOES interact with its own
    images; only the zero-offset self pair is the self term).
    """
    r = np.asarray(r, dtype=np.float64).reshape(-1, 3)
    n = len(r)
    M = np.zeros((3 * n, 3 * n))
    inv_a = 1.0 / a
    lx, ly = box[0] * inv_a, box[1] * inv_a
    for i in range(n):
        for j in range(n):
            d0 = (r[i] - r[j]) * inv_a
            d0[0] -= lx * np.round(d0[0] / lx)
            d0[1] -= ly * np.round(d0[1] / ly)
            B = np.zeros((3, 3))
            for nx in range(-shells, shells + 1):
                for ny in range(-shells, shells + 1):
                    if i == j and nx == 0 and ny == 0:
                        B += (4.0 / 3.0) * np.eye(3)
                        if wall:
                            B += wall_correction(
                                d0, r[i, 2] * inv_a, r[j, 2] * inv_a,
                                self_pair=True, h_floor=h_floor)
                        continue
                    d = d0 + np.array([nx * lx, ny * ly, 0.0])
                    rr = np.linalg.norm(d)
                    if rr >= 2:
                        c1 = 1 + 2 / (3 * rr * rr)
                        c2 = (1 - 2 / rr**2) / rr**2
                        B += (c1 * np.eye(3) + c2 * np.outer(d, d)) / rr
                    else:
                        c1 = (4 / 3) * (1 - 0.28125 * rr)
                        c2 = (4 / 3) * 0.09375 / rr
                        B += c1 * np.eye(3) + c2 * np.outer(d, d)
                    if wall:
                        B += wall_correction(
                            d, r[i, 2] * inv_a, r[j, 2] * inv_a,
                            self_pair=False, h_floor=h_floor)
            M[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] = B
    return M / (8 * np.pi * eta * a)


def damping(r, a=1.0):
    r = np.asarray(r).reshape(-1, 3)
    return np.repeat(np.minimum(r[:, 2] / a, 1.0), 3)


def apply_M(F, r, a=1.0, eta=1.0, wall=False, h_floor=0.75, box=None):
    """Reference ``apply_M`` semantics: B·M·B·F iff wall else M·F."""
    M = rpy_matrix(r, a, eta, wall, h_floor=h_floor, box=box)
    F = np.asarray(F).ravel()
    if wall:
        b = damping(r, a)
        return b * (M @ (b * F))
    return M @ F


def dense_K(offsets):
    """Dense K (3·B·n, 6·B) from world-frame blob offsets (B, n, 3);
    reference triplet layout (``c_rigid_obj.cpp:369-383``)."""
    B, n, _ = offsets.shape
    K = np.zeros((3 * B * n, 6 * B))
    for b in range(B):
        for k in range(n):
            row = 3 * (b * n + k)
            K[row : row + 3, 6 * b : 6 * b + 3] = np.eye(3)
            rx, ry, rz = offsets[b, k]
            K[row + 0, 6 * b + 4] = rz
            K[row + 0, 6 * b + 5] = -ry
            K[row + 1, 6 * b + 5] = rx
            K[row + 1, 6 * b + 3] = -rz
            K[row + 2, 6 * b + 3] = ry
            K[row + 2, 6 * b + 4] = -rx
    return K
