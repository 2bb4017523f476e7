"""Symbolic derivation of the Ewald-split (PSE) periodic RPY real-space
scalars, validated against numerical quadrature.

The RPY tensor (equal radii a) is exactly the double surface-average of the
Stokeslet, whose Fourier symbol is

    M̂(k) = sinc²(ka) / (η k²) · (I − k̂k̂),       sinc(x) = sin(x)/x

(valid for ALL separations including overlap — the surface-average form
reproduces the standard overlap branch).  With the positively-split-Ewald
screen H(k) = (1 + k²/4ξ²) e^{−k²/4ξ²} (Fiore, Balboa Usabiaga, Donev &
Swan 2017 — both parts SPD since 0 < H ≤ 1), the real-space part is the
open-domain inverse transform of M̂(k)(1 − H(k)):

    M_real(r) = A(r)·I + B(r)·r̂r̂
    A = S₀ + S'/r,   B = S'' − S'/r
    S₀(r) = 1/(8π²ηa²r)·[2 J₃(r) − J₃(r+2a) − J₃(r−2a)]
    S(r)  = 1/(8π²ηa²r)·[2 J₅(r) − J₅(r+2a) − J₅(r−2a)]
    J_n(α) = ∫₀^∞ (1 − H(k)) sin(kα) k^{−n} dk   (odd in α)

Each J_n is obtained from the cascade J₃'' = −J₁, J₅'' = −J₃ with
J₁(α) = (π/2)erfc(αξ) − (√π/2)αξ e^{−α²ξ²}  and the boundary constants
J_n(0) = 0,  J₃'(0) = √π/(4ξ),  J₅'(0) = ∫(1−H)k⁻⁴dk (closed form) —
pure erf/Gaussian integrations sympy does instantly.  The script verifies
every stage against direct quadrature and prints the final A, B, A_self
expressions implemented in ``ops/ewald.py``.
"""
import sympy as sp

al, r, a, xi = sp.symbols("alpha r a xi", positive=True)
eta = sp.symbols("eta", positive=True)

sqpi = sp.sqrt(sp.pi)

J1 = sp.pi / 2 * sp.erfc(al * xi) - sqpi / 2 * al * xi * sp.exp(-al**2 * xi**2)

# J3: J3'' = -J1, J3(0) = 0, J3'(0) = sqrt(pi)/(4 xi)
J1_int = sp.integrate(J1, (al, 0, al))          # ∫0^α J1
J3p = sqpi / (4 * xi) - J1_int                  # J3'
J3 = sp.integrate(J3p, (al, 0, al))
J3 = sp.simplify(J3)

# J5: J5'' = -J3, J5(0) = 0, J5'(0) = ∫ (1-H)/k^4 dk
k = sp.symbols("k", positive=True)
H = (1 + k**2 / (4 * xi**2)) * sp.exp(-(k**2) / (4 * xi**2))
J5p0 = sp.simplify(sp.integrate((1 - H) / k**4, (k, 0, sp.oo)))
J3_int = sp.integrate(J3, (al, 0, al))
J5 = sp.integrate(J5p0 - J3_int, (al, 0, al))
J5 = sp.simplify(J5)

print("J3 =", J3)
print("J5p0 =", J5p0)
print("J5 =", J5)

pref = 1 / (8 * sp.pi**2 * eta * a**2 * r)
S0 = pref * (2 * J3.subs(al, r) - J3.subs(al, r + 2 * a)
             - J3.subs(al, r - 2 * a))
S = pref * (2 * J5.subs(al, r) - J5.subs(al, r + 2 * a)
            - J5.subs(al, r - 2 * a))

A = sp.simplify(S0 + sp.diff(S, r) / r)
B = sp.simplify(sp.diff(S, r, 2) - sp.diff(S, r) / r)
print("\nA(r) [branch r>2a; for r<2a substitute the odd extension of the")
print("(r-2a) terms: J_n(r-2a) -> -J_n(2a-r)] =")
print(A)
print("\nB(r) =")
print(B)

# self limit: A(0) = (1/3π²) ∫ g dk,  g = (1−H) sinc²(ka)/η
g = (1 - H) * sp.sin(k * a) ** 2 / (k**2 * a**2) / eta
A_self = sp.simplify(sp.integrate(g, (k, 0, sp.oo)) / (3 * sp.pi**2))
print("\nA_self = lim_{r->0} A(r) =", A_self)

# ---- numerical validation vs direct quadrature of the defining integrals
import mpmath as mp

av, xv, ev = 0.37, 0.9, 1.3
subs = {a: av, xi: xv, eta: ev}


def one_minus_H(kk):
    x = kk**2 / (4 * xv**2)
    return 1 - (1 + x) * mp.e**(-x)


def Jn_quad(alv, n):
    if alv == 0:
        return mp.mpf(0)
    sgn = 1 if alv > 0 else -1
    alv = abs(alv)
    return sgn * mp.quad(
        lambda kk: one_minus_H(kk) * mp.sin(kk * alv) / kk**n,
        [0, 1 / alv, 10 / alv, mp.inf])


fJ3 = sp.lambdify(al, J3.subs(subs), "mpmath")
fJ5 = sp.lambdify(al, J5.subs(subs), "mpmath")
print("\nJ3/J5 validation:")
for alv in (0.3, 1.0, 4.0):
    print(f"  alpha={alv}: J3 sym={float(fJ3(alv)):+.10e} "
          f"quad={float(Jn_quad(alv, 3)):+.10e} | "
          f"J5 sym={float(fJ5(alv)):+.10e} quad={float(Jn_quad(alv, 5)):+.10e}")


def quad_A_B(rv):
    pref = 1 / (8 * mp.pi**2 * ev * av**2)

    def S0f(rr):
        return pref / rr * (2 * Jn_quad(rr, 3) - Jn_quad(rr + 2 * av, 3)
                            - Jn_quad(rr - 2 * av, 3))

    def Sf(rr):
        return pref / rr * (2 * Jn_quad(rr, 5) - Jn_quad(rr + 2 * av, 5)
                            - Jn_quad(rr - 2 * av, 5))

    h = mp.mpf("1e-5")
    Sp = (Sf(rv + h) - Sf(rv - h)) / (2 * h)
    Spp = (Sf(rv + h) - 2 * Sf(rv) + Sf(rv - h)) / h**2
    return S0f(rv) + Sp / rv, Spp - Sp / rv


fA = sp.lambdify(r, A.subs(subs), "mpmath")
fB = sp.lambdify(r, B.subs(subs), "mpmath")
print("\nA/B validation (r > 2a branch):")
for rv in (0.9, 1.5, 3.0, 6.0):
    qa, qb = quad_A_B(mp.mpf(rv))
    print(f"  r={rv}: A sym={float(fA(rv)):+.10e} quad={float(qa):+.10e} "
          f"| B sym={float(fB(rv)):+.10e} quad={float(qb):+.10e}")

fAs = sp.lambdify((), A_self.subs(subs), "mpmath")
qa0 = mp.quad(lambda kk: one_minus_H(kk) *
              mp.sin(kk * av)**2 / (kk**2 * av**2) / ev,
              [0, 1, 10, mp.inf]) / (3 * mp.pi**2)
print(f"\nA_self sym={float(fAs()):+.10e} quad={float(qa0):+.10e}")
