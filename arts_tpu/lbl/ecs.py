"""ECS (Energy-Corrected Sudden) full-band line mixing.

Parity reference: /root/reference/src/core/lbl/
  - lbl_lineshape_voigt_ecs.cpp — band setup (pop, signed reduced dipoles,
    intensity sorting, per-species W with G0/D0 on the diagonal,
    detailed-balance closure, sum-rule renormalization :205-250), the
    equivalent-line eigen reduction (core_calc_eqv :55-101) and the final
    Voigt-of-equivalent-lines shape (core_calc :104-121, calculate :430)
  - lbl_lineshape_voigt_ecs_makarov.cpp — O2-66 rotational energies and
    the Wigner 3j/6j relaxation-rate sums (Makarov et al. 2020)
  - lbl_lineshape_linemixing.{h,cpp} — the ECS basis functions Q(L, T) and
    Omega(L, T) with scaling/beta/lambda/collisional-distance coefficients
    (Makarov2020 air values in m_linemixing.cc:70-90)

TPU-native design: all quantum-number-dependent Wigner sums collapse into
a static geometry tensor geo[i, j, L] at band construction (host side);
the traced evaluation contracts it with the temperature-dependent
Q(L)/Omega(L) basis, applies the sum rule sequentially (n ~ 40 static
steps), and diagonalizes the detailed-balance-symmetrized complex
SYMMETRIC band matrix with the Jacobi solver in ops/eig_comp_sym — the
reference needs a LAPACK general eigensolver and has *no* Jacobian
support (lbl_lineshape_voigt_ecs.cpp:57 FIXME); here the whole chain is
autodiff-compatible.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln

from .. import constants as const
from ..ops.eig_comp_sym import eig_comp_sym
from ..ops.wofz import wofz
from .zeeman import wigner3j_dipole  # reuse the dipole 3j

# ---------------------------------------------------------------------------
# Wigner symbols (host side, Racah formulas)
# ---------------------------------------------------------------------------


def _lf(x):
    return gammaln(x + 1.0)


def _triangle(a, b, c):
    if a + b < c or abs(a - b) > c:
        return None
    return 0.5 * (_lf(a + b - c) + _lf(a - b + c) + _lf(-a + b + c) - _lf(a + b + c + 1))


def wigner3j(j1, j2, j3, m1, m2, m3):
    """General Wigner 3j (floats; integer or half-integer args)."""
    if abs(m1) > j1 or abs(m2) > j2 or abs(m3) > j3 or m1 + m2 + m3 != 0:
        return 0.0
    tri = _triangle(j1, j2, j3)
    if tri is None:
        return 0.0
    pref = tri + 0.5 * (
        _lf(j1 + m1) + _lf(j1 - m1) + _lf(j2 + m2) + _lf(j2 - m2)
        + _lf(j3 + m3) + _lf(j3 - m3)
    )
    tmin = int(max(0.0, max(j2 - j3 - m1, j1 - j3 + m2)))
    tmax = int(min(j1 + j2 - j3, min(j1 - m1, j2 + m2)))
    s = 0.0
    for t in range(tmin, tmax + 1):
        denom = (
            _lf(t) + _lf(j3 - j2 + m1 + t) + _lf(j3 - j1 - m2 + t)
            + _lf(j1 + j2 - j3 - t) + _lf(j1 - m1 - t) + _lf(j2 + m2 - t)
        )
        s += (-1.0) ** t * math.exp(pref - denom)
    return (-1.0) ** int(round(j1 - j2 - m3)) * s


def wigner6j(j1, j2, j3, j4, j5, j6):
    """General Wigner 6j {j1 j2 j3; j4 j5 j6} (Racah sum)."""
    tris = [
        _triangle(j1, j2, j3),
        _triangle(j1, j5, j6),
        _triangle(j4, j2, j6),
        _triangle(j4, j5, j3),
    ]
    if any(t is None for t in tris):
        return 0.0
    pref = sum(tris)
    a1 = j1 + j2 + j3
    a2 = j1 + j5 + j6
    a3 = j4 + j2 + j6
    a4 = j4 + j5 + j3
    b1 = j1 + j2 + j4 + j5
    b2 = j2 + j3 + j5 + j6
    b3 = j3 + j1 + j6 + j4
    tmin = int(round(max(a1, a2, a3, a4)))
    tmax = int(round(min(b1, b2, b3)))
    s = 0.0
    for t in range(tmin, tmax + 1):
        num = _lf(t + 1)
        den = (
            _lf(t - a1) + _lf(t - a2) + _lf(t - a3) + _lf(t - a4)
            + _lf(b1 - t) + _lf(b2 - t) + _lf(b3 - t)
        )
        s += (-1.0) ** t * math.exp(pref + num - den)
    return s


# ---------------------------------------------------------------------------
# O2-66 rotational energies (Makarov constants, MHz -> J)
# ---------------------------------------------------------------------------
_B0, _D0, _H0 = 43100.4425, 0.145123, 3.8e-8
_XL0, _XG0 = 59501.3435, -252.58633
_XL1, _XL2 = 0.058369, 2.899e-7
_XG1, _XG2 = -2.4344e-4, -1.45e-9


def _o2_erot_raw(N, J):
    XX = N * (N + 1.0)
    xl = _XL0 + _XL1 * XX + _XL2 * XX**2
    xg = _XG0 + _XG1 * XX + _XG2 * XX**2
    C1 = _B0 * XX - _D0 * XX**2 + _H0 * XX**3
    if J < N:
        if N == 1:
            v = C1 - (xl + _B0 * (2 * N - 1) + xg * N)
        else:
            v = C1 - (xl + _B0 * (2 * N - 1) + xg * N) + math.sqrt(
                (_B0 * (2 * N - 1)) ** 2 + xl**2 - 2 * _B0 * xl
            )
    elif J > N:
        v = C1 - (xl - _B0 * (2 * N + 3) - xg * (N + 1)) - math.sqrt(
            (_B0 * (2 * N + 3)) ** 2 + xl**2 - 2 * _B0 * xl
        )
    else:
        v = C1
    return v * 1e6 * const.h  # MHz -> J


def o2_erot(N, J=None):
    """Rotational energy of ground-state O2 at (N, J), rescaled so that
    erot(1, 0) = 0 (lbl_lineshape_voigt_ecs_makarov.cpp erot)."""
    J = N if J is None else J
    return _o2_erot_raw(N, J) - _o2_erot_raw(1, 0)


def makarov_reduced_dipole(Ju, Jl, N):
    """(-1)^(Jl+N) sqrt(6 (2Jl+1)(2Ju+1)) {1 1 1; Jl Ju N}."""
    sign = 1.0 if (Jl + N) % 2 == 0 else -1.0
    return sign * math.sqrt(6.0 * (2 * Jl + 1) * (2 * Ju + 1)) * wigner6j(
        1.0, 1.0, 1.0, Jl, Ju, N
    )


# ---------------------------------------------------------------------------
# Band construction (host) + traced evaluation
# ---------------------------------------------------------------------------

# ECS datasets (m_linemixing.cc:70-135). Each coefficient is a T1 law
# (x0, n) evaluated as x0 * (T0/T)^n; a constant (T0 law) has n = 0.
_KAYCM_ATM = 2.99792458e10 / 101325.0  # kaycm_per_atm -> Hz/Pa

MAKAROV2020_AIR = dict(
    scaling=(1.0, 0.0), beta=(0.567, 0.0), lam=(0.39, 0.0),
    collisional_distance=0.61e-10,
)
RODRIGUES1997_N2 = dict(
    scaling=(0.0180 * _KAYCM_ATM, 0.85), beta=(0.008, 0.0),
    lam=(0.81, 0.0152), collisional_distance=2.2e-10,
)
RODRIGUES1997_O2 = dict(
    scaling=(0.0168 * _KAYCM_ATM, 0.5), beta=(0.007, 0.0),
    lam=(0.82, -0.091), collisional_distance=2.4e-10,
)
TRAN2011_CO2 = dict(
    scaling=(0.019 * _KAYCM_ATM, 0.0), beta=(0.052, 0.0),
    lam=(0.61, 0.0), collisional_distance=5.5e-10,
)

# CO2-626 rotational energy B * J(J+1)
# (lbl_lineshape_voigt_ecs_hartmann.cpp:38 erot_selection)
def co2_erot(J):
    return 0.39021 * 2.99792458e10 * const.h * J * (J + 1.0)


def linear_reduced_dipole(Jf, Ji, lf=0.0, li=0.0, k=1.0):
    """Signed reduced dipole of a linear-molecule line
    (lbl_lineshape_voigt_ecs_hartmann.cpp reduced_dipole)."""
    sign = 1.0 if (Jf + lf + 1) % 2 == 0 else -1.0
    return sign * math.sqrt(2.0 * Jf + 1.0) * wigner3j(
        Jf, k, Ji, li, lf - li, -lf
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EcsBand:
    """One ECS band (single broadener), sorted by line importance."""

    f0: jax.Array  # [n]
    e0: jax.Array  # [n]
    gu: jax.Array  # [n]
    dip: jax.Array  # [n] signed transition dipole (T-independent)
    dipr: jax.Array  # [n] reduced dipole
    g0_x0: jax.Array  # [n] G0 T1 coefficients [Hz/Pa]
    g0_n: jax.Array  # [n]
    d0_x0: jax.Array  # [n] D0 T1 coefficients
    d0_n: jax.Array  # [n]
    t0: jax.Array  # reference temperature
    geo: jax.Array  # [n, n, NL] static Wigner geometry (direct triangle)
    mask_direct: jax.Array  # [n, n] bool: entry computed directly
    ni: jax.Array  # [n] int upper-N per line (Omega factor index)
    erot_L: jax.Array  # [NL] rotational energies of the ECS basis
    erot_Lm2: jax.Array  # [NL]
    Lvals: jax.Array  # [NL] basis L values
    mass: jax.Array  # molecular mass [g/mol]
    mass_other: jax.Array  # perturber mass [g/mol]
    scaling: jax.Array  # [2] T1 law (x0, n)
    beta: jax.Array  # [2]
    lam: jax.Array  # [2]
    dc: jax.Array  # collisional distance [m]
    # Hartmann-type bands place the directly-computed element at W[j, i]
    # (lbl_lineshape_voigt_ecs_hartmann.cpp:148); Makarov at W[i, j]
    direct_at_ji: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


def make_o2_band(lines, ecs=MAKAROV2020_AIR, mass=31.98983, mass_other=28.96):
    """Build an EcsBand for O2-66-like lines.

    lines: dicts with f0 [Hz], a, e0 [J], gu, Ju, Jl, Nu, Nl,
    g0=(x0, n), d0=(x0, n) T1-law broadening, t0.
    Parity: adapt_single + makarov::relaxation_matrix_offdiagonal.
    """
    n = len(lines)
    T0 = lines[0].get("t0", 296.0)
    kB = const.k

    f0 = np.array([l["f0"] for l in lines])
    e0 = np.array([l["e0"] for l in lines])
    gu = np.array([l["gu"] for l in lines])
    a = np.array([l["a"] for l in lines])
    Ju = np.array([l["Ju"] for l in lines], dtype=float)
    Jl = np.array([l["Jl"] for l in lines], dtype=float)
    Nu = np.array([l["Nu"] for l in lines], dtype=float)
    Nl = np.array([l["Nl"] for l in lines], dtype=float)

    dipr = np.array(
        [makarov_reduced_dipole(Ju[i], Jl[i], Nu[i]) for i in range(n)]
    )
    dip = 0.5 * const.c * np.sqrt(a / (f0**3 * 2.0 * np.pi))
    dip *= np.where(dipr < 0, -1.0, 1.0)

    # sort by f0 * pop(T0) * dip^2 descending (adapt_multi sorting)
    pop0 = gu * np.exp(-e0 / (kB * T0))
    order = np.argsort(-(f0 * pop0 * dip**2))
    f0, e0, gu, a, dip, dipr = (
        arr[order] for arr in (f0, e0, gu, a, dip, dipr)
    )
    Ju, Jl, Nu, Nl = (arr[order] for arr in (Ju, Jl, Nu, Nl))
    g0_x0 = np.array([lines[i]["g0"][0] for i in order])
    g0_n = np.array([lines[i]["g0"][1] for i in order])
    d0_x0 = np.array([lines[i].get("d0", (0.0, 0.0))[0] for i in order])
    d0_n = np.array([lines[i].get("d0", (0.0, 0.0))[1] for i in order])

    # ECS basis: L = 0 .. maxL-1 (only even L >= 2 contribute to the sums)
    maxL = int(2 * max(Ju.max(), Jl.max(), Nu.max(), Nl.max()) + 4)
    Lall = np.arange(maxL)
    erot_L = np.array([o2_erot(float(L)) for L in Lall])
    erot_Lm2 = np.array([o2_erot(float(L - 2)) for L in Lall])

    Si = Sf = 1.0  # O2 ground state spin

    bk = lambda r: math.sqrt(2.0 * r + 1.0)
    geo = np.zeros((n, n, maxL))
    mask = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            # direct-computation triangle: Jf_j < Jf_i, ties -> larger
            # first index wins (replicates the reference's loop order)
            if not (Jl[j] < Jl[i] or (Jl[j] == Jl[i] and i > j)):
                continue
            mask[i, j] = True
            scl = ((-1.0) ** int(round(Ju[j] + Ju[i] + 1))) * bk(Nu[i]) * bk(
                Nl[i]
            ) * bk(Nl[j]) * bk(Nu[j]) * bk(Jl[i]) * bk(Jl[j]) * bk(Ju[i]) * bk(
                Ju[j]
            )
            for L in range(2, maxL, 2):
                aa = wigner3j(Nu[j], Nu[i], L, 0, 0, 0)
                if aa == 0.0:
                    continue
                bb = wigner3j(Nl[j], Nl[i], L, 0, 0, 0)
                cc = wigner6j(L, Ju[i], Ju[j], Si, Nu[j], Nu[i])
                dd = wigner6j(L, Jl[i], Jl[j], Sf, Nl[j], Nl[i])
                ee = wigner6j(L, Ju[i], Ju[j], 1.0, Jl[j], Jl[i])
                geo[i, j, L] = scl * aa * bb * cc * dd * ee * (2 * L + 1)

    j_ = jnp.asarray
    return EcsBand(
        f0=j_(f0), e0=j_(e0), gu=j_(gu), dip=j_(dip), dipr=j_(dipr),
        g0_x0=j_(g0_x0), g0_n=j_(g0_n), d0_x0=j_(d0_x0), d0_n=j_(d0_n),
        t0=j_(T0), geo=j_(geo), mask_direct=j_(mask),
        ni=j_(Nu.astype(np.int32)), erot_L=j_(erot_L), erot_Lm2=j_(erot_Lm2),
        Lvals=j_(Lall.astype(np.float64)), mass=j_(mass),
        mass_other=j_(mass_other),
        scaling=j_(_law2(ecs["scaling"])), beta=j_(_law2(ecs["beta"])),
        lam=j_(_law2(ecs["lam"])), dc=j_(ecs["collisional_distance"]),
    )


def _law2(v):
    """(x0, n) array from a scalar (T0 law) or a pair (T1 law)."""
    a = np.asarray(v, dtype=float)
    return a if a.ndim else np.array([float(a), 0.0])


def make_linear_band(lines, ecs=TRAN2011_CO2, li=0.0, lf=0.0,
                     erot_fn=co2_erot, mass=43.98983, mass_other=43.98983,
                     per_line_K=False):
    """Build an EcsBand for a linear-molecule (CO2-like) band.

    lines: dicts with f0 [Hz], a, e0 [J], gu, Ji (upper J), Jf (lower J),
    g0=(x0, n), optional d0, t0.  li/lf: vibrational angular momenta of
    the upper/lower states.  Parity:
    lbl_lineshape_voigt_ecs_hartmann.cpp relaxation_matrix_offdiagonal
    (geometry, the Jf_p <= Jf direct triangle with last-write tie
    resolution, and the W[j, i] direct placement).

    per_line_K: symmetric-top mode (lbl_lineshape_voigt_ecs_stotop.cpp) —
    each line dict carries "K"; K replaces l in the 3j symbols and the
    reduced dipole, and only lines within the same K sub-band couple
    (delta-K = 0 collisions).  The sum rule then renormalizes within each
    sub-band automatically (cross-K couplings are exactly zero).
    """
    n = len(lines)
    T0 = lines[0].get("t0", 296.0)
    kB = const.k

    f0 = np.array([l["f0"] for l in lines])
    e0 = np.array([l["e0"] for l in lines])
    gu = np.array([l["gu"] for l in lines])
    a = np.array([l["a"] for l in lines])
    Ji = np.array([l["Ji"] for l in lines], dtype=float)
    Jf = np.array([l["Jf"] for l in lines], dtype=float)
    Kv = (
        np.array([l["K"] for l in lines], dtype=float)
        if per_line_K
        else None
    )

    if per_line_K:
        dipr = np.array(
            [linear_reduced_dipole(Jf[i], Ji[i], Kv[i], Kv[i]) for i in range(n)]
        )
    else:
        dipr = np.array(
            [linear_reduced_dipole(Jf[i], Ji[i], lf, li) for i in range(n)]
        )
    dip = 0.5 * const.c * np.sqrt(a / (f0**3 * 2.0 * np.pi))
    dip *= np.where(dipr < 0, -1.0, 1.0)

    pop0 = gu * np.exp(-e0 / (kB * T0))
    order = np.argsort(-(f0 * pop0 * dip**2))
    f0, e0, gu, a, dip, dipr = (
        arr[order] for arr in (f0, e0, gu, a, dip, dipr)
    )
    Ji, Jf = Ji[order], Jf[order]
    if per_line_K:
        Kv = Kv[order]
    g0_x0 = np.array([lines[i]["g0"][0] for i in order])
    g0_n = np.array([lines[i]["g0"][1] for i in order])
    d0_x0 = np.array([lines[i].get("d0", (0.0, 0.0))[0] for i in order])
    d0_n = np.array([lines[i].get("d0", (0.0, 0.0))[1] for i in order])

    maxL = int(2 * max(Ji.max(), Jf.max()) + 4)
    Lall = np.arange(maxL)
    erot_L = np.array([erot_fn(float(L)) for L in Lall])
    erot_Lm2 = np.array([erot_fn(float(max(L - 2, 0))) if L >= 2
                         else erot_fn(0.0) for L in Lall])

    geo = np.zeros((n, n, maxL))
    mask = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            # direct triangle Jf_p <= Jf; equal Jf resolved by the C loop
            # order (the larger outer index writes last)
            if not (Jf[j] < Jf[i] or (Jf[j] == Jf[i] and j < i)):
                continue
            if per_line_K and Kv[j] != Kv[i]:
                continue  # delta-K = 0: no cross-sub-band coupling
            li_ij = Kv[i] if per_line_K else li
            lf_ij = Kv[i] if per_line_K else lf
            mask[i, j] = True
            scl = (2.0 * Ji[j] + 1.0) * math.sqrt(
                (2.0 * Jf[i] + 1.0) * (2.0 * Jf[j] + 1.0)
            )
            L0 = int(max(abs(Ji[i] - Ji[j]), abs(Jf[i] - Jf[j])))
            L0 += L0 % 2
            L0 = max(L0, 2)
            Lend = int(min(Ji[i] + Ji[j], Jf[i] + Jf[j]))
            for L in range(L0, min(Lend, maxL - 1) + 1, 2):
                aa = wigner3j(Ji[i], Ji[j], L, li_ij, -li_ij, 0.0)
                if aa == 0.0:
                    continue
                bb = wigner3j(Jf[i], Jf[j], L, lf_ij, -lf_ij, 0.0)
                cc = wigner6j(Ji[i], Jf[i], 1.0, Jf[j], Ji[j], L)
                geo[i, j, L] = scl * aa * bb * cc * (2 * L + 1)

    j_ = jnp.asarray
    return EcsBand(
        f0=j_(f0), e0=j_(e0), gu=j_(gu), dip=j_(dip), dipr=j_(dipr),
        g0_x0=j_(g0_x0), g0_n=j_(g0_n), d0_x0=j_(d0_x0), d0_n=j_(d0_n),
        t0=j_(T0), geo=j_(geo), mask_direct=j_(mask),
        ni=j_(Ji.astype(np.int32)), erot_L=j_(erot_L),
        erot_Lm2=j_(erot_Lm2), Lvals=j_(Lall.astype(np.float64)),
        mass=j_(mass), mass_other=j_(mass_other),
        scaling=j_(_law2(ecs["scaling"])), beta=j_(_law2(ecs["beta"])),
        lam=j_(_law2(ecs["lam"])), dc=j_(ecs["collisional_distance"]),
        direct_at_ji=True,
    )


def _basis_QOm(band: EcsBand, T):
    """ECS basis Q(L, T) and Omega(L, T) (lbl_lineshape_linemixing.cpp);
    scaling/beta/lambda are T1 laws x0 * (T0/T)^n."""
    tr = band.t0 / T
    scaling = band.scaling[0] * tr ** band.scaling[1]
    beta = band.beta[0] * tr ** band.beta[1]
    lam = band.lam[0] * tr ** band.lam[1]
    L = band.Lvals
    Q = (
        jnp.exp(-beta * band.erot_L / (const.k * T))
        * scaling
        / jnp.maximum(L * (L + 1.0), 1.0) ** lam
    )
    wnnm2 = (band.erot_L - band.erot_Lm2) / const.h_bar
    inv_eff_mass = 1.0 / band.mass + 1.0 / band.mass_other
    vbar2 = (8.0 * const.k / (const.m_u * jnp.pi)) * T * inv_eff_mass
    tauc2 = band.dc**2 / vbar2
    Om = 1.0 / (1.0 + wnnm2**2 * tauc2 / 24.0) ** 2
    return Q, Om


def ecs_absorption(f_grid, band: EcsBand, pf, iso_idx, T, P, vmr_self, iso_ratio=1.0):
    """ECS full-band absorption [1/m] at one point (single broadener).

    pf/iso_idx: partition function table for pop normalization.
    """
    n = band.f0.shape[0]
    kT = const.k * T
    QT = pf.Q(T, iso_idx)
    pop = band.gu * jnp.exp(-band.e0 / kT) / QT

    # diagonal lineshape parameters (T1 laws, P-scaled)
    tr = band.t0 / T
    G0 = P * band.g0_x0 * tr**band.g0_n
    D0 = P * band.d0_x0 * tr**band.d0_n

    # off-diagonal relaxation rates; the G0*P diagonal participates in the
    # sum rule below, which sets the pressure scale of the off-diagonals
    # (the reference fills Wimag's diagonal with G0(T0,T,P) before calling
    # relaxation_matrix_offdiagonal, lbl_lineshape_voigt_ecs.cpp:252-255)
    Qb, Om = _basis_QOm(band, T)
    contr = jnp.einsum("ijl,l->ij", band.geo, Qb / jnp.maximum(Om, 1e-300))
    W0 = Om[band.ni][:, None] * contr * band.mask_direct
    bal = jnp.exp((band.e0[:, None] - band.e0[None, :]) / kT)  # [i, j]
    if band.direct_at_ji:
        # Hartmann: direct element at W[j, i], LTE partner at W[i, j]
        W = W0.T + W0 * bal.T + jnp.diag(G0)
    else:
        # Makarov: direct at W[i, j], partner W[j,i] = W[i,j] e^{(ej-ei)/kT}
        W = W0 + (W0 * bal.T).T + jnp.diag(G0)

    # sum-rule renormalization (sequential, reference :219-247; the j <= i
    # sum includes the pressure-scaled diagonal)
    def renorm(i, W):
        col = W[:, i]
        idx = jnp.arange(n)
        sumlw = jnp.sum(jnp.where(idx > i, band.dipr * col, 0.0))
        sumup = jnp.sum(jnp.where(idx <= i, band.dipr * col, 0.0))
        ratio = jnp.where(sumlw == 0.0, 0.0, -sumup / jnp.where(sumlw == 0, 1.0, sumlw))
        newcol = jnp.where(idx > i, col * ratio, col)
        W = W.at[:, i].set(newcol)
        rowbal = jnp.exp((band.e0[i] - band.e0) / kT)
        newrow = jnp.where(idx > i, newcol * rowbal, W[i, :])
        W = W.at[i, :].set(newrow)
        return W

    for i in range(n):
        W = renorm(i, W)

    # band matrix (f0 + D0 real diagonal, i W with G0 on W's diagonal) and
    # detailed-balance symmetrization.  On non-CPU backends an f64 trace
    # builds the matrix at complex64: the TPU x64 rewriter cannot compile
    # complex128 graphs at all, and c64 eigenvalues (~1e-7 rel) sit well
    # below line-mixing model error; CPU keeps full c128 precision.
    re_part = jnp.diag(band.f0 + D0)
    if (
        jnp.result_type(W.dtype) == jnp.float64
        and jax.default_backend() != "cpu"
    ):
        re_part = re_part.astype(jnp.float32)
        W = W.astype(jnp.float32)
    M = jax.lax.complex(re_part, W.astype(re_part.dtype))
    d = jnp.exp(-band.e0 / (2.0 * kT))
    Msym = d[:, None] * M / d[None, :]
    Msym = 0.5 * (Msym + Msym.T)  # symmetric to roundoff by construction

    vals, Qc = eig_comp_sym(Msym)
    # equivalent strengths: (dip d) Q * (pop dip / d) Q (core_calc_eqv with
    # V = D Q, V^-1 = Q^T D^-1); TPU bf16 matmul default is not enough here
    hp = jax.lax.Precision.HIGHEST
    # keep every complex intermediate at Qc's precision (c64 on the TPU
    # f64 path — mixing f64 reals back in would silently re-promote to
    # the uncompilable c128)
    rt = re_part.dtype
    cvec = lambda x: jax.lax.complex(x.astype(rt), jnp.zeros_like(x, rt))
    s1 = jnp.einsum("i,ik->k", cvec(band.dip * d), Qc, precision=hp)
    s2 = jnp.einsum("i,ik->k", cvec((pop * band.dip) / d), Qc, precision=hp)
    # fold the number density into the strengths now: in f32 the raw
    # str/gamd * w products (~1e-36) would flush to zero in the far wings
    N_ = P / (const.k * T)
    eqv_str = (s1 * s2) * jnp.asarray(N_).astype(rt)
    # equivalent Voigt lines (core_calc :104-121)
    # gamd is the Doppler HWHM (the sqrt(ln 2) factors in cte and the final
    # prefactor assume this convention)
    gd_fac = jnp.sqrt(const.doppler_broadening_const_squared * T / band.mass)
    gamd = const.sqrt_ln_2 * gd_fac * jnp.real(vals)
    cte = const.sqrt_ln_2 / gamd
    z = (vals[:, None] - f_grid.astype(rt)[None, :]) * cte.astype(rt)[:, None]
    wv = wofz(z)
    shape = jnp.sum((eqv_str / gamd.astype(rt))[:, None] * wv, axis=0)

    scl = -f_grid * jnp.expm1(-(const.h * f_grid) / kT)
    F = (
        const.sqrt_ln_2
        / const.sqrt_pi
        * vmr_self
        * iso_ratio
        * scl
        * jnp.real(shape)
    )
    return F


# rigid-rotor B0 constants [cm^-1] for the symmetric/spherical-top ECS
# basis energies (lbl_lineshape_voigt_ecs_{stotop,sphtop}.cpp
# erot_selection; the IOS-limit basis rates carry no K dependence)
TOP_B0_KAYCM = {
    "NH3-4111": 9.9402,
    "PH3-1111": 4.4522,
    "CH4-211": 5.2410,
}


def _rigid_erot(B0_kaycm):
    B = B0_kaycm * 1e2 * const.c * const.h  # kayser -> Joule
    return lambda J: B * J * (J + 1.0)


def make_stotop_band(lines, ecs, isotope="NH3-4111", mass=17.027,
                     mass_other=28.96):
    """Symmetric-top (NH3/PH3) ECS band: per-line K sub-bands, delta-K=0
    coupling (lbl_lineshape_voigt_ecs_stotop.cpp parity).

    lines: dicts additionally carrying "K" (the lower-state projection).
    """
    return make_linear_band(
        lines, ecs, erot_fn=_rigid_erot(TOP_B0_KAYCM[isotope]),
        mass=mass, mass_other=mass_other, per_line_K=True,
    )


def make_sphtop_band(lines, ecs, isotope="CH4-211", mass=16.031,
                     mass_other=28.96):
    """Spherical-top (CH4) ECS band: the linear-molecule geometry with
    l_i = l_f = 0 (lbl_lineshape_voigt_ecs_sphtop.cpp parity)."""
    return make_linear_band(
        lines, ecs, li=0.0, lf=0.0,
        erot_fn=_rigid_erot(TOP_B0_KAYCM[isotope]),
        mass=mass, mass_other=mass_other,
    )
