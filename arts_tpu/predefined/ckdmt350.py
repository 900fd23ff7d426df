"""MT_CKD 3.50 H2O self/foreign continuum (AER), tables checked in.

Parity reference: /root/reference/src/core/predefined/CKDMT350.cc —
compute_self_h2o (:1031) / compute_foreign_h2o (:1149): the AER
coefficient tables on a uniform wavenumber grid (-20..20000 cm^-1, 10
cm^-1 steps; data :48-914 — public AER model data, same category as the
IGRF coefficients), temperature-interpolated (self) or RHUBC-scaled
(foreign), multiplied by the radiation-field term RADFN and column
densities, then 4-point XINT-interpolated onto the output frequencies.

TPU-native: the reference walks a windowed cursor per frequency; here
the per-node cross sections are computed on the full table grid in one
vectorized expression and the output is a batched 4-neighbor gather —
no window bookkeeping, fully differentiable in (T, p, vmr).
"""

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

from .. import constants as const

_XLOSMT = 2.68675e19  # Loschmidt [molecules/cm^3] (CKDMT350.cc:35)
_T0 = 296.0
_T1 = 273.0
_P0 = 1013.0  # [hPa]
_RADCN2 = 1.4387752  # [cm K]

# Foreign correction factors, RHUBC-II/I joint analysis (CKDMT350.cc:1167,
# XFAC_RHU; F77 DIMENSION -1:61 flattened to 0-based)
_XFAC_RHU = np.array([
    0.7620, 0.7840, 0.7820, 0.7840, 0.7620, 0.7410, 0.7970, 0.9140, 0.9980,
    0.9830, 0.9330, 0.8850, 0.8420, 0.8070, 0.8000, 0.8010, 0.8100, 0.8090,
    0.8320, 0.8180, 0.7970, 0.8240, 0.8640, 0.8830, 0.8830, 0.8470, 0.8380,
    0.8660, 0.9410, 1.0400, 1.0680, 1.1410, 1.0800, 1.0340, 1.1550, 1.0990,
    1.0270, 0.9500, 0.8950, 0.8150, 0.7830, 0.7700, 0.7000, 0.7650, 0.7750,
    0.8500, 0.9000, 0.9050, 0.9540, 1.0200, 1.0200, 1.0250, 1.0200, 1.1000,
    1.1250, 1.1200, 1.1110, 1.1370, 1.1600, 1.1490, 1.1070, 1.0640, 1.0450,
])


@functools.lru_cache(maxsize=1)
def _tables():
    d = np.load(pathlib.Path(__file__).parent / "_ckdmt350_data.npz")
    v = d["v1"] + d["dv"] * np.arange(d["sl296"].shape[0])  # [cm^-1]
    # foreign RHUBC/analytic scale factor is static per table node
    # (compute_foreign_h2o FSCAL, CKDMT350.cc:1230-1258)
    fscal = np.ones_like(v)
    low = v < 600.0
    jfac = ((v + 10.0) / 10.0 + 0.00001).astype(np.int64)
    fscal[low] = _XFAC_RHU[np.clip(jfac[low] + 1, 0, 62)]
    hi = ~low
    vj = v[hi]
    vdelsq1 = (vj - 255.67) ** 2
    vdelmsq1 = (vj + 255.67) ** 2
    vf1 = ((vj - 255.67) / 57.83) ** 8
    vmf1 = ((vj + 255.67) / 57.83) ** 8
    vf2 = (vj / 630.0) ** 8
    fscal[hi] = 1.0 + (
        0.06 + (-0.42) * (57600.0 / (vdelsq1 + 57600.0 + vf1)
                          + 57600.0 / (vdelmsq1 + 57600.0 + vmf1))
    ) / (1.0 + 0.3 * vf2)
    return (
        jnp.asarray(v),
        jnp.asarray(d["sl296"]),
        jnp.asarray(d["sl260"]),
        jnp.asarray(d["fh2o"] * fscal),
        float(d["dv"]),
    )


def _radfn(xvi, xkt):
    """RADFN_FUN (CKDMT350.cc:916-962), branch-free."""
    xviokt = xvi / xkt
    small = 0.5 * xviokt * xvi
    expvkt = jnp.expm1(-jnp.clip(xviokt, 0.0, 50.0))
    mid = -xvi * expvkt / (2.0 + expvkt)
    return jnp.where(xviokt <= 0.01, small, jnp.where(xviokt <= 10.0, mid, xvi))


def _xint(f_grid, v, dv, k_node, v_max):
    """4-point XINT interpolation of per-node k onto f_grid wavenumbers
    (XINT_FUN, CKDMT350.cc:964-993), batched as a 4-neighbor gather."""
    x = f_grid / (100.0 * const.c)  # freq2kaycm
    n = v.shape[0]
    # reference: J = int((VI - V1A)/DVA + 1.001) 1-based -> 0-based + 0.001
    j = jnp.floor((x - v[0]) / dv + 0.001).astype(jnp.int32)
    p = (x - (v[0] + dv * j)) / dv
    C = (3.0 - 2.0 * p) * p * p
    B = 0.5 * p * (1.0 - p)
    B1 = B * (1.0 - p)
    B2 = B * p

    def g(off):
        idx = j + off
        return jnp.where(
            (idx >= 0) & (idx < n), k_node[jnp.clip(idx, 0, n - 1)], 0.0
        )

    out = -g(-1) * B1 + g(0) * (1.0 - C + B2) + g(1) * (C + B1) - g(2) * B2
    inside = (x > 0.0) & (x < v_max)
    return jnp.where(inside, out, 0.0)


def h2o_self_ckdmt350(f_grid, t, p_pa, vmrs):
    """H2O-SelfContCKDMT350 absorption [1/m] (compute_self_h2o parity)."""
    v, sl296, sl260, _, dv = _tables()
    vmr = vmrs["H2O"]
    pave = p_pa * 1e-2  # [hPa]
    patm = pave / _P0
    rh2o = vmr * patm * (_T0 / t)
    tfac = (t - _T0) / (260.0 - _T0)
    wtot = _XLOSMT * (pave / 1.013e3) * (2.73e2 / t)
    w1 = vmr * wtot
    xkt = t / _RADCN2

    safe = jnp.where(sl296 > 0.0, sl296, 1.0)
    sh2o = jnp.where(sl296 > 0.0, sl296 * (sl260 / safe) ** tfac, 0.0)
    k_node = w1 * rh2o * (sh2o * 1e-20) * _radfn(v, xkt)  # [1/cm]
    return 1e2 * _xint(f_grid, v, dv, k_node, 20000.0)


def h2o_foreign_ckdmt350(f_grid, t, p_pa, vmrs):
    """H2O-ForeignContCKDMT350 absorption [1/m] (compute_foreign_h2o
    parity; the RHUBC/analytic FSCAL is folded into the static table)."""
    v, _, _, fh2o_scaled, dv = _tables()
    vmr = vmrs["H2O"]
    pave = p_pa * 1e-2
    pfrgn = (pave / _P0) * (1.0 - vmr)
    rfrgn = pfrgn * (_T0 / t)
    wtot = _XLOSMT * (pave / _P0) * (_T1 / t)
    w1 = vmr * wtot
    xkt = t / _RADCN2

    k_node = w1 * rfrgn * (fh2o_scaled * 1e-20) * _radfn(v, xkt)
    return 1e2 * _xint(f_grid, v, dv, k_node, 20000.0)
