"""MT_CKD 3.20 H2O self/foreign continuum (AER), tables checked in.

Parity reference: /root/reference/src/core/predefined/CKDMT320.cc —
compute_self_h2o (:1211) / compute_foreign_h2o (:1392).  Unlike 3.50,
the 3.20 self continuum applies explicit static correction factors
(XFACREV in 820-960 cm^-1, the MT_CKD 2.4 microwave term and the
MT_CKD 3.0 RHUBC-II term, :1310-1321); the foreign RHUBC table differs
in its first entries and is indexed WITHOUT the +1 shift 3.50 uses
(:1460-1463).  Table data extracted verbatim from the reference
(public AER model data) into _ckdmt320_data.npz.

Shares the vectorized RADFN/XINT machinery with ckdmt350.
"""

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

from .ckdmt350 import _P0, _RADCN2, _T0, _T1, _XLOSMT, _radfn, _xint

# XFACREV self-continuum window correction, 820-960 cm^-1 (CKDMT320.cc:59-74)
_XFACREV = np.array([
    1.003, 1.009, 1.015, 1.023, 1.029, 1.033, 1.037, 1.039, 1.040, 1.046,
    1.036, 1.027, 1.01, 1.002, 1.00,
])

# Foreign correction factors (CKDMT320.cc:1411-1418); first entries differ
# from the 3.50 table, and the lookup is XFAC_RHU[JFAC] (no +1)
_XFAC_RHU_320 = np.array([
    0.7810, 0.8330, 0.8500, 0.8330, 0.7810, 0.7540, 0.8180, 0.9140, 0.9980,
    0.9830, 0.9330, 0.8850, 0.8420, 0.8070, 0.8000, 0.8010, 0.8100, 0.8090,
    0.8320, 0.8180, 0.7970, 0.8240, 0.8640, 0.8830, 0.8830, 0.8470, 0.8380,
    0.8660, 0.9410, 1.0400, 1.0680, 1.1410, 1.0800, 1.0340, 1.1550, 1.0990,
    1.0270, 0.9500, 0.8950, 0.8150, 0.7830, 0.7700, 0.7000, 0.7650, 0.7750,
    0.8500, 0.9000, 0.9050, 0.9540, 1.0200, 1.0200, 1.0250, 1.0200, 1.1000,
    1.1250, 1.1200, 1.1110, 1.1370, 1.1600, 1.1490, 1.1070, 1.0640, 1.0450,
])


@functools.lru_cache(maxsize=1)
def _tables():
    d = np.load(pathlib.Path(__file__).parent / "_ckdmt320_data.npz")
    v = d["v1"] + d["dv"] * np.arange(d["sl296"].shape[0])  # [cm^-1]

    # static self-continuum SFAC per table node (CKDMT320.cc:1306-1321)
    sfac = np.ones_like(v)
    win = (v >= 820.0) & (v <= 960.0)
    jfac = ((v - 820.0) / 10.0 + 0.00001).astype(np.int64)
    sfac[win] = _XFACREV[np.clip(jfac[win], 0, 14)]
    sfac *= 1.0 + 0.25 / (1.0 + (v / 350.0) ** 6)
    sfac *= 1.0 + 0.08 / (1.0 + (v / 40.0) ** 6)

    # static foreign FSCAL per node (CKDMT320.cc:1455-1478)
    fscal = np.ones_like(v)
    low = v < 600.0
    jfac_f = ((v + 10.0) / 10.0 + 0.00001).astype(np.int64)
    fscal[low] = _XFAC_RHU_320[np.clip(jfac_f[low], 0, 62)]
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
        jnp.asarray(sfac),
        jnp.asarray(d["fh2o"] * fscal),
        float(d["dv"]),
    )


def h2o_self_ckdmt320(f_grid, t, p_pa, vmrs):
    """H2O-SelfContCKDMT320 absorption [1/m] (compute_self_h2o parity)."""
    v, sl296, sl260, sfac, _, dv = _tables()
    vmr = vmrs["H2O"]
    pave = p_pa * 1e-2  # [hPa]
    patm = pave / _P0
    rh2o = vmr * patm * (_T0 / t)
    tfac = (t - _T0) / (260.0 - _T0)
    wtot = _XLOSMT * (pave / 1.013e3) * (2.73e2 / t)
    w1 = vmr * wtot
    xkt = t / _RADCN2

    safe = jnp.where(sl296 > 0.0, sl296, 1.0)
    sh2o = jnp.where(sl296 > 0.0, sfac * sl296 * (sl260 / safe) ** tfac, 0.0)
    k_node = w1 * rh2o * (sh2o * 1e-20) * _radfn(v, xkt)  # [1/cm]
    return 1e2 * _xint(f_grid, v, dv, k_node, 20000.0)


def h2o_foreign_ckdmt320(f_grid, t, p_pa, vmrs):
    """H2O-ForeignContCKDMT320 absorption [1/m] (compute_foreign_h2o
    parity; the RHUBC/analytic FSCAL is folded into the static table)."""
    v, _, _, _, fh2o_scaled, dv = _tables()
    vmr = vmrs["H2O"]
    pave = p_pa * 1e-2
    pfrgn = (pave / _P0) * (1.0 - vmr)
    rfrgn = pfrgn * (_T0 / t)
    wtot = _XLOSMT * (pave / _P0) * (_T1 / t)
    w1 = vmr * wtot
    xkt = t / _RADCN2

    k_node = w1 * rfrgn * (fh2o_scaled * 1e-20) * _radfn(v, xkt)
    return 1e2 * _xint(f_grid, v, dv, k_node, 20000.0)
