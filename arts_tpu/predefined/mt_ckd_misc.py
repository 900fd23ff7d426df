"""MT_CKD 2.52 / 1.00 band models: CO2 continuum, O2 visible/near-IR CIA
bands, N2 CIA fundamental + rotational bands.

Parity references:
  /root/reference/src/core/predefined/MT_CKD252.cc —
    carbon_dioxide (:89-1156, FCO2 table with the v3-bandhead temperature
    dependence and the 2000-2998 cm^-1 Xfac correction),
    oxygen_vis (:1157-1531, Greenblatt 1990),
    nitrogen_fun (:1532-1760, Lafferty 1996 with dual-T tables),
    nitrogen_rot (:1762-1971, Borysow-Frommhold with O2 scale factors);
  /root/reference/src/core/predefined/MT_CKD100.cc —
    oxygen_cia (:184-380), oxygen_v0v0 (:381-580 Mate 1999),
    oxygen_v0v1 (:580-736 Mlawer 1998, analytic two-oscillator band).

Table data extracted verbatim (_mt_ckd_misc_data.npz, public AER model
data).  The 2.52-family models reproduce the reference port's cursor
linear interpolation exactly (std::lerp(k[J], k[J+1], 1+(V-VJ)/DVC) with
VJ the first lattice node >= V — including its one-node-up quirk); the
1.00-family models use the 4-point XINT like CKDMT350.

oxygen_v0v1 computes its analytic band on the band-anchored lattice
(9100..11000 cm^-1 at 2 cm^-1) rather than the reference's
f_grid-anchored window (data-dependent node positions cannot be traced
under jit); the difference is pure interpolation error of a smooth
Lorentzian, < 1e-5 relative.
"""

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from .ckdmt350 import _radfn, _xint

_XLOSMT = 2.686763e19  # Loschmidt [molecules/cm^3] (MT_CKD252.cc:98)
_T1 = 273.0
_T0 = 296.0
_P0 = 1013.0  # [hPa]
_RADCN2 = 1.4387752


@functools.lru_cache(maxsize=1)
def _tables():
    d = np.load(pathlib.Path(__file__).parent / "_mt_ckd_misc_data.npz")
    return {k: d[k] for k in d.files}


def _lerp_cursor(f_grid, v0, dv, k_node, lo, hi):
    """The 2.52 port's cursor interpolation, vectorized: for each V take
    the first lattice node VJ >= V and evaluate
    lerp(k[J], k[J+1], 1 + (V-VJ)/dv)  (MT_CKD252.cc:1128-1135)."""
    x = f_grid / (100.0 * const.c)  # [cm^-1]
    n = k_node.shape[0]
    i = jnp.ceil((x - v0) / dv).astype(jnp.int32)  # first node >= V
    t = 1.0 + (x - (v0 + dv * i)) / dv
    # nodes outside the table are zero, and the lerp still runs: the
    # reference windows the table into a zero-initialized local array one
    # step wider on each side, so the last half-interval below `hi`
    # interpolates toward an implicit 0 at v_max + dv
    # (MT_CKD252.cc:1899-1908 window fill, :1965 lerp)
    a = jnp.where((i >= 0) & (i < n), k_node[jnp.clip(i, 0, n - 1)], 0.0)
    ip1 = i + 1
    b = jnp.where((ip1 >= 0) & (ip1 < n), k_node[jnp.clip(ip1, 0, n - 1)], 0.0)
    out = a + t * (b - a)
    inside = (x > lo) & (x < hi)
    return jnp.where(inside, out, 0.0)


def co2_ckdmt252(f_grid, t, p_pa, vmrs):
    """CO2-CKDMT252 continuum [1/m] (carbon_dioxide, MT_CKD252.cc:89)."""
    tab = _tables()
    fco2 = jnp.asarray(tab["fco2"])  # raw[i] at v = -4 + 2 i
    n = fco2.shape[0]
    v = -4.0 + 2.0 * jnp.arange(n)
    # v3-bandhead temperature dependence (raw i in [1195, 1219], :1094)
    e = np.zeros(n)
    e[1195:1220] = tab["tdep_bandhead"]
    e = jnp.asarray(e)
    fco2 = jnp.where(e != 0.0, (t / 246.0) ** e * fco2, fco2)
    # mt_ckd_2.5 Xfac correction, 2000 < v < 2998 (:1099-1102)
    xfac = np.ones(n)
    iv = np.arange(n)
    vnp = -4.0 + 2.0 * iv
    sel = (vnp > 2000.0) & (vnp < 2998.0)
    jfac = ((vnp[sel] - 1998.0) / 2.0 + 0.00001).astype(np.int64)
    xfac[sel] = tab["xfac_co2"][jfac - 1]
    fco2 = fco2 * jnp.asarray(xfac)

    pave = p_pa * 1e-2
    rhoave = (pave / _P0) * (_T0 / t)
    wtot = _XLOSMT * (pave / _P0) * (_T1 / t)
    xkt = t / _RADCN2
    k_node = wtot * rhoave * (fco2 * 1e-20) * _radfn(v, xkt)
    return vmrs["CO2"] * 1e2 * _lerp_cursor(f_grid, -4.0, 2.0, k_node,
                                            0.0, -4.0 + 2.0 * (n - 1))


def o2_vis_ckdmt252(f_grid, t, p_pa, vmrs):
    """O2-visCKDMT252 [1/m] (oxygen_vis, MT_CKD252.cc:1157)."""
    tab = _tables()
    raw = jnp.asarray(tab["o2_vis"])  # raw[i] at v = 15000 + 10 i
    n = raw.shape[0]
    v = 15000.0 + 10.0 * jnp.arange(n)
    co = raw / v
    pave = p_pa * 1e-2
    wtot = 1e-20 * _XLOSMT * (pave / _P0) * (_T1 / t)
    tau_fac = wtot * (pave / _P0) * (_T1 / t)
    factor = 1.0 / (_XLOSMT * 1e-20 * (55.0 * 273.0 / 296.0) ** 2 * 89.5)
    xkt = t / _RADCN2
    k_node = co * factor * tau_fac * _radfn(v, xkt)
    return vmrs["O2"] * 1e2 * _lerp_cursor(f_grid, 15000.0, 10.0, k_node,
                                           15000.0, 29870.0)


def n2_fun_ckdmt252(f_grid, t, p_pa, vmrs):
    """N2-CIAfunCKDMT252 [1/m] (nitrogen_fun, MT_CKD252.cc:1532)."""
    tab = _tables()
    xn2 = jnp.asarray(tab["n2f"])  # raw[i] at v = v1 + dv i
    xn2t = jnp.asarray(tab["n2ft"])
    v1, dv, v2 = 2001.766357, 3.981461525, 2710.45
    n = xn2.shape[0]
    v = v1 + dv * jnp.arange(n)
    n2 = vmrs["N2"]
    o2 = vmrs.get("O2", 0.0)
    h2o = vmrs.get("H2O", 0.0)
    pave = p_pa * 1e-2
    wtot = _XLOSMT * (pave / _P0) * (_T1 / t)
    tau_fac = wtot * (pave / _P0) * (_T1 / t)
    a_o2 = 1.294 - 0.4545 * t / 296.0
    xktfac = ((1.0 / t) - (1.0 / 272.0)) / ((1.0 / 228.0) - (1.0 / 272.0))
    xt_lin = (t - 272.0) / (228.0 - 272.0)
    factor = (1.0 / _XLOSMT) * (n2 + a_o2 * o2 + 1.0 * h2o)
    both = (xn2 > 0.0) & (xn2t > 0.0)
    safe = jnp.where(both, xn2, 1.0)
    c0 = jnp.where(
        both,
        factor * xn2 * (xn2t / safe) ** xktfac / v,
        factor * (xn2 + (xn2t - xn2) * xt_lin) / v,
    )
    xkt = t / _RADCN2
    k_node = tau_fac * c0 * _radfn(v, xkt)
    return n2 * 1e2 * _lerp_cursor(f_grid, v1, dv, k_node, v1, v2)


def n2_rot_ckdmt252(f_grid, t, p_pa, vmrs):
    """N2-CIArotCKDMT252 [1/m] (nitrogen_rot, MT_CKD252.cc:1762)."""
    tab = _tables()
    # raw[i] at v = -10 + 5 i; the port reads only i in [0, 72]
    c296 = jnp.asarray(tab["n2r_ct296"][:73])
    sf296 = jnp.asarray(tab["n2r_sf296"][:73])
    c220 = jnp.asarray(tab["n2r_ct220"][:73])
    sf220 = jnp.asarray(tab["n2r_sf220"][:73])
    v = -10.0 + 5.0 * jnp.arange(73)
    n2 = vmrs["N2"]
    o2 = vmrs.get("O2", 0.0)
    h2o = vmrs.get("H2O", 0.0)
    pave = p_pa * 1e-2
    facfac = n2 * (pave / _P0) ** 2 * (_T1 / t) ** 2
    tfac = (t - _T0) / (220.0 - _T0)
    both = (c296 > 0.0) & (c220 > 0.0)
    safe_c = jnp.where(both, c296, 1.0)
    safe_sf = jnp.where(both, sf296, 1.0)
    cmix = c296 * (c220 / safe_c) ** tfac
    sf = (sf296 * (sf220 / safe_sf) ** tfac - 1.0) * (0.79 / 0.21)
    sn2 = jnp.where(both, facfac * cmix * (n2 + sf * o2 + h2o), 0.0)
    xkt = t / _RADCN2
    k_node = sn2 * _radfn(v, xkt)
    return n2 * 1e2 * _lerp_cursor(f_grid, -10.0, 5.0, k_node, 0.0, 350.0)


def o2_cia_ckdmt100(f_grid, t, p_pa, vmrs):
    """O2-CIAfunCKDMT100 [1/m] (oxygen_cia, MT_CKD100.cc:184)."""
    tab = _tables()
    # 1-based raw with pad: raw[i] (i>=1) at v = 1340 + 5 (i-1)
    xo2 = jnp.asarray(tab["o2f"][1:])
    xo2t = jnp.asarray(tab["o2ft"][1:])
    n = xo2.shape[0]
    v = 1340.0 + 5.0 * jnp.arange(n)
    pave = p_pa * 1e-2
    wtot = _XLOSMT * (pave / _P0) * (_T1 / t)
    tau_fac = wtot * (pave / _P0) * (_T1 / t)
    xktfac = (1.0 / _T0) - (1.0 / t)
    factor = 1.0 / _XLOSMT
    c0 = jnp.where(xo2 > 0.0, factor * xo2 * jnp.exp(xo2t * xktfac) / v, 0.0)
    xkt = t / _RADCN2
    k_node = tau_fac * c0 * _radfn(v, xkt)
    out = 1e2 * _xint(f_grid, v, 5.0, k_node, 1850.0)
    x = f_grid / (100.0 * const.c)
    return vmrs["O2"] * jnp.where(x > 1340.0, out, 0.0)


def o2_v0v0_ckdmt100(f_grid, t, p_pa, vmrs):
    """O2-v0v0CKDMT100 [1/m] (oxygen_v0v0, MT_CKD100.cc:381)."""
    tab = _tables()
    raw = jnp.asarray(tab["o2_00"][1:])  # raw[i] (i>=1) at v = 7536 + 2(i-1)
    n = raw.shape[0]
    v = 7536.0 + 2.0 * jnp.arange(n)
    co = raw / v
    o2 = vmrs["O2"]
    n2 = vmrs.get("N2", 0.0)
    pave = p_pa * 1e-2
    adjwo2 = ((o2 + 0.3 * n2) / 0.446 * (pave / _P0) ** 2
              * (_T1 / t) ** 2)
    so2 = jnp.where(co > 0.0, adjwo2 * co, 0.0)
    xkt = t / _RADCN2
    k_node = so2 * _radfn(v, xkt)
    out = 1e2 * _xint(f_grid, v, 2.0, k_node, 8500.0)
    x = f_grid / (100.0 * const.c)
    return o2 * jnp.where(x > 7536.0, out, 0.0)


def o2_v1v0_ckdmt100(f_grid, t, p_pa, vmrs):
    """O2-v1v0CKDMT100 [1/m] (oxygen_v0v1, MT_CKD100.cc:580): analytic
    two-oscillator near-IR band, evaluated on the band lattice (see
    module docstring on the anchoring)."""
    v1s, v2s, dv = 9100.0, 11000.0, 2.0
    n = int((v2s - v1s) / dv) + 1
    v = v1s + dv * jnp.arange(n)
    v1_osc, hw1, s1 = 9375.0, 58.96, 1.166e-4
    v2_osc, hw2, s2 = 9439.0, 45.04, 3.086e-5
    dv1 = v - v1_osc
    dv2 = v - v2_osc
    damp1 = jnp.where(dv1 < 0.0, jnp.exp(dv1 / 176.1), 1.0)
    damp2 = jnp.where(dv2 < 0.0, jnp.exp(dv2 / 176.1), 1.0)
    o2inf = 0.31831 * (
        (s1 * damp1 / hw1) / (1.0 + (dv1 / hw1) ** 2)
        + (s2 * damp2 / hw2) / (1.0 + (dv2 / hw2) ** 2)
    ) * 1.054
    c = o2inf / v
    o2 = vmrs["O2"]
    pave = p_pa * 1e-2
    wtot = 1e-20 * _XLOSMT * (pave / _P0) * (_T1 / t)
    adjwo2 = (o2 / 0.209) * wtot * (pave / _P0) * (_T0 / t)
    xkt = t / _RADCN2
    k_node = jnp.where(c > 0.0, adjwo2 * c, 0.0) * _radfn(v, xkt)
    out = 1e2 * _xint(f_grid, v, dv, k_node, v2s)
    x = f_grid / (100.0 * const.c)
    return o2 * jnp.where(x > v1s, out, 0.0)
