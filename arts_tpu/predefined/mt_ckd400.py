"""MT_CKD 4.0 H2O continuum (AER), data-driven evaluation.

Parity reference: /root/reference/src/core/predefined/MT_CKD400.cc —
compute_self_h2o / compute_foreign_h2o: 4-point XINT interpolation of the
reference absorption-coefficient tables scaled by the radiation field
term RADFN, density ratio, and (self) a temperature power law.  The
coefficient tables ship with arts-cat-data (predef/H2O-*ContCKDMT400.xml)
and are loaded with io.artsxml at scene build.

TPU-native: the serial cursor walk of the reference becomes a batched
4-neighbor gather over the frequency grid.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as const

_RADCN2 = 1.4387752  # cm K (AER second radiation constant)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MTCKD400Data:
    """WaterData parity (predef_data.h): uniform wavenumber grid [cm-1]."""

    wavenumbers: jax.Array  # [N] uniform ascending
    self_absco_ref: jax.Array  # [N]
    for_absco_ref: jax.Array  # [N]
    self_texp: jax.Array  # [N]
    ref_press: jax.Array  # [mbar] (converted like the reference: bar2pa(1e-3 x))
    ref_temp: jax.Array  # [K]


def _radfn(xvi, xkt):
    """RADFN_FUN (MT_CKD400.cc:36-73), branch-free."""
    xviokt = xvi / xkt
    small = 0.5 * xviokt * xvi
    expvkt = jnp.expm1(-jnp.clip(xviokt, 0.0, 50.0))
    mid = -xvi * expvkt / (2.0 + expvkt)
    out = jnp.where(xviokt <= 0.01, small, jnp.where(xviokt <= 10.0, mid, xvi))
    return jnp.where(xkt > 0.0, out, xvi)


def _xint(p, a0, a1, a2, a3):
    """XINT_FUN 4-point interpolation (MT_CKD400.cc:76-87)."""
    C = (3.0 - 2.0 * p) * p * p
    B = 0.5 * p * (1.0 - p)
    B1 = B * (1.0 - p)
    B2 = B * p
    return -a0 * B1 + a1 * (1.0 - C + B2) + a2 * (C + B1) - a3 * B2


def _eval(f_grid, t, p_pa, vmrh2o, data, mode: str):
    """Shared MT_CKD 4.x node-table evaluation (modes: self | foreign |
    foreign_closure); the 430 scaling laws are identical to 400's
    (MT_CKD430.cc:291-296 vs MT_CKD400.cc), 430 adds the closure table."""
    v = data.wavenumbers
    dvc = v[1] - v[0]
    x = f_grid / (100.0 * const.c)  # freq2kaycm
    P0 = 1e2 * data.ref_press  # bar2pa(1e-3 * ref_press)
    T0 = data.ref_temp
    xkt = t / _RADCN2
    rho_rat = (p_pa / P0) * (T0 / t)
    num_den_cm2 = 1e-6 * vmrh2o * p_pa / (const.k * t)

    if mode == "self":
        scl_node = (
            data.self_absco_ref
            * (T0 / t) ** data.self_texp
            * vmrh2o
            * rho_rat
            * _radfn(v, xkt)
        )
    else:
        absco = (
            data.for_closure_absco_ref
            if mode == "foreign_closure"
            else data.for_absco_ref
        )
        scl_node = absco * (1.0 - vmrh2o) * rho_rat * _radfn(v, xkt)

    # 4-neighbor gather: nodes i-1, i, i+1, i+2 around x with i = floor
    i = jnp.clip(jnp.floor((x - v[0]) / dvc).astype(jnp.int32), 0, v.shape[0] - 2)
    pfrac = (x - v[i]) / dvc
    g = lambda off: scl_node[jnp.clip(i + off, 0, v.shape[0] - 1)]
    out = 1e2 * num_den_cm2 * _xint(pfrac, g(-1), g(0), g(1), g(2))
    inside = (x >= v[0]) & (x <= v[-1])
    return jnp.where(inside, jnp.maximum(out, 0.0), 0.0)


def h2o_self_mtckd400(f_grid, t, p_pa, vmrs, data: MTCKD400Data):
    """H2O-SelfContCKDMT400 absorption [1/m]."""
    return _eval(f_grid, t, p_pa, vmrs["H2O"], data, "self")


def h2o_foreign_mtckd400(f_grid, t, p_pa, vmrs, data: MTCKD400Data):
    """H2O-ForeignContCKDMT400 absorption [1/m]."""
    return _eval(f_grid, t, p_pa, vmrs["H2O"], data, "foreign")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MTCKD430Data:
    """MT_CKD430::WaterData parity (predef_data.h:30-41): 400's layout
    plus the foreign-closure reference table."""

    wavenumbers: jax.Array  # [N] uniform ascending
    self_absco_ref: jax.Array  # [N]
    for_absco_ref: jax.Array  # [N]
    for_closure_absco_ref: jax.Array  # [N]
    self_texp: jax.Array  # [N]
    ref_press: jax.Array  # [mbar]
    ref_temp: jax.Array  # [K]


def h2o_self_mtckd430(f_grid, t, p_pa, vmrs, data: MTCKD430Data):
    """H2O-SelfContCKDMT430 absorption [1/m] (MT_CKD430.cc:270)."""
    return _eval(f_grid, t, p_pa, vmrs["H2O"], data, "self")


def h2o_foreign_mtckd430(f_grid, t, p_pa, vmrs, data: MTCKD430Data):
    """H2O-ForeignContCKDMT430 absorption [1/m] (MT_CKD430.cc:180)."""
    return _eval(f_grid, t, p_pa, vmrs["H2O"], data, "foreign")


def h2o_foreign_closure_mtckd430(f_grid, t, p_pa, vmrs, data: MTCKD430Data):
    """H2O-ForeignContClosureCKDMT430 absorption [1/m] (MT_CKD430.cc:103)."""
    return _eval(f_grid, t, p_pa, vmrs["H2O"], data, "foreign_closure")
