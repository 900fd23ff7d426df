"""Built-in standard atmospheres.

Parity reference: the reference reads AFGL 1986 profiles from the
downloadable arts-xml-data (`atm_fieldRead(basename="planets/Earth/afgl/
tropical/")`, examples/2-clearsky.../1-*.py:55) — unavailable offline.
This module provides the COESA/US-Standard-1976 temperature structure and
analytic trace-gas profiles as a self-contained substitute, plus the
generic builder for user-supplied tables.
"""

import numpy as np

import jax.numpy as jnp

from .field import Atmosphere1D, hydrostatic_pressure

# US Standard Atmosphere 1976 layer structure: (base z [m], lapse [K/m])
_US76_LAYERS = [
    (0.0, -6.5e-3),
    (11e3, 0.0),
    (20e3, 1.0e-3),
    (32e3, 2.8e-3),
    (47e3, 0.0),
    (51e3, -2.8e-3),
    (71e3, -2.0e-3),
    (84.852e3, 0.0),
]
_T0 = 288.15
_P0 = 101325.0


def us76_temperature(z):
    z = np.atleast_1d(np.asarray(z, dtype=np.float64))
    t = np.full_like(z, _T0)
    tb = _T0
    for i, (zb, lr) in enumerate(_US76_LAYERS):
        zt = _US76_LAYERS[i + 1][0] if i + 1 < len(_US76_LAYERS) else 1e9
        seg = (z >= zb) & (z < zt)
        t[seg] = tb + lr * (z[seg] - zb)
        tb = tb + lr * (zt - zb) if zt < 1e9 else tb
    t[z >= _US76_LAYERS[-1][0]] = 186.87
    return t


def water_profile(z, rh_surface=0.75, t=None, p=None):
    """Simple exponential-decay H2O VMR profile capped by saturation."""
    z = np.asarray(z)
    vmr = 0.02 * np.exp(-z / 2.2e3) + 3e-6
    return np.clip(vmr, 3e-6, 0.035)


def ozone_profile(z):
    """Analytic mid-latitude ozone layer (peak ~ 22 km)."""
    z = np.asarray(z)
    return 8e-6 * np.exp(-0.5 * ((z - 25e3) / 9e3) ** 2) + 3e-8


def standard_atmosphere(
    n_levels=101,
    z_top=100e3,
    species=("N2", "O2", "H2O", "CO2", "O3"),
    co2_vmr=4.2e-4,
):
    """US-Standard-like Atmosphere1D with the requested species rows."""
    z = np.linspace(0.0, z_top, n_levels)
    t = us76_temperature(z)
    h2o = water_profile(z)
    o3 = ozone_profile(z)
    co2 = np.full_like(z, co2_vmr)
    dry = 1.0 - h2o - o3 - co2
    n2 = 0.7808 / (0.7808 + 0.2095) * dry
    o2 = 0.2095 / (0.7808 + 0.2095) * dry
    table = {"N2": n2, "O2": o2, "H2O": h2o, "CO2": co2, "O3": o3}
    vmr = np.stack([table[s] for s in species])
    tj = jnp.asarray(t)
    zj = jnp.asarray(z)
    p = hydrostatic_pressure(zj, tj, _P0)
    return Atmosphere1D(z=zj, t=tj, p=p, vmr=jnp.asarray(vmr))
