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


def _profile_from_field(gf, key):
    """(grid, values, kind): flatten a 1D-in-altitude-or-pressure
    GriddedField dict from io.artsxml.load to a profile."""
    grids = gf["grids"]
    names = [str(n or "") for n in gf.get("gridnames", [])]
    data = np.asarray(gf["data"], np.float64).reshape(-1)
    axis0 = names[0].lower() if names else ""
    if len(grids) == 0 or data.size != np.asarray(grids[0]).size:
        raise ValueError(
            f"{key}: expected a profile varying along the first grid only "
            f"(got data size {data.size})"
        )
    grid0 = np.asarray(grids[0], np.float64)
    if axis0:
        kind = "p" if axis0.startswith("p") else "z"
    else:
        # no grid names: infer.  A strictly decreasing grid spanning
        # several decades is a pressure axis (AFGL layout); an ascending
        # one is altitude.  Anything else is ambiguous -> error, never a
        # silently wrong atmosphere.
        d = np.diff(grid0)
        if grid0.size >= 2 and np.all(d < 0) and grid0[0] > 100.0 * grid0[-1]:
            kind = "p"
        elif grid0.size < 2 or np.all(d > 0):
            kind = "z"
        else:
            raise ValueError(
                f"{key}: grid has no name and is neither ascending "
                "(altitude) nor decreasing over >2 decades (pressure); "
                "name the grid 'Pressure' or 'Altitude'"
            )
    return grid0, data, kind


def atm_field_read(
    basename,
    species,
    z_grid=None,
    missing_is_zero=False,
    ignore_missing=False,
):
    """Assemble an Atmosphere1D from an atm_fieldRead-style directory.

    Parity: m_atm.cc append_data (:63-111) — files are
    ``<basename><key>.xml`` for keys t, p and each species name, each a
    GriddedField profile; ``missing_is_zero``/``ignore_missing`` mirror
    the reference flags (missing species become zero-VMR rows or are
    dropped).  Supports altitude-gridded profiles directly and
    pressure-gridded (AFGL-style) profiles when a ``z.xml`` altitude
    field accompanies them (interpolation in log-p).  z_grid: optional
    target altitude grid; default = the t profile's grid.
    """
    import os

    from ..io.artsxml import load

    base = str(basename)
    if not os.path.isdir(base) and not os.path.isdir(os.path.dirname(base)):
        # relative basename: resolve against the data search paths
        # (planets/Earth/afgl/tropical/ style, parameters.cc semantics)
        try:
            from ..io.data import search_paths

            for root in search_paths():
                cand = os.path.join(str(root), base)
                if os.path.isdir(cand) or os.path.isdir(
                    os.path.dirname(cand)
                ):
                    base = cand
                    break
        except Exception:
            pass
    if os.path.isdir(base) and not base.endswith(os.sep):
        base = base + os.sep

    def read_key(key, required=True):
        path = f"{base}{key}.xml"
        if not os.path.exists(path):
            if os.path.exists(path + ".gz"):
                path = path + ".gz"
            elif required:
                raise FileNotFoundError(path)
            else:
                return None
        return _profile_from_field(load(path), key)

    gt = read_key("t")
    gp = read_key("p", required=False)
    gz = read_key("z", required=False)

    def z_of_p(p_axis):
        # altitudes for a pressure axis via log-p interpolation of z.xml;
        # sort by log p explicitly (np.interp silently clamps on a
        # non-ascending abscissa)
        if gz is None:
            raise FileNotFoundError(
                f"{base}z.xml needed for pressure-gridded profiles"
            )
        lp = np.log(np.asarray(gz[0], np.float64))
        o = np.argsort(lp)
        return np.interp(np.log(p_axis), lp[o], np.asarray(gz[1])[o])

    if gt[2] == "p":
        # pressure-gridded (AFGL layout): need geometric altitudes
        p_axis = gt[0]
        z_of_axis = z_of_p(p_axis)
        p_prof = p_axis
    else:
        z_of_axis = gt[0]
        p_prof = gp[1] if gp is not None else None

    order = np.argsort(z_of_axis)
    z_axis = z_of_axis[order]
    t_prof = gt[1][order]
    if z_grid is None:
        z_grid = z_axis
    z_grid = np.asarray(z_grid, np.float64)

    def onto(zsrc, vals, logp=False):
        if logp:
            return np.exp(np.interp(z_grid, zsrc, np.log(vals)))
        return np.interp(z_grid, zsrc, vals)

    t = onto(z_axis, t_prof)
    if gt[2] == "p":
        pj = jnp.asarray(onto(z_axis, p_prof[order], logp=True))
    elif gp is not None:
        # p on its own altitude grid
        zo = np.argsort(gp[0])
        pj = jnp.asarray(onto(gp[0][zo], gp[1][zo], logp=True))
    else:
        pj = hydrostatic_pressure(jnp.asarray(z_grid), jnp.asarray(t), _P0)

    rows = []
    kept = []
    for s in species:
        g = read_key(s, required=False)
        if g is None:
            if missing_is_zero:
                rows.append(np.zeros_like(z_grid))
                kept.append(s)
            elif ignore_missing:
                continue
            else:
                raise FileNotFoundError(f"{base}{s}.xml")
        else:
            zsrc, vals, kind = g
            if kind == "p":
                zsrc = z_of_p(zsrc)
            o = np.argsort(zsrc)
            rows.append(onto(zsrc[o], vals[o]))
            kept.append(s)
    return (
        Atmosphere1D(
            z=jnp.asarray(z_grid),
            t=jnp.asarray(t),
            p=pj,
            vmr=jnp.asarray(np.stack(rows) if rows else
                            np.zeros((0, z_grid.size))),
        ),
        tuple(kept),
    )
