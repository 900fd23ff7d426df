"""Mars nadir water-vapor sounding from a legacy ARTSCAT catalog.

Mirror of the reference's planetary test (tests/core/mars/cat.py): a
non-Earth body end to end — Mars ellipsoid + GM/r^2 gravity
(planet_data.h, functional_gravity.cpp) building a hydrostatic CO2
atmosphere, an ARTSCAT-3 H2O line list (the format the Perrin planetary
spectroscopy ships in, xml_io_old.cc) around the 557 GHz water line, and
the clear-sky pencil-beam radiance from 200 km looking down.  Fully
offline: the catalog is inline.
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from arts_tpu.atm.field import Atmosphere1D, hydrostatic_pressure
from arts_tpu.fwd import ClearskyScene, simulate_clearsky_bt
from arts_tpu.io.artscat import read_artscat
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.path.geodesy import ellipsoid_gravity, ellipsoid_radii

# The 556.936 GHz H2O line plus two neighbours, ARTSCAT-3 records
# (@ ARTSID f0 psf I0 T0 e0 agam sgam nair nself tgam naux)
_CATALOG = """<arts>
<ArrayOfLineRecord version="ARTSCAT-3" nelem="3">
@ H2O-161 5.5693599e+11 -300.0 1.2e-15 296.0 4.4e-22 95000.0 480000.0 0.75 1.0 296.0 0
@ H2O-161 5.474e+11 -200.0 4.0e-18 296.0 1.4e-21 90000.0 450000.0 0.70 0.9 296.0 0
@ H2O-161 5.658e+11 -250.0 6.0e-18 296.0 1.1e-21 92000.0 460000.0 0.72 0.9 296.0 0
</ArrayOfLineRecord>
</arts>
"""

Q296_H2O = 174.6


def mars_atmosphere(n_levels=81, z_top=60e3):
    """CO2-dominated hydrostatic Mars profile (Ls0-like: 210 K surface,
    636 Pa, GM/r^2 gravity of the Mars ellipsoid)."""
    z = jnp.linspace(0.0, z_top, n_levels)
    t = jnp.maximum(210.0 - 1.5e-3 * z, 140.0)  # weak tropospheric lapse
    p = hydrostatic_pressure(
        z, t, 636.0, mean_mass_gmol=43.34,
        gravity=ellipsoid_gravity("Mars"), lat_deg=0.0,
    )
    vmr = jnp.stack([
        jnp.full_like(z, 150e-6),  # H2O ~150 ppmv
        jnp.full_like(z, 0.95),    # CO2
    ])
    return Atmosphere1D(z=z, t=t, p=p, vmr=vmr)


def main():
    a_mars, b_mars = ellipsoid_radii("Mars")
    print(f"Mars ellipsoid a={a_mars/1e3:.1f} km b={b_mars/1e3:.1f} km, "
          f"g(surface)={ellipsoid_gravity('Mars')(0.0, 0.0):.3f} m/s^2")

    atm = mars_atmosphere()
    lines = read_artscat(_CATALOG, ["H2O", "CO2"], q_t0={"H2O-161": Q296_H2O})
    cat = build_catalog(lines)
    pf = rigid_rotor_table(1, [Q296_H2O], 1.5)

    scene = ClearskyScene(
        atm=atm, cat=cat, pf=pf,
        surface_temperature=jnp.asarray(210.0),
        species_names=("H2O", "CO2"),
    )

    f0 = 556.935985e9
    f_grid = f0 + jnp.linspace(-5e9, 5e9, 101)
    # nadir path from 200 km: only the atmospheric part below 60 km matters
    path_alt = atm.z[::-1]
    path_dr = -jnp.diff(atm.z[::-1])

    tb = simulate_clearsky_bt(
        scene, f_grid, path_alt, path_dr, background="surface"
    )
    tb = np.asarray(tb)

    i0 = int(np.argmin(np.abs(np.asarray(f_grid) - f0)))
    print(f"TB at line center  : {tb[i0]:8.3f} K")
    print(f"TB in window       : {tb[0]:8.3f} K")
    # the cold upper-level line forms against the warm surface: the line
    # center must be colder than the window, both within the T range
    assert tb[i0] < tb[0] - 1.0
    assert 135.0 < tb[i0] < 215.0 and 180.0 < tb[0] <= 211.0
    return tb


if __name__ == "__main__":
    main()
