"""Zeeman-split polarized O2 118-GHz radiance (full Stokes).

Mirror of examples/2-clearsky-radiative-transfer/2-zeeman: the O2 line
splits in the geomagnetic field; circular polarization (Stokes V) appears
along the field.
"""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from arts_tpu.atm import Atmosphere1D
from arts_tpu.atm.field import hydrostatic_pressure
from arts_tpu.atm.igrf import magnetic_profile
from arts_tpu.fwd import ZeemanScene, simulate_clearsky_polarized
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.zeeman import expand_zeeman
from arts_tpu.path import geometric_path_1d


def main():
    z = jnp.linspace(0.0, 100e3, 51)
    t = 288.0 - 6.5e-3 * jnp.minimum(z, 12e3) + 2e-3 * jnp.maximum(z - 50e3, 0)
    p = hydrostatic_pressure(z, t, 101325.0)
    mag = jnp.asarray(magnetic_profile(np.asarray(z), lat_deg=60.0))
    atm = Atmosphere1D(
        z=z, t=t, p=p, vmr=jnp.full((1, 51), 0.2095), mag=mag
    )
    # O2 118.75 GHz line (1- transition), Hund-case-b g ~ -2.8
    lines = [dict(
        f0=118.7503e9, a=5e-9, e0=0.0, gu=5.0, gl=3.0, iso_mass=32.0,
        iso_ratio=0.995, spec_idx=0, iso_idx=0, band_idx=0, t0=296.0,
        cutoff=np.inf, ls={"bath": {"G0": (Law.T1, [22000.0, 0.8])}},
    )]
    cat = build_catalog(lines)
    zcat = expand_zeeman(cat, ju=[1.0], jl=[1.0], gu_z=[-2.8], gl_z=[-2.77])
    scene = ZeemanScene(atm=atm, zcat=zcat, pf=rigid_rotor_table(1, 150.0, 1.0))

    path = geometric_path_1d(0.0, 0.0, 0.0, 100e3, 2000.0)  # uplooking
    f = jnp.asarray(118.7503e9 + np.linspace(-5e6, 5e6, 401))
    I = simulate_clearsky_polarized(
        scene, f, jnp.asarray(path.alt), jnp.asarray(path.za),
        jnp.asarray(path.dr), background="space",
    )
    I = np.asarray(I)
    print("max |V|/I:", float(np.abs(I[:, 3]).max() / I[:, 0].max()))
    assert np.abs(I[:, 3]).max() > 0  # circular polarization present
    return np.asarray(f), I


if __name__ == "__main__":
    main()
