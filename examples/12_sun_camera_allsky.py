"""A sun-lit all-sky camera through the measurement pipeline.

The reference drives cameras by interpolating the azimuth-resolved,
TMS/IMS-corrected DISORT radiation field at each line of sight
(spectral_radFromDisort, src/m_disort.cc:91, with the u_corr corrections
of disort.h:246-330).  Here the azimuth-resolved allsky observer does
the same: ONE DISORT solve per (scene, f_grid) group synthesizes the
Fourier series at every camera azimuth, and each pixel reads u at its
own (mu, phi) — so the scattered-sunlight halo around the solar azimuth
appears, which the azimuth-averaged u0 cannot represent.
"""

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from arts_tpu.atm.standard import standard_atmosphere
from arts_tpu.fwd_allsky import AllskyScene
from arts_tpu.path.geometry import PathGeometry
from arts_tpu.scattering import HenyeyGreenstein
from arts_tpu.sensor.measurement import (
    _simulate_batch,
    stack_azimuths,
    stack_paths,
)
from arts_tpu.sensor.observers import allsky_observer


def main():
    atm = standard_atmosphere(n_levels=40, z_top=60e3, species=("N2",))
    z = np.asarray(atm.z)
    # a thin forward-scattering haze layer
    haze = HenyeyGreenstein(
        ext=jnp.asarray(np.where(z < 3e3, 2e-5, 0.0)),
        ssa=jnp.full(z.shape, 0.85),
        g=jnp.full(z.shape, 0.7),
    )
    scene = AllskyScene(
        atm=atm, cat=None, pf=None, scatterers=(haze,),
        surface_temperature=jnp.asarray(290.0),
    )
    f = jnp.asarray([230e9])
    mu0, fbeam, phi0 = 0.5, float(np.pi), 0.0  # sun at 60 deg zenith

    # a ring of camera pixels: constant viewing zenith, sweeping azimuth
    za_look = 150.0
    azimuths = np.linspace(0.0, 180.0, 7)
    paths = [
        PathGeometry(
            alt=np.asarray([60e3, 0.0]), s=np.asarray([0.0, 60e3]),
            za=np.asarray([za_look, za_look]), background="surface", aa=a,
        )
        for a in azimuths
    ]
    obs = allsky_observer(
        nquad=16, nfourier=16, nleg=32, mu0=mu0, fbeam=fbeam, phi0=phi0,
        thermal=False,
    )
    alts, drs, zas, _ = stack_paths(paths)
    I = np.asarray(
        _simulate_batch(
            scene, f, alts, drs, zas, ["surface"] * len(paths),
            observer=obs, aas=stack_azimuths(paths),
        )
    )[:, 0]

    for a, v in zip(azimuths, I):
        bar = "#" * int(60 * v / I.max())
        print(f"  phi = {a:6.1f} deg   I = {v:.3e}  {bar}")
    # the forward-scattering halo: brightest pixel toward the sun's
    # azimuth, monotone falloff away from it
    assert I[0] == I.max()
    assert I[0] > 2.0 * I[-1]
    assert np.all(np.diff(I) < 0)
    print("sunward/antisolar contrast:", I[0] / I[-1])


if __name__ == "__main__":
    main()
