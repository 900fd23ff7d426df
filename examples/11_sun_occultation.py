"""Solar occultation and scattered sunlight in the pencil beam.

Two geometries the reference drives through
spectral_radSunOrCosmicBackground + the first-order-Rayleigh scattered
sun (workspace_methods.cpp:4858, m_sun.cc:306-436):

1. A limb sounder stares THROUGH the atmosphere at the sun: the
   radiance is the solar photosphere spectrum attenuated by the
   Beer-Lambert transmittance of the limb path (183-GHz H2O absorption
   carves the line into the solar continuum).
2. A ground observer looks up at a clear sky AWAY from the sun in the
   visible: single-Rayleigh-scattered sunlight (blue sky) dominates the
   (negligible) thermal emission.
"""

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from arts_tpu.atm.standard import standard_atmosphere
from arts_tpu.fwd import ClearskyScene, simulate_clearsky
from arts_tpu.path import geometric_path_1d
from arts_tpu.sun import sun_blackbody


def main():
    atm = standard_atmosphere(n_levels=60, z_top=80e3, species=("N2", "O2", "H2O"))
    scene = ClearskyScene(
        atm=atm, cat=None, pf=None,
        predef=("H2O-PWR98",), species_names=("N2", "O2", "H2O"),
    )

    # --- occultation: limb path ending in space, sun on the axis ---
    f = jnp.linspace(175e9, 191e9, 129)
    path = geometric_path_1d(600e3, 113.72, 0.0, 80e3, max_step=2e3)  # ~12 km tangent
    assert path.background == "space"
    sun = sun_blackbody(f)
    I = simulate_clearsky(
        scene, f, jnp.asarray(path.alt), jnp.asarray(path.dr),
        path_za=jnp.asarray(path.za),
        sun=sun, sun_za=float(path.za[-1]), sun_aa=0.0,
    )
    trans = np.asarray(I / sun.spectrum)
    i183 = int(np.argmin(np.abs(np.asarray(f) - 183.31e9)))
    print(f"occultation transmittance: window {trans[0]:.3f}, "
          f"183-GHz line center {trans[i183]:.3e}")

    # --- blue sky: visible frequencies, sun 40 deg off the view axis ---
    # (gas models are microwave-band; the visible run is Rayleigh-only)
    vis_scene = ClearskyScene(atm=atm, cat=None, pf=None)
    fv = jnp.linspace(4.3e14, 5.8e14, 33)  # ~520-700 nm
    up = geometric_path_1d(0.0, 20.0, 0.0, 80e3, max_step=2e3)
    sunv = sun_blackbody(fv)
    I_sky = simulate_clearsky(
        vis_scene, fv, jnp.asarray(up.alt), jnp.asarray(up.dr),
        path_za=jnp.asarray(up.za),
        sun=sunv, sun_za=55.0, sun_aa=120.0, scattered_sun=True,
    )
    lam_nm = 299792458.0 / np.asarray(fv) * 1e9
    ratio = np.asarray(I_sky) / np.asarray(sunv.spectrum)
    blue = ratio[lam_nm < 560].mean()
    red = ratio[lam_nm > 650].mean()
    print(f"sky/sun radiance ratio: blue {blue:.2e}, red {red:.2e}, "
          f"blue/red {blue / red:.2f} (Rayleigh ~ lambda^-4 slope)")
    assert blue > red  # the sky is blue
    return I, I_sky


if __name__ == "__main__":
    main()
