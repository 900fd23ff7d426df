"""High-level recipe operators.

Parity reference: python/src/pyarts3/recipe/ — `AtmosphericFlux`
(AtmosphericFlux.py:21: spectral + profile up/down flux from a 1D
atmosphere via DISORT), `SpectralAtmosphericFlux`, and
`SingleSpeciesAbsorption`.  Each reference recipe wraps a workspace; here
each is a thin frozen-config callable over the pure operators.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fwd_allsky import AllskyScene, simulate_allsky
from .lbl.voigt import absorption


@dataclasses.dataclass(frozen=True)
class AtmosphericFlux:
    """Upwelling/downwelling flux profiles for a scene.

    Parity: pyarts3.recipe.AtmosphericFlux — returns per-level up/down
    (diffuse + direct) fluxes, here both spectral and band-integrated.
    """

    scene: AllskyScene
    nquad: int = 16
    mu0: float = 0.0
    fbeam: float = 0.0

    def __call__(self, f_grid):
        out = simulate_allsky(
            self.scene,
            jnp.asarray(f_grid),
            nquad=self.nquad,
            nfourier=1,
            mu0=self.mu0,
            fbeam=self.fbeam,
        )
        up = out.flux_up  # [F, L+1]
        down = out.flux_down_diffuse + out.flux_direct
        return dict(
            spectral_up=up,
            spectral_down=down,
            up=jnp.trapezoid(up, jnp.asarray(f_grid), axis=0),
            down=jnp.trapezoid(down, jnp.asarray(f_grid), axis=0),
            altitude=self.scene.atm.z[::-1],
        )


@dataclasses.dataclass(frozen=True)
class SingleSpeciesAbsorption:
    """Absorption coefficient of one species on demand.

    Parity: pyarts3.recipe.SingleSpeciesAbsorption.
    """

    cat: object
    pf: object

    def __call__(self, f_grid, t, p, vmr):
        return absorption(
            jnp.asarray(f_grid), self.cat, self.pf, t, p, jnp.asarray(vmr)
        )


@dataclasses.dataclass(frozen=True)
class SpectralAtmosphericFlux:
    """Spectral up/down flux profiles with the Czarnecki two-band scheme.

    Parity: pyarts3.recipe.SpectralAtmosphericFlux — a thermal DISORT run
    (thermal surface reflectivity, no beam) plus a solar-band run (visible
    surface reflectivity, solar beam at the geometric zenith angle between
    the profile location and the sub-solar point, thermal emission off).
    """

    scene: AllskyScene
    nquad: int = 16
    visible_surf_reflectivity: float = 0.3
    thermal_surf_reflectivity: float = 0.05
    atm_latitude: float = 0.0
    atm_longitude: float = 0.0
    solar_latitude: float = 0.0
    solar_longitude: float = 0.0
    sun: Optional[object] = None  # arts_tpu.sun.Sun; None = thermal only

    def _mu0(self):
        la, lo = np.deg2rad(self.atm_latitude), np.deg2rad(self.atm_longitude)
        ls, os_ = np.deg2rad(self.solar_latitude), np.deg2rad(self.solar_longitude)
        cosang = np.sin(la) * np.sin(ls) + np.cos(la) * np.cos(ls) * np.cos(
            lo - os_
        )
        return float(max(cosang, 0.0))

    def __call__(self, f_grid):
        f_grid = jnp.asarray(f_grid)
        sc_th = dataclasses.replace(
            self.scene,
            surface_albedo=jnp.asarray(self.thermal_surf_reflectivity),
        )
        out_t = simulate_allsky(sc_th, f_grid, nquad=self.nquad, nfourier=1)
        up = out_t.flux_up
        down = out_t.flux_down_diffuse + out_t.flux_direct

        mu0 = self._mu0()
        if self.sun is not None and mu0 > 0.0:
            fbeam = (
                self.sun.toa_flux()
                if hasattr(self.sun, "toa_flux")
                else jnp.asarray(self.sun)
            )
            sc_vi = dataclasses.replace(
                self.scene,
                surface_albedo=jnp.asarray(self.visible_surf_reflectivity),
            )
            out_s = simulate_allsky(
                sc_vi, f_grid, nquad=self.nquad, nfourier=1, mu0=mu0,
                fbeam=fbeam, thermal=False,
            )
            up = up + out_s.flux_up
            down = down + out_s.flux_down_diffuse + out_s.flux_direct

        return dict(
            spectral_up=up,
            spectral_down=down,
            altitude=self.scene.atm.z[::-1],
            mu0=mu0,
        )
