"""Solar source.

Parity reference: /root/reference/src/core/sun/sun.h:31-48 — `Sun`
{spectrum, radius, distance, lat/lon}, constructed from a blackbody or a
gridded spectrum (m_sun.cc sunBlackbody / sunFromGrid); feeds the DISORT
beam source (mu0, I0, phi0) via disort_settingsSetSun.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as const
from .ops.planck import planck

SUN_RADIUS = 6.963242e8  # [m] (ARTS default)
AU = 1.495978707e11  # [m]
SUN_TEMPERATURE = 5772.0  # [K]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Sun:
    """Sun as seen from the scene: TOA beam flux spectrum + geometry."""

    spectrum: jax.Array  # [F] radiance at the sun's surface [W/(m^2 Hz sr)]
    radius: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(SUN_RADIUS)
    )
    distance: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(AU)
    )

    def toa_flux(self):
        """Beam flux at TOA perpendicular to the beam [W/(m^2 Hz)] —
        DISORT's fbeam: radiance x solid angle of the solar disk."""
        sin2 = (self.radius / self.distance) ** 2
        return self.spectrum * jnp.pi * sin2


def sun_blackbody(f_grid, t=SUN_TEMPERATURE, radius=SUN_RADIUS, distance=AU):
    """Blackbody sun (m_sun.cc sunBlackbody parity)."""
    return Sun(
        spectrum=planck(jnp.asarray(f_grid), t),
        radius=jnp.asarray(radius),
        distance=jnp.asarray(distance),
    )


def solar_geometry(sun_zenith_deg, sun_azimuth_deg=0.0):
    """(mu0, phi0) for the DISORT beam from solar angles."""
    mu0 = float(np.cos(np.deg2rad(sun_zenith_deg)))
    return max(mu0, 0.0), float(sun_azimuth_deg)
