"""Solar source: spectrum, geometry, pencil-beam hit tests.

Parity reference: /root/reference/src/core/sun/sun.{h,cc} — `Sun`
{spectrum, radius, distance, latitude, longitude}, constructed from a
blackbody or a gridded spectrum (m_sun.cc sunBlackbody :73 /
sunFromGrid :41), the LOS hit test `hit_sun` (sun.cc:276-315), the
radiance-to-irradiance solid-angle factor `sin_alpha_squared`
(sun.cc:317-334), and the sun-or-CMB path background
(`set_spectral_rad_if_sun_intersection`, sun.cc:337-365; WSM
`spectral_radSunOrCosmicBackground`, workspace_methods.cpp:4858).

Convention: `spectrum` stores the RADIANCE at the photosphere
[W/(m^2 Hz sr)] — the reference stores pi x this (outgoing flux); the
mapping is exact: reference `sun.spectrum/pi` == our `spectrum`, and
fbeam == our `toa_flux()`.
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
    """Sun as seen from the scene: photosphere radiance + geometry."""

    spectrum: jax.Array  # [F] radiance at the sun's surface [W/(m^2 Hz sr)]
    radius: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(SUN_RADIUS)
    )
    distance: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(AU)
    )
    latitude: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0)
    )
    longitude: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0)
    )

    def toa_flux(self):
        """Beam flux at TOA perpendicular to the beam [W/(m^2 Hz)] —
        DISORT's fbeam: radiance x solid angle of the solar disk."""
        sin2 = (self.radius / self.distance) ** 2
        return self.spectrum * jnp.pi * sin2

    def sin_alpha_squared(self):
        """sin^2 of the solar angular radius: radius^2/(radius^2 + d^2)
        (sun.cc:317-334; the radiance -> irradiance factor is pi x this)."""
        r2 = self.radius * self.radius
        return r2 / (r2 + self.distance * self.distance)

    def angular_radius(self):
        """Apparent angular radius [rad] (sun.cc:312 alpha)."""
        return jnp.arctan2(self.radius, self.distance)


def sun_blackbody(f_grid, t=SUN_TEMPERATURE, radius=SUN_RADIUS, distance=AU,
                  latitude=0.0, longitude=0.0):
    """Blackbody sun (m_sun.cc sunBlackbody parity)."""
    return Sun(
        spectrum=planck(jnp.asarray(f_grid), t),
        radius=jnp.asarray(radius),
        distance=jnp.asarray(distance),
        latitude=jnp.asarray(latitude),
        longitude=jnp.asarray(longitude),
    )


def sun_from_grid(
    f_grid,
    spectrum_f,
    spectrum_vals,
    temperature=SUN_TEMPERATURE,
    radius=SUN_RADIUS,
    distance=AU,
    latitude=0.0,
    longitude=0.0,
):
    """Sun from a gridded photosphere spectrum (m_sun.cc sunFromGrid :41).

    spectrum_f/spectrum_vals: the raw spectral grid and the outgoing
    FLUX at the photosphere [W/(m^2 Hz)] (the reference's GriddedField2
    convention); interpolated linearly onto f_grid.  Frequencies outside
    the gridded range fall back to the blackbody at `temperature`
    (regrid_sun_spectrum, sun.cc:215-258 uses the same planck fill).
    """
    f_grid = jnp.asarray(f_grid)
    sf = jnp.asarray(spectrum_f)
    sv = jnp.asarray(spectrum_vals)
    rad = jnp.interp(f_grid, sf, sv) / jnp.pi  # flux -> radiance
    bb = planck(f_grid, jnp.asarray(temperature))
    inside = (f_grid >= sf[0]) & (f_grid <= sf[-1])
    return Sun(
        spectrum=jnp.where(inside, rad, bb),
        radius=jnp.asarray(radius),
        distance=jnp.asarray(distance),
        latitude=jnp.asarray(latitude),
        longitude=jnp.asarray(longitude),
    )


def angular_separation(za1_deg, aa1_deg, za2_deg, aa2_deg):
    """Angle [rad] between two LOS directions given as (za, aa) degrees."""
    za1 = jnp.deg2rad(za1_deg)
    za2 = jnp.deg2rad(za2_deg)
    daa = jnp.deg2rad(aa1_deg) - jnp.deg2rad(aa2_deg)
    c = jnp.cos(za1) * jnp.cos(za2) + jnp.sin(za1) * jnp.sin(za2) * jnp.cos(daa)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def hit_sun_los(sun: Sun, los_za_deg, los_aa_deg, sun_za_deg, sun_aa_deg):
    """(beta, hit): is the sun inside the beam looking along (za, aa)?

    1D-geometry form of the reference hit test (sun.cc:276-315): beta is
    the angle between the viewing direction and the direction to the sun
    (both local (za, aa), degrees); hit when beta <= the solar angular
    radius.  All jnp; `hit` is a boolean array.
    """
    beta = angular_separation(los_za_deg, los_aa_deg, sun_za_deg, sun_aa_deg)
    return beta, beta <= sun.angular_radius()


def hit_sun(sun: Sun, pos_alt_lat_lon, los_za_aa, ellipsoid_radius):
    """Full geodetic hit test (sun.cc hit_sun :276): beta between the LOS
    from `pos` and the line to the sun's center, hit if beta <= alpha.

    pos_alt_lat_lon: (alt [m], lat [deg], lon [deg]); los_za_aa:
    viewing direction (za, aa) degrees; ellipsoid_radius: local planet
    radius [m] (spherical; the reference's refell2r).
    """
    alt, lat, lon = pos_alt_lat_lon
    za, aa = los_za_aa

    def sph2cart(r, lat_deg, lon_deg):
        latr = jnp.deg2rad(lat_deg)
        lonr = jnp.deg2rad(lon_deg)
        return jnp.stack(
            [
                r * jnp.cos(latr) * jnp.cos(lonr),
                r * jnp.cos(latr) * jnp.sin(lonr),
                r * jnp.sin(latr),
            ],
            -1,
        )

    r_rte = ellipsoid_radius + alt
    p_sun = sph2cart(sun.distance, sun.latitude, sun.longitude)
    p_rte = sph2cart(r_rte, lat, lon)
    # LOS unit vector in ECEF from local (za, aa) (sun.cc poslos2cart)
    latr = jnp.deg2rad(lat)
    lonr = jnp.deg2rad(lon)
    zar = jnp.deg2rad(za)
    aar = jnp.deg2rad(aa)
    up = jnp.stack(
        [jnp.cos(latr) * jnp.cos(lonr), jnp.cos(latr) * jnp.sin(lonr),
         jnp.sin(latr)], -1
    )
    north = jnp.stack(
        [-jnp.sin(latr) * jnp.cos(lonr), -jnp.sin(latr) * jnp.sin(lonr),
         jnp.cos(latr)], -1
    )
    east = jnp.stack([-jnp.sin(lonr), jnp.cos(lonr), jnp.zeros_like(lonr)], -1)
    k = (
        jnp.cos(zar)[..., None] * up
        + (jnp.sin(zar) * jnp.cos(aar))[..., None] * north
        + (jnp.sin(zar) * jnp.sin(aar))[..., None] * east
    )
    d = p_sun - p_rte
    r_ps = jnp.linalg.norm(d, axis=-1)
    cosb = jnp.clip(
        jnp.sum(d * k, -1) / (r_ps * jnp.linalg.norm(k, axis=-1)), -1.0, 1.0
    )
    beta = jnp.arccos(cosb)
    alpha = jnp.arctan2(sun.radius, r_ps)
    return beta, beta <= alpha


def sun_background_radiance(sun: Sun, f_grid, hit, cmb=None):
    """Sun-or-CMB path background (spectral_radSunOrCosmicBackground).

    hit: boolean (from hit_sun/hit_sun_los).  Returns [F] radiance:
    the photosphere radiance where hit, CMB Planck otherwise
    (sun.cc:337-365 uses spectrum/pi of the flux convention — identical
    to our stored radiance)."""
    if cmb is None:
        cmb = planck(
            f_grid,
            jnp.asarray(const.cosmic_microwave_background_temperature),
        ) * jnp.ones_like(f_grid)
    return jnp.where(hit, sun.spectrum, cmb)


def solar_geometry(sun_zenith_deg, sun_azimuth_deg=0.0):
    """(mu0, phi0) for the DISORT beam from solar angles."""
    mu0 = float(np.cos(np.deg2rad(sun_zenith_deg)))
    return max(mu0, 0.0), float(sun_azimuth_deg)
