"""Ellipsoidal geodesy (host-side numpy).

Parity reference: /root/reference/src/core/geodesy/geodetic.cpp —
geodetic <-> ECEF conversions, LOS <-> ECEF direction vectors, used by the
path construction.  Scene-build tier: numpy, not traced.
"""

import numpy as np

# WGS-84
WGS84_A = 6378137.0
WGS84_B = 6356752.314245


# Body registry: (a, b, GM) per planet/moon — semi-axes [m] and the
# gravitational parameter GM [m^3/s^2] (SI; the reference's planet_data.h
# tabulates GM in km^3/s^2 and its gravity_operatorCentralMass builds
# GM = G*mass in SI, so SI is the unit actually consumed).  Io carries the
# spherical radius the reference uses in surf_fieldIo (m_planets.cc:149).
BODIES = {
    "Earth": (WGS84_A, WGS84_B, 3.98600435507e14),
    "Jupiter": (71492e3, 66854e3, 1.267127641e17),
    "Mars": (3396.19e3, 3376.20e3, 4.2828375816e13),
    "Moon": (1738.1e3, 1736.0e3, 4.902800118e12),
    "Mercury": (2439.7e3, 2439.7e3, 2.2031868551e13),
    "Venus": (6051.8e3, 6051.8e3, 3.24858592e14),
    "Saturn": (60268e3, 54364e3, 3.79405848418e16),
    "Io": (1821.6e3, 1821.6e3, 5.959916e12),
}


def ellipsoid_radii(planet="Earth"):
    """(a, b) semi-axes [m].  Parity: planet_data.h Body::* + surf_fieldIo."""
    a, b, _ = BODIES[planet]
    return a, b


def ellipsoid_gravity(planet=None, GM=None, a=None, b=None):
    """g(h, lat_deg) [m/s^2] on the ellipsoid normal at geodetic height h.

    Parity: EllipsoidGravity::operator() (functional_gravity.cpp:7-19) —
    g = GM / r^2 with r the geocentric distance of the geodetic point
    (the lon terms there collapse: cos^2 + sin^2 = 1).  Pass a planet
    name from BODIES, or explicit GM/a/b as gravity_operatorCentralMass
    does with GM = G * mass (m_planets.cc:271-278).  Works on numpy or
    traced jax arrays (pure closed form).
    """
    if planet is not None:
        a, b, GM = BODIES[planet]
    e2 = 1.0 - (b / a) ** 2

    def g(h, lat_deg=0.0, lon_deg=0.0):
        if isinstance(h, np.ndarray) or np.isscalar(lat_deg) and np.isscalar(h):
            xp = np
        else:  # traced/jax inputs (hydrostatic init under jit)
            import jax.numpy as xp
        lat = xp.deg2rad(lat_deg)
        sl = xp.sin(lat)
        cl = xp.cos(lat)
        N = a / xp.sqrt(1.0 - e2 * sl * sl)
        r2 = ((N + h) * cl) ** 2 + ((N * (1.0 - e2) + h) * sl) ** 2
        return GM / r2

    return g


def geodetic2ecef(lat_deg, lon_deg, alt, a=WGS84_A, b=WGS84_B):
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    e2 = 1.0 - (b / a) ** 2
    N = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
    x = (N + alt) * np.cos(lat) * np.cos(lon)
    y = (N + alt) * np.cos(lat) * np.sin(lon)
    z = (N * (1.0 - e2) + alt) * np.sin(lat)
    return np.stack([x, y, z], axis=-1)


def ecef2geodetic(xyz, a=WGS84_A, b=WGS84_B, iters=5):
    """Iterative (Bowring-style) inverse; mm accuracy in a few iterations."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    e2 = 1.0 - (b / a) ** 2
    lat = np.arctan2(z, p * (1.0 - e2))
    for _ in range(iters):
        N = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
        alt = p / np.cos(lat) - N
        lat = np.arctan2(z, p * (1.0 - e2 * N / (N + alt)))
    N = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
    alt = p / np.cos(lat) - N
    return np.rad2deg(lat), np.rad2deg(lon), alt


def enu_basis(lat_deg, lon_deg):
    """(east, north, up) unit vectors in ECEF at a geodetic position."""
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    e = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], -1)
    n = np.stack(
        [-np.sin(lat) * np.cos(lon), -np.sin(lat) * np.sin(lon), np.cos(lat)], -1
    )
    u = np.stack(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)], -1
    )
    return e, n, u


def los2ecef(lat_deg, lon_deg, za_deg, aa_deg):
    """LOS (zenith, azimuth in deg; ARTS convention: azimuth from North,
    East positive) -> ECEF unit direction."""
    e, n, u = enu_basis(lat_deg, lon_deg)
    za = np.deg2rad(za_deg)
    aa = np.deg2rad(aa_deg)
    d = (
        np.sin(za)[..., None] * (np.sin(aa)[..., None] * e + np.cos(aa)[..., None] * n)
        + np.cos(za)[..., None] * u
    )
    return d


def ecef2los(pos_ecef, dir_ecef, a=WGS84_A, b=WGS84_B):
    """(za, aa) of a propagation direction at an ECEF position."""
    lat, lon, _ = ecef2geodetic(pos_ecef, a, b)
    e, n, u = enu_basis(lat, lon)
    de = np.sum(dir_ecef * e, -1)
    dn = np.sum(dir_ecef * n, -1)
    du = np.sum(dir_ecef * u, -1)
    za = np.rad2deg(np.arccos(np.clip(du, -1.0, 1.0)))
    aa = np.rad2deg(np.arctan2(de, dn))
    return za, aa
