"""Ellipsoidal geodesy (host-side numpy).

Parity reference: /root/reference/src/core/geodesy/geodetic.cpp —
geodetic <-> ECEF conversions, LOS <-> ECEF direction vectors, used by the
path construction.  Scene-build tier: numpy, not traced.
"""

import numpy as np

# WGS-84
WGS84_A = 6378137.0
WGS84_B = 6356752.314245


def ellipsoid_radii(planet="Earth"):
    return {
        "Earth": (WGS84_A, WGS84_B),
        "Mars": (3396190.0, 3376200.0),
        "Venus": (6051800.0, 6051800.0),
        "Jupiter": (71492000.0, 66854000.0),
    }[planet]


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
