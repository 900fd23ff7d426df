"""Pencil-beam propagation-path geometry (host-side construction).

Parity reference: /root/reference/src/core/path/path_point.h —
`set_geometric_extremes` / `fill_geometric_stepwise` build a list of
`PropagationPathPoint`s {pos, los} from an observer position and
line-of-sight through a spherical-shell atmosphere, terminated at the
surface or top-of-atmosphere, refined to a maximum step length.

TPU-native split: geometry is *scene construction* — computed once on the
host in numpy, producing fixed-size arrays that become static-shape inputs
to the jitted simulate().  (ARTS likewise treats the path as fixed during
Jacobian evaluation, src/m_spectral_radiance.cc:118-127.)  Spherical
geometry (no refraction) first; refraction is an iterative host-side
extension.  Geometries are batchable: paths padded to a common n_points
with zero-length segments (dr = 0 contributes identity transmittance).
"""

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class PathGeometry:
    """A single pencil-beam path, observer first.

    alt: [np] altitudes; s: [np] distance from observer; za: [np] local
    zenith angle of the propagation direction (degrees, ARTS convention:
    0 = upward); background: "space" | "surface".
    """

    alt: np.ndarray
    s: np.ndarray
    za: np.ndarray
    background: str
    aa: np.ndarray | float | None = None  # line-of-sight azimuth [deg]

    @property
    def n_points(self):
        return self.alt.shape[0]

    @property
    def dr(self):
        """Layer lengths between consecutive points [np-1]."""
        return np.diff(self.s)


EARTH_RADIUS = 6_371_000.0  # mean sphere; full ellipsoid via geodesy module


def geometric_path_1d(
    alt_obs: float,
    za_obs: float,
    z_surf: float,
    z_toa: float,
    max_step: float = 1000.0,
    radius: float = EARTH_RADIUS,
) -> PathGeometry:
    """Geometric path for a 1D (spherically symmetric) atmosphere.

    za_obs: observer line-of-sight zenith angle in degrees
    (180 = straight down, 0 = straight up). Observer may be inside or
    above the atmosphere; the returned points span only [z_surf, z_toa].
    """
    r_obs = radius + alt_obs
    r_surf = radius + z_surf
    r_toa = radius + z_toa
    za = np.deg2rad(za_obs)
    # impact parameter (conserved in spherical geometry)
    pconst = r_obs * np.sin(za)

    def r_of_s(s):
        # distance s along LOS from the observer; angle za from local zenith
        return np.sqrt(r_obs**2 + s**2 + 2.0 * r_obs * s * np.cos(za))

    def s_of_r(r, branch):
        # solutions of r(s) = r: s = -r_obs cos(za) ± sqrt(r^2 - pconst^2)
        root = np.sqrt(np.maximum(r**2 - pconst**2, 0.0))
        return -r_obs * np.cos(za) + branch * root

    looking_down = za_obs > 90.0
    if looking_down:
        r_tan = pconst  # tangent radius
        if r_tan >= r_toa:
            raise ValueError("path misses the atmosphere entirely")
        if r_tan <= r_surf:
            background = "surface"
            s_end = s_of_r(r_surf, -1.0)  # first (near) surface intersection
        else:
            background = "space"  # limb: down through tangent, back out to TOA
            s_end = s_of_r(r_toa, +1.0)
        s_start = 0.0 if r_obs <= r_toa else s_of_r(r_toa, -1.0)
    else:
        background = "space"
        if r_obs >= r_toa:
            raise ValueError("upward-looking observer above TOA sees no atmosphere")
        s_start = 0.0
        s_end = s_of_r(r_toa, +1.0)

    n = int(np.ceil((s_end - s_start) / max_step)) + 1
    n = max(n, 2)
    s = np.linspace(s_start, s_end, n)
    r = r_of_s(s)
    alt = r - radius
    # local zenith angle of propagation: sin(za_local) = pconst / r, with the
    # branch picked by whether we are before or past the tangent point
    sin_za = np.clip(pconst / r, 0.0, 1.0)
    za_local = np.rad2deg(np.arcsin(sin_za))
    if looking_down:
        s_tan = -r_obs * np.cos(za)  # distance to the tangent point
        za_local = np.where(s < s_tan, 180.0 - za_local, za_local)
    # numerical cleanup at the endpoints
    alt = np.clip(alt, z_surf, z_toa)
    return PathGeometry(alt=alt, s=s - s_start, za=za_local, background=background)


@dataclasses.dataclass(frozen=True)
class PathGeometry3D:
    """A pencil beam through a 3D atmosphere, observer first.

    Parity: the reference's PropagationPathPoint {pos(alt,lat,lon),
    los(zen,azi)} arrays (src/core/path/path_point.h:14) built by
    set_geometric_extremes + fill_geometric_stepwise; spherical planet
    (the ellipsoidal variant goes through path/geodesy).
    """

    alt: np.ndarray  # [np]
    lat: np.ndarray  # [np] degrees
    lon: np.ndarray  # [np] degrees
    s: np.ndarray  # [np] distance from observer
    za: np.ndarray  # [np] local propagation zenith angle [deg]
    aa: np.ndarray  # [np] local propagation azimuth [deg, N=0, E=90]
    background: str

    @property
    def n_points(self):
        return self.alt.shape[0]

    @property
    def dr(self):
        return np.diff(self.s)


def _sph_ecef(lat_deg, lon_deg, r):
    la, lo = np.deg2rad(lat_deg), np.deg2rad(lon_deg)
    cl = np.cos(la)
    return np.stack(
        [r * cl * np.cos(lo), r * cl * np.sin(lo), r * np.sin(la)], axis=-1
    )


def _enu_at(lat_deg, lon_deg):
    la, lo = np.deg2rad(lat_deg), np.deg2rad(lon_deg)
    sl, cl = np.sin(la), np.cos(la)
    so, co = np.sin(lo), np.cos(lo)
    e = np.stack([-so, co, np.zeros_like(so)], axis=-1)
    n = np.stack([-sl * co, -sl * so, cl], axis=-1)
    u = np.stack([cl * co, cl * so, sl], axis=-1)
    return e, n, u


def geometric_path_3d(
    alt_obs: float,
    lat_obs: float,
    lon_obs: float,
    za_obs: float,
    aa_obs: float,
    z_surf: float,
    z_toa: float,
    max_step: float = 1000.0,
    radius: float = EARTH_RADIUS,
) -> PathGeometry3D:
    """Geometric (straight-line) path through a 3D atmosphere on a sphere.

    za_obs/aa_obs: observer LOS zenith/azimuth [deg] (ARTS convention:
    za 0 = up, 180 = down; aa 0 = north, 90 = east).  Points span
    [z_surf, z_toa] only; background is "surface" or "space".
    """
    r_obs = radius + alt_obs
    p0 = _sph_ecef(lat_obs, lon_obs, r_obs)
    e, n, u = _enu_at(lat_obs, lon_obs)
    za, aa = np.deg2rad(za_obs), np.deg2rad(aa_obs)
    d = (
        np.sin(za) * np.sin(aa) * e
        + np.sin(za) * np.cos(aa) * n
        + np.cos(za) * u
    )
    d = d / np.linalg.norm(d)

    r_surf, r_toa = radius + z_surf, radius + z_toa
    b = float(p0 @ d)  # = -r_obs cos(theta to zenith at obs)
    c_ = float(p0 @ p0)

    def s_of_r(rt, branch):
        disc = b * b - (c_ - rt * rt)
        return -b + branch * np.sqrt(max(disc, 0.0))

    r_tan = np.sqrt(max(c_ - b * b, 0.0)) if b < 0 else np.sqrt(c_)
    looking_down = za_obs > 90.0
    if looking_down:
        if r_tan >= r_toa:
            raise ValueError("path misses the atmosphere entirely")
        if b * b >= (c_ - r_surf * r_surf) and c_ - r_surf * r_surf >= 0 and (
            b < 0
        ):
            background = "surface"
            s_end = s_of_r(r_surf, -1.0)
        else:
            background = "space"
            s_end = s_of_r(r_toa, +1.0)
        s_start = 0.0 if r_obs <= r_toa else s_of_r(r_toa, -1.0)
    else:
        if r_obs >= r_toa:
            raise ValueError("upward-looking observer above TOA sees no atmosphere")
        background = "space"
        s_start, s_end = 0.0, s_of_r(r_toa, +1.0)

    n_pts = max(int(np.ceil((s_end - s_start) / max_step)) + 1, 2)
    s = np.linspace(s_start, s_end, n_pts)
    p = p0[None, :] + s[:, None] * d[None, :]
    r = np.linalg.norm(p, axis=-1)
    alt = np.clip(r - radius, z_surf, z_toa)
    lat = np.rad2deg(np.arcsin(np.clip(p[:, 2] / r, -1.0, 1.0)))
    lon = np.rad2deg(np.arctan2(p[:, 1], p[:, 0]))

    ep, npv, up = _enu_at(lat, lon)
    de = np.sum(d * ep, axis=-1)
    dn = np.sum(d * npv, axis=-1)
    du = np.sum(d * up, axis=-1)
    za_l = np.rad2deg(np.arccos(np.clip(du, -1.0, 1.0)))
    aa_l = np.rad2deg(np.arctan2(de, dn))

    return PathGeometry3D(
        alt=alt, lat=lat, lon=lon, s=s - s_start, za=za_l, aa=aa_l,
        background=background,
    )
