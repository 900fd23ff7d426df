"""Geomagnetic field: full IGRF-13 spherical-harmonic model + dipole tier.

Parity reference: /root/reference/src/core/igrf/igrf13.cpp — degree-13
Schmidt-normalized Gauss-coefficient field, epochs 2000-2020 with linear
time blending, evaluated in geocentric coordinates and rotated to the
geodetic frame.  The coefficient tables (standard published IGRF-13 data,
Alken et al. 2021) live in `_igrf13_data`; the Legendre recurrences here
are an independent implementation validated against scipy.

Host-side numpy: the field is static per scene (ARTS also evaluates it at
scene build).
"""

import numpy as np

# IGRF-13 epoch 2020 degree-1 Schmidt coefficients [nT]
G10, G11, H11 = -29404.8, -1450.9, 4652.5
EARTH_RADIUS_IGRF = 6371200.0  # [m] IGRF reference sphere


def dipole_field(lat_deg, lon_deg, alt, g10=G10, g11=G11, h11=H11):
    """(B_east, B_north, B_up) [T] of the centered dipole at geocentric
    coordinates (spherical approximation, as igrf13.cpp uses geocentric)."""
    a = EARTH_RADIUS_IGRF
    r = a + np.asarray(alt, dtype=np.float64)
    th = np.deg2rad(90.0 - np.asarray(lat_deg, dtype=np.float64))  # colatitude
    ph = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    ar3 = (a / r) ** 3
    ct, st = np.cos(th), np.sin(th)
    cp, sp = np.cos(ph), np.sin(ph)
    # B_r = 2 ar3 (g10 ct + (g11 cp + h11 sp) st)
    # B_th = ar3 (g10 st - (g11 cp + h11 sp) ct)
    # B_ph = ar3 (g11 sp - h11 cp)
    m1 = g11 * cp + h11 * sp
    Br = 2.0 * ar3 * (g10 * ct + m1 * st)
    Bth = ar3 * (g10 * st - m1 * ct)
    Bph = ar3 * (g11 * sp - h11 * cp)
    # to ENU [T]: up = Br, north = -Bth (theta is colatitude, south-
    # positive), east = +Bph (phi increases eastward)
    to_T = 1e-9
    return np.stack([Bph * to_T, -Bth * to_T, Br * to_T], axis=-1)


def magnetic_profile(z, lat_deg=0.0, lon_deg=0.0, model="igrf13", year=2020.0):
    """[3, NZ] (E, N, U) field along a vertical profile — plugs directly
    into Atmosphere1D.mag for Zeeman scenes.  model: "igrf13" | "dipole"."""
    z = np.asarray(z, float)
    if model == "igrf13":
        B = igrf13(np.full_like(z, lat_deg), np.full_like(z, lon_deg), z, year)
    else:
        B = dipole_field(np.full_like(z, lat_deg), np.full_like(z, lon_deg), z)
    return np.moveaxis(B, -1, 0)


def _schmidt_legendre(nmax, ct, st):
    """Schmidt semi-normalized associated Legendre P_n^m(cos t) and
    dP_n^m/dtheta for scalar/array ct=cos(theta), st=sin(theta).

    Returns (P, dP) with shape [..., nmax+1, nmax+1] (degree, order).
    Standard geomagnetic recurrences (e.g. Winch et al. 2005):
      P_n^n  = sqrt((2n-1)/(2n)) st P_{n-1}^{n-1}
      P_n^m  = ((2n-1) ct P_{n-1}^m - K P_{n-2}^m) / sqrt(n^2 - m^2),
      K = sqrt((n-1)^2 - m^2)
    with P_1^1 = st (Schmidt normalization drops the Condon-Shortley phase).
    """
    ct = np.asarray(ct, np.float64)
    st = np.asarray(st, np.float64)
    shape = np.broadcast(ct, st).shape
    P = np.zeros(shape + (nmax + 1, nmax + 1))
    dP = np.zeros_like(P)
    P[..., 0, 0] = 1.0
    for n in range(1, nmax + 1):
        # sectoral m = n
        if n == 1:
            P[..., 1, 1] = st
            dP[..., 1, 1] = ct
        else:
            f = np.sqrt((2.0 * n - 1.0) / (2.0 * n))
            P[..., n, n] = f * st * P[..., n - 1, n - 1]
            dP[..., n, n] = f * (
                ct * P[..., n - 1, n - 1] + st * dP[..., n - 1, n - 1]
            )
        for m in range(0, n):
            denom = np.sqrt(float(n * n - m * m))
            k = np.sqrt(float((n - 1) ** 2 - m * m))
            P[..., n, m] = (
                (2.0 * n - 1.0) * ct * P[..., n - 1, m] - k * P[..., n - 2, m]
            ) / denom
            dP[..., n, m] = (
                (2.0 * n - 1.0) * (ct * dP[..., n - 1, m] - st * P[..., n - 1, m])
                - k * dP[..., n - 2, m]
            ) / denom
    return P, dP


def _coeffs_at(year):
    """Epoch-blended (g, h) [nT]; clamped outside [2000, 2020] (the
    reference likewise uses the nearest epoch outside its table range,
    igrf13.cpp:341-400)."""
    from ._igrf13_data import EPOCHS, G, H

    ep = np.asarray(EPOCHS)
    y = float(year)
    if y <= ep[0]:
        return G[0], H[0]
    if y >= ep[-1]:
        return G[-1], H[-1]
    i = int(np.searchsorted(ep, y) - 1)
    w = (y - ep[i]) / (ep[i + 1] - ep[i])
    return (1 - w) * G[i] + w * G[i + 1], (1 - w) * H[i] + w * H[i + 1]


def igrf13(lat_deg, lon_deg, alt, year=2020.0, nmax=13, ell=None):
    """(B_east, B_north, B_up) [T] of the IGRF-13 field at geodetic
    position(s), decimal `year` for the epoch blend.

    Geodetic positions are converted to geocentric (r, lat'), the field is
    evaluated in the geocentric spherical frame, and the (north, up)
    components are rotated back by the latitude deviation — the same
    pipeline as the reference's igrf_impl (igrf13.cpp:321-337).
    """
    from ..path.geodesy import WGS84_A, WGS84_B, geodetic2ecef

    a_ell, b_ell = (WGS84_A, WGS84_B) if ell is None else ell
    lat = np.asarray(lat_deg, np.float64)
    lon = np.asarray(lon_deg, np.float64)
    alt = np.asarray(alt, np.float64)
    lat, lon, alt = np.broadcast_arrays(lat, lon, alt)

    ecef = np.asarray(geodetic2ecef(lat, lon, alt, a_ell, b_ell))
    if ecef.shape[0] == 3 and ecef.shape != lat.shape + (3,):
        ecef = np.moveaxis(ecef, 0, -1)
    r = np.linalg.norm(ecef, axis=-1)
    lat_gc = np.rad2deg(np.arcsin(np.clip(ecef[..., 2] / r, -1.0, 1.0)))

    g, h = _coeffs_at(year)
    g, h = g[: nmax + 1, : nmax + 1], h[: nmax + 1, : nmax + 1]

    th = np.deg2rad(90.0 - lat_gc)
    ct, st = np.cos(th), np.sin(th)
    P, dP = _schmidt_legendre(nmax, ct, st)

    n = np.arange(nmax + 1)
    m = np.arange(nmax + 1)
    ph = np.deg2rad(lon)
    cmph = np.cos(m * ph[..., None])  # [..., m]
    smph = np.sin(m * ph[..., None])
    ar = (EARTH_RADIUS_IGRF / r)[..., None] ** (n + 2)  # [..., n]

    gc_hs = g * cmph[..., None, :] + h * smph[..., None, :]  # [..., n, m]
    gs_hc = g * smph[..., None, :] - h * cmph[..., None, :]

    B_r = np.einsum("...n,...nm->...", ar * (n + 1), gc_hs * P)
    B_th = -np.einsum("...n,...nm->...", ar, gc_hs * dP)
    # avoid the pole singularity: m P_n^m / sin(theta) -> use a guarded st
    st_safe = np.where(np.abs(st) < 1e-12, 1e-12, st)
    B_ph = np.einsum("...n,...nm->...", ar, gs_hc * (m * P)) / st_safe

    # geocentric spherical -> ENU at geocentric latitude, then rotate
    # (north, up) by psi = lat_gd - lat_gc into the geodetic frame
    B_e = B_ph
    B_n = -B_th
    B_u = B_r
    psi = np.deg2rad(lat - lat_gc)
    cpsi, spsi = np.cos(psi), np.sin(psi)
    B_n_gd = B_n * cpsi - B_u * spsi
    B_u_gd = B_u * cpsi + B_n * spsi

    return 1e-9 * np.stack([B_e, B_n_gd, B_u_gd], axis=-1)
