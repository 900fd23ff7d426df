"""Refracted propagation paths (host-side ray tracing).

Parity reference: the reference's refracted paths run the
`ray_point_back_propagation_agenda` stepwise through the atmosphere
(src/core/path/, SURVEY.md 2.3 — geometric first, refraction as an
iterative extension).  For a spherically symmetric atmosphere the tracer
uses the Bouguer invariant n(r) r sin(za) = const, marching in radius
between shells; microwave refractivity from the Smith-Weintraub relation.
"""

import dataclasses

import numpy as np

from .geometry import EARTH_RADIUS, PathGeometry


def microwave_refractivity(p, t, h2o_vmr=0.0):
    """n - 1 from the Smith-Weintraub formula (N-units 77.6 p/T +
    3.73e5 e/T^2 with p, e in hPa).

    Array-module agnostic (plain arithmetic): numpy arrays host-side,
    traced jnp arrays inside jit (fwd.simulate_clearsky's refracted
    sun leg calls it with traced level state)."""
    p_hpa = p / 100.0
    e_hpa = p_hpa * h2o_vmr
    N = 77.6 * (p_hpa - e_hpa) / t + 72.0 * e_hpa / t + 3.75e5 * e_hpa / t**2
    return N * 1e-6


def refractivity_profile(atm, h2o_index=None):
    """(z, n) arrays for an Atmosphere1D (host side)."""
    z = np.asarray(atm.z)
    t = np.asarray(atm.t)
    p = np.asarray(atm.p)
    h2o = (
        np.asarray(atm.vmr)[h2o_index] if h2o_index is not None else np.zeros_like(z)
    )
    return z, 1.0 + microwave_refractivity(p, t, h2o)


def refracted_path_1d(
    alt_obs,
    za_obs,
    z_surf,
    z_toa,
    z_n,
    n_of_z,
    max_step=1000.0,
    radius=EARTH_RADIUS,
) -> PathGeometry:
    """Refracted pencil-beam path for a 1D atmosphere.

    z_n / n_of_z: refractive index samples (interpolated linearly; n = 1
    above the top sample).  Marches the Bouguer invariant in radius shells
    of <= max_step; handles surface hits and refracted tangent points.
    """

    def n_at(alt):
        return np.interp(alt, z_n, n_of_z, left=n_of_z[0], right=1.0)

    r_obs = radius + alt_obs
    r_surf = radius + z_surf
    r_toa = radius + z_toa
    za0 = np.deg2rad(za_obs)
    # Bouguer constant at the observer (n = 1 above TOA)
    B = n_at(min(alt_obs, z_toa)) * r_obs * np.sin(za0)
    if alt_obs >= z_toa:
        B = 1.0 * r_obs * np.sin(za0)

    looking_down = za_obs > 90.0

    def za_at(r):
        s = np.clip(B / (n_at(r - radius) * r), 0.0, 1.0)
        return np.arcsin(s)

    # radius marching grid
    nshell = max(int(np.ceil((z_toa - z_surf) / max_step)), 2)
    shells = radius + np.linspace(z_surf, z_toa, nshell + 1)

    alts, esses, zas = [], [], []
    s_acc = 0.0

    def push(r, za_rad, descending):
        alts.append(r - radius)
        esses.append(s_acc)
        zas.append(180.0 - np.degrees(za_rad) if descending else np.degrees(za_rad))

    if looking_down:
        # descend from TOA (or observer) to tangent/surface
        r = min(r_obs, r_toa)
        descending = True
        push(r, za_at(r), True)
        down_shells = shells[shells < r][::-1]
        i = 0
        while i < len(down_shells):
            r2 = down_shells[i]
            # turning point: sin(za) would exceed 1 below r_t
            if n_at(r2 - radius) * r2 <= B:
                # find tangent radius by bisection between r2 and r
                lo, hi = r2, r
                for _ in range(60):
                    mid = 0.5 * (lo + hi)
                    if n_at(mid - radius) * mid <= B:
                        lo = mid
                    else:
                        hi = mid
                r_t = hi
                ds = _step_len(r, r_t, za_at(r), za_at(r_t))
                s_acc += ds
                push(r_t, np.pi / 2, True)
                descending = False
                break
            ds = _step_len(r, r2, za_at(r), za_at(r2))
            s_acc += ds
            push(r2, za_at(r2), True)
            r = r2
            i += 1
        if descending and r <= r_surf + 1e-6:
            return PathGeometry(
                alt=np.asarray(alts),
                s=np.asarray(esses),
                za=np.asarray(zas),
                background="surface",
            )
        # ascend back out to TOA
        up_shells = shells[shells > alts[-1] + radius + 1e-9]
        r = alts[-1] + radius
        for r2 in up_shells:
            ds = _step_len(r, r2, za_at(r), za_at(r2))
            s_acc += ds
            push(r2, za_at(r2), False)
            r = r2
        return PathGeometry(
            alt=np.asarray(alts), s=np.asarray(esses), za=np.asarray(zas),
            background="space",
        )
    else:
        r = max(r_obs, r_surf)
        push(r, za_at(r), False)
        for r2 in shells[shells > r + 1e-9]:
            ds = _step_len(r, r2, za_at(r), za_at(r2))
            s_acc += ds
            push(r2, za_at(r2), False)
            r = r2
        return PathGeometry(
            alt=np.asarray(alts), s=np.asarray(esses), za=np.asarray(zas),
            background="space",
        )


def _step_len(r1, r2, za1, za2):
    """Arc length between shells using the mean of cos(za) (trapezoid in
    1/cos; robust near the tangent where cos -> 0 via the chord formula)."""
    c1, c2 = np.cos(za1), np.cos(za2)
    cbar = 0.5 * (c1 + c2)
    dr = abs(r2 - r1)
    if cbar < 1e-3:
        # near-tangent: straight-chord limit s = sqrt(r^2 - r_t^2)
        return np.sqrt(abs(r2**2 - r1**2))
    return dr / cbar
