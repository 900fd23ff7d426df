"""Rayleigh scattering: phase (Mueller) matrix and air scattering propmat.

Parity: /root/reference/src/core/rtepack/rtepack_scattering.cc:186-330
(rtepack::rayleigh_scattering — the Mishchenko/Travis frame-rotation form
with depolarization) and src/m_sun.cc:205-226
(spectral_propmat_scatAirSimple — the simple-air Rayleigh cross-section
polynomial).  Branch-free jnp: the reference's degenerate-geometry if/else
ladder becomes jnp.where selects, so the matrix is jit/vmap/grad-able.
"""

import jax.numpy as jnp


def _cos_scat_angle(za_in, aa_in, za_out, aa_out):
    ci, co = jnp.cos(za_in), jnp.cos(za_out)
    si, so = jnp.sin(za_in), jnp.sin(za_out)
    return jnp.clip(co * ci + so * si * jnp.cos(aa_out - aa_in), -1.0, 1.0)


def rayleigh_scattering(los_in, los_out, depolarization_factor=0.0):
    """4x4 Rayleigh phase matrix for LOS pairs in degrees ([za, aa]).

    los_in: the direction looking toward the source (the sun-path LOS at
    the scatter point), los_out: the main path LOS — the same convention
    as the reference call site (m_sun.cc:420).  Normalized so the (0,0)
    element integrates to 4 pi over the sphere.  Inputs broadcast.
    """
    ANGTOL = 1e-6
    za_in = jnp.deg2rad(jnp.asarray(los_in[..., 0]))
    aa_in = jnp.deg2rad(jnp.asarray(los_in[..., 1]))
    za_out = jnp.deg2rad(jnp.asarray(los_out[..., 0]))
    aa_out = jnp.deg2rad(jnp.asarray(los_out[..., 1]))

    cos_t = _cos_scat_angle(za_in, aa_in, za_out, aa_out)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    d = depolarization_factor
    delta = (1.0 - d) / (1.0 + 0.5 * d)
    delta_p = (1.0 - 2.0 * d) / (1.0 - d) if d != 0.5 else 0.0

    F11 = 0.75 * delta * (1.0 + cos_t * cos_t) + 1.0 - delta
    F12 = -0.75 * delta * sin_t * sin_t
    F22 = 0.75 * delta * (1.0 + cos_t * cos_t)
    F33 = 1.5 * delta * cos_t
    F44 = 1.5 * delta * delta_p * cos_t

    pi = jnp.pi
    # meridian-plane / fore-aft degeneracy: no frame rotation needed
    daa = aa_in - aa_out
    simple = (
        (jnp.abs(theta) < ANGTOL)
        | (jnp.abs(theta - pi) < ANGTOL)
        | (jnp.abs(daa) < ANGTOL)
        | (jnp.abs(jnp.abs(daa) - 2.0 * pi) < ANGTOL)
        | (jnp.abs(jnp.abs(daa) - pi) < ANGTOL)
    )

    # rotation angles sigma1/sigma2 with the polar-degenerate limits
    sin_t_safe = jnp.where(sin_t > ANGTOL, sin_t, 1.0)
    szi = jnp.where(jnp.sin(za_in) > ANGTOL, jnp.sin(za_in), 1.0)
    szo = jnp.where(jnp.sin(za_out) > ANGTOL, jnp.sin(za_out), 1.0)
    s1 = (jnp.cos(za_out) - jnp.cos(za_in) * cos_t) / (szi * sin_t_safe)
    s2 = (jnp.cos(za_in) - jnp.cos(za_out) * cos_t) / (szo * sin_t_safe)
    sig1 = jnp.arccos(jnp.clip(s1, -1.0, 1.0))
    sig2 = jnp.arccos(jnp.clip(s2, -1.0, 1.0))
    sig1 = jnp.where(za_in < ANGTOL, pi + aa_out - aa_in, sig1)
    sig2 = jnp.where(za_in < ANGTOL, 0.0, sig2)
    sig1 = jnp.where(za_in > pi - ANGTOL, aa_out - aa_in, sig1)
    sig2 = jnp.where(za_in > pi - ANGTOL, pi, sig2)
    sig1 = jnp.where(za_out < ANGTOL, 0.0, sig1)
    sig2 = jnp.where(za_out < ANGTOL, pi + aa_out - aa_in, sig2)
    sig1 = jnp.where(za_out > pi - ANGTOL, pi, sig1)
    sig2 = jnp.where(za_out > pi - ANGTOL, aa_out - aa_in, sig2)

    C1 = jnp.cos(2.0 * sig1)
    C2 = jnp.cos(2.0 * sig2)
    S1 = jnp.sin(2.0 * sig1)
    S2 = jnp.sin(2.0 * sig2)

    # Mishchenko sign flip by the wrapped azimuth difference
    daa_deg = jnp.rad2deg(aa_out - aa_in)
    daa_w = daa_deg + jnp.where(daa_deg < -180.0, 360.0, 0.0) - jnp.where(
        daa_deg > 180.0, 360.0, 0.0
    )
    sgn = jnp.where(daa_w >= 0.0, 1.0, -1.0)

    z = jnp.zeros_like(F11)
    p01 = jnp.where(simple, F12, C1 * F12)
    p10 = jnp.where(simple, F12, C2 * F12)
    p11 = jnp.where(simple, F22, C1 * C2 * F22 - S1 * S2 * F33)
    p02 = jnp.where(simple, z, sgn * S1 * F12)
    p12 = jnp.where(simple, z, sgn * (S1 * C2 * F22 + C1 * S2 * F33))
    p20 = jnp.where(simple, z, -sgn * S2 * F12)
    p21 = jnp.where(simple, z, -sgn * (C1 * S2 * F22 + S1 * C2 * F33))
    p22 = jnp.where(simple, F33, -S1 * S2 * F22 + C1 * C2 * F33)

    rows = [
        jnp.stack([F11, p01, p02, z], -1),
        jnp.stack([p10, p11, p12, z], -1),
        jnp.stack([p20, p21, p22, z], -1),
        jnp.stack([z, z, z, F44], -1),
    ]
    return jnp.stack(rows, -2)


# simple-air Rayleigh cross-section polynomial (m_sun.cc:213, the
# standard (n-1) dispersion fit, wavelength in micrometers)
_AIR_COEFS = (3.9729066, 4.6547659e-2, 4.5055995e-4, 2.3229848e-5)


def rayleigh_scat_airsimple(f_grid, p, t):
    """Rayleigh volume scattering coefficient of air [1/m].

    Parity: spectral_propmat_scatAirSimple (m_sun.cc:205-226):
    1e-32 nd sum_k c_k lambda^-2k / lambda^4, lambda in um.
    """
    from .. import constants as const

    nd = p / (const.k * t)
    wavelen_um = (const.c / f_grid) * 1e6
    inv_l2 = 1.0 / (wavelen_um * wavelen_um)
    s = jnp.zeros_like(f_grid)
    pw = jnp.ones_like(f_grid)
    for c_ in _AIR_COEFS:
        s = s + c_ * pw
        pw = pw * inv_l2
    return 1e-32 * nd * s * inv_l2 * inv_l2
