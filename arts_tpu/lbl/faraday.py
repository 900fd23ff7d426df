"""Faraday rotation by free electrons.

Parity reference: /root/reference/src/m_abs.cc:135-232
(spectral_propmatAddFaraday): the U component of the propagation matrix
gains n_e * 2 FRconst (B . k) / f^2 with
FRconst = |e^3 / (8 pi^2 c eps0 m_e^2)|.  Derivatives via autodiff here
(the reference hand-codes the mag/wind/n_e Jacobians).
"""

import jax.numpy as jnp

from .. import constants as const

ELECTRON_MASS = 9.1093837015e-31  # [kg]
VACUUM_PERMITTIVITY = 8.8541878128e-12  # [F/m]

FRCONST = abs(
    const.e**3
    / (8.0 * jnp.pi**2 * const.c * VACUUM_PERMITTIVITY * ELECTRON_MASS**2)
)


def faraday_propmat_u(f_grid, n_e, mag, los_za_deg, los_aa_deg=0.0):
    """U-component [1/m] of the Faraday propagation matrix at one point.

    mag: [..., 3] (E, N, U) field [T]; LOS angles in degrees. Note the
    reference mirrors the LOS (path::mirror) so the dot product uses the
    propagation direction; we take k-hat directly.
    """
    za = jnp.deg2rad(los_za_deg)
    aa = jnp.deg2rad(los_aa_deg)
    khat = jnp.stack(
        [jnp.sin(za) * jnp.sin(aa), jnp.sin(za) * jnp.cos(aa), jnp.cos(za)],
        axis=-1,
    )
    b_par = jnp.sum(mag * khat, axis=-1)
    c1 = 2.0 * FRCONST * b_par
    return n_e * c1 / (f_grid * f_grid)


def add_faraday(propmat, f_grid, n_e, mag, los_za_deg, los_aa_deg=0.0):
    """Add Faraday rotation to a packed [F, 7] propagation matrix."""
    return propmat.at[..., 4].add(
        faraday_propmat_u(f_grid, n_e, mag, los_za_deg, los_aa_deg)
    )
