"""Planck radiation functions (differentiable).

Parity reference: /root/reference/src/core/physics/physics_funcs.h planck /
dplanck_dt (used by rtepack_source.cc:40) and inverse for brightness
temperature conversions (operators/spectral_radiance_transform_operator).
"""

import jax.numpy as jnp

from .. import constants as const


def planck(f, t):
    """Spectral radiance B(f, T) [W / (m^2 Hz sr)]."""
    return (2.0 * const.h * f**3 / const.c**2) / jnp.expm1(
        const.h * f / (const.k * t)
    )


def inv_planck(b, f):
    """Planck brightness temperature T_B such that planck(f, T_B) = b."""
    return (const.h * f / const.k) / jnp.log1p(2.0 * const.h * f**3 / (const.c**2 * b))


def rayleigh_jeans(b, f):
    """Rayleigh-Jeans brightness temperature of radiance b."""
    return b * const.c**2 / (2.0 * const.k * f**2)
