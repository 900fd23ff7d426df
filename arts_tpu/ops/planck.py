"""Planck radiation functions (differentiable).

Parity reference: /root/reference/src/core/physics/physics_funcs.h planck /
dplanck_dt (used by rtepack_source.cc:40) and inverse for brightness
temperature conversions (operators/spectral_radiance_transform_operator).

float32 safety: the textbook grouping 2 h f^3 / c^2 is fine executed
left-to-right, but XLA's algebraic simplifier reassociates constant
factors, producing 2h/c^2 ~ 1.5e-50 — which flushes to zero in f32 and
silently zeroes every thermal source under jit on TPU.  The groupings
here keep every constant product representable, and an
optimization_barrier pins the one boundary the simplifier must not fold
across.
"""

import jax
import jax.numpy as jnp

from .. import constants as const


def planck(f, t):
    """Spectral radiance B(f, T) [W / (m^2 Hz sr)]."""
    x = f / const.c  # ~1e0..1e3 for microwave..IR: f32-safe
    pref = jax.lax.optimization_barrier(2.0 * const.h * f)  # ~1e-22
    return pref * x * x / jnp.expm1(const.h * f / (const.k * t))


def inv_planck(b, f):
    """Planck brightness temperature T_B such that planck(f, T_B) = b."""
    x = f / const.c
    num = jax.lax.optimization_barrier(2.0 * const.h * f) * x * x
    return (const.h * f / const.k) / jnp.log1p(num / b)


def rayleigh_jeans(b, f):
    """Rayleigh-Jeans brightness temperature of radiance b."""
    x = const.c / f
    return b * x * x / (2.0 * const.k)
