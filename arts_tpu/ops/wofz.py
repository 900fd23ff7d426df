"""Faddeeva function w(z) = exp(-z^2) erfc(-iz) in pure JAX.

This replaces the MIT Faddeeva package the reference uses as its Voigt
kernel (reference: /root/reference/3rdparty/Faddeeva/Faddeeva.cc, called
from src/core/lbl/lbl_lineshape_voigt_lte.cpp:239).  Instead of the
region-heavy branchy CPU algorithm we use a TPU-friendly blend of two
branch-free evaluations selected with `jnp.where`:

  * Weideman (1994) rational approximation of degree N (SIAM J. Numer.
    Anal. 31, 1497) — accurate near the real axis and for moderate |z|.
  * Asymptotic Laurent / continued-fraction expansion for large |z|.

Both are evaluated vectorized; the select keeps everything dense (good
for the VPU) and avoids data-dependent control flow under jit.

The derivative dw/dz = -2 z w + 2i/sqrt(pi) is analytically known but
catastrophically cancels for large |z| (see the reference's comment at
lbl_lineshape_voigt_lte.cpp:250-266 — ARTS falls back to a *numeric
difference*).  We do better: a custom JVP that uses the analytic form in
the interior and a directly-summed asymptotic series for the wings, so
autodiff through the Voigt profile is exact and stable everywhere.

Only Im(z) >= 0 is supported (always true for absorption: Im z = G0/gd > 0).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_SQRT_PI = math.sqrt(math.pi)
_INV_SQRT_PI = 1.0 / _SQRT_PI

# ---------------------------------------------------------------------------
# Weideman rational approximation coefficients (computed once on host, f64).
# w(z) ~ (inv_sqrt_pi + 2/L^2 * P(Z)) / (L - i z),  Z = (L + i z)/(L - i z)
# with P a degree-(N-1) polynomial whose coefficients come from an FFT of
# the function f(theta) on the unit circle. See Weideman (1994), Algorithm 916
# notes; this construction is standard public knowledge.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _weideman_coeffs(n: int):
    m = 2 * n
    L = math.sqrt(n / math.sqrt(2.0))  # optimal scale parameter
    k = np.arange(-m + 1, m, dtype=np.float64)  # 2m-1 sampling points
    theta = k * math.pi / m
    t = L * np.tan(0.5 * theta)
    # Function to expand: f(t) = (L^2 + t^2) exp(-t^2), padded with f(inf)=0
    f = (L * L + t * t) * np.exp(-t * t)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / (2.0 * m)
    a = np.flipud(a[1 : n + 1])  # polynomial coefficients, highest degree first
    return L, tuple(a.tolist())


def _wofz_weideman(z, L, a):
    """Weideman rational evaluation; valid upper half plane, best for |z| small."""
    iz = 1j * z
    Zden = L - iz
    Z = (L + iz) / Zden
    # Horner in Z (a is highest-degree-first)
    p = jnp.zeros_like(z)
    for c in a:
        p = p * Z + c
    return (2.0 * p / Zden + _INV_SQRT_PI) / Zden


def _wofz_asymptotic(z):
    """Laurent series for large |z| (|z|^2 >~ 256 gives ~1e-14 relative).

    w(z) = i/(sqrt(pi)) * (1/z) * (1 + 1/(2 z^2) + 3/(4 z^4) + 15/(8 z^6) + ...)
    coefficients c_k = (2k-1)!! / 2^k.
    """
    zi2 = 1.0 / (z * z)
    # (2k-1)!!/2^k for k=0..5: 1, 1/2, 3/4, 15/8, 105/16, 945/32
    s = 945.0 / 32.0
    for c in (105.0 / 16.0, 15.0 / 8.0, 3.0 / 4.0, 1.0 / 2.0, 1.0):
        s = s * zi2 + c
    return (1j * _INV_SQRT_PI) * s / z


_ASYM_R2 = 512.0  # |z|^2 above which the asymptotic series is used


def _wofz_impl(z, n: int):
    L, a = _weideman_coeffs(n)
    r2 = z.real * z.real + z.imag * z.imag
    big = r2 > _ASYM_R2
    # Evaluate both branches densely; clamp the Weideman argument in the far
    # region so it cannot overflow (its value is discarded there).
    z_small = jnp.where(big, jnp.asarray(1.0 + 1.0j, dtype=z.dtype), z)
    w_small = _wofz_weideman(z_small, L, a)
    z_big = jnp.where(big, z, jnp.asarray(100.0 + 100.0j, dtype=z.dtype))
    w_big = _wofz_asymptotic(z_big)
    return jnp.where(big, w_big, w_small)


def _dwofz(z, w):
    """dw/dz, stable for all |z| (region-wise)."""
    r2 = z.real * z.real + z.imag * z.imag
    big = r2 > _ASYM_R2
    # Interior: analytic identity.
    dw_in = -2.0 * z * w + 2j * _INV_SQRT_PI
    # Far wing: differentiate the Laurent series directly:
    # dw/dz = -i/sqrt(pi) * (1/z^2 + 3/(2 z^4) + 15/(4 z^6) + 105/(8 z^8) + ...)
    # coefficients (k+1) * c_k give d of sum c_k z^{-2k-1}: term_k = (2k+1) c_k z^{-2k-2}
    zs = jnp.where(big, z, jnp.asarray(100.0 + 100.0j, dtype=z.dtype))
    zi2 = 1.0 / (zs * zs)
    # (2k+1)*c_k for k=0..4: 1, 3/2, 15/4, 105/8, 945/16
    s = 945.0 / 16.0
    for c in (105.0 / 8.0, 15.0 / 4.0, 3.0 / 2.0, 1.0):
        s = s * zi2 + c
    dw_out = (-1j * _INV_SQRT_PI) * s * zi2
    return jnp.where(big, dw_out, dw_in)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def wofz(z, n: int = 64):
    """Faddeeva w(z) for Im(z) >= 0. `n` = Weideman approximation order."""
    z = jnp.asarray(z)
    if not jnp.issubdtype(z.dtype, jnp.complexfloating):
        z = z.astype(jnp.complex128 if z.dtype == jnp.float64 else jnp.complex64)
    return _wofz_impl(z, n)


@wofz.defjvp
def _wofz_jvp(n, primals, tangents):
    (z,) = primals
    (dz,) = tangents
    z = jnp.asarray(z)
    if not jnp.issubdtype(z.dtype, jnp.complexfloating):
        z = z.astype(jnp.complex128 if z.dtype == jnp.float64 else jnp.complex64)
    w = _wofz_impl(z, n)
    dw = _dwofz(z, w)
    return w, dw * dz


def voigt_profile(x, y):
    """Normalized Voigt K(x, y) = Re w(x + i y) / sqrt(pi) convenience."""
    return jnp.real(wofz(x + 1j * y)) * _INV_SQRT_PI
