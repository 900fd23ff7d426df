"""wofz kernel unit tests vs scipy.special.wofz (the same Faddeeva the
reference wraps at 3rdparty/Faddeeva) and finite-difference JVP checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special

from arts_tpu.ops.wofz import wofz, _dwofz


def _grid(nx=81, ny=41):
    # log-spaced |x|, |y| covering line cores through far wings
    x = np.concatenate([[0.0], np.logspace(-6, 7, nx)])
    x = np.concatenate([-x[::-1], x])
    y = np.concatenate([[0.0], np.logspace(-8, 7, ny)])
    X, Y = np.meshgrid(x, y)
    return (X + 1j * Y).ravel()


def test_wofz_accuracy_f64():
    z = _grid()
    ref = special.wofz(z)
    got = np.asarray(wofz(jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, rtol=2e-12, atol=1e-300)


def test_wofz_accuracy_f32():
    z = _grid(41, 21).astype(np.complex64)
    ref = special.wofz(z.astype(np.complex128))
    got = np.asarray(wofz(jnp.asarray(z), 32)).astype(np.complex128)
    scale = np.abs(ref)
    err = np.abs(got - ref) / np.maximum(scale, 1e-30)
    assert np.nanmax(err) < 5e-5


def test_wofz_real_axis_is_exp():
    # w(iy) = exp(y^2) erfc(y) is real; on the real axis Re w(x) = exp(-x^2)
    x = jnp.linspace(-5, 5, 101)
    got = wofz(x + 0j)
    np.testing.assert_allclose(np.real(got), np.exp(-np.asarray(x) ** 2), atol=1e-12)


def test_dwofz_matches_complex_step():
    # Check the stable derivative against central differences of scipy wofz.
    z = _grid(31, 15)
    z = z[np.abs(z) > 1e-3]
    w = special.wofz(z)
    dw = np.asarray(_dwofz(jnp.asarray(z), jnp.asarray(w)))
    h = 1e-7 * np.maximum(np.abs(z), 1.0)
    fd = (special.wofz(z + h) - special.wofz(z - h)) / (2 * h)
    err = np.abs(dw - fd) / np.maximum(np.abs(fd), 1e-30)
    assert np.nanmax(err) < 1e-4


def test_jvp_propagates():
    def f(x):
        return jnp.real(wofz(x + 0.5j)).sum()

    g = jax.grad(f)(jnp.array([0.5, 3.0, 100.0, 1e6]))
    assert np.all(np.isfinite(np.asarray(g)))
    # FD check
    for i, x0 in enumerate([0.5, 3.0, 100.0]):
        h = 1e-6 * max(abs(x0), 1.0)
        fd = (
            float(special.wofz(x0 + h + 0.5j).real)
            - float(special.wofz(x0 - h + 0.5j).real)
        ) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5, atol=1e-12)


def test_wofz_jit_and_vmap():
    z = jnp.asarray(_grid(21, 11))
    f = jax.jit(wofz, static_argnums=1)
    np.testing.assert_allclose(
        np.asarray(f(z, 64)), special.wofz(np.asarray(z)), rtol=1e-11
    )
