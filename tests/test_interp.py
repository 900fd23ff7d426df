"""Lagrange interpolation tests vs polynomial exactness and numpy."""

import numpy as np

import jax
import jax.numpy as jnp

from arts_tpu.ops.interp import interp, lagrange_weights


def test_linear_matches_numpy():
    g = jnp.asarray(np.linspace(0.0, 10.0, 11))
    v = jnp.asarray(np.sin(np.asarray(g)))
    x = jnp.asarray([0.5, 3.3, 9.9])
    got = np.asarray(interp(g, v, x, order=1))
    ref = np.interp(np.asarray(x), np.asarray(g), np.asarray(v))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_polynomial_exactness():
    # order-3 Lagrange reproduces cubics exactly
    g = jnp.asarray(np.linspace(-2.0, 2.0, 9))
    poly = lambda t: 1.0 + 2 * t - 0.5 * t**2 + 0.25 * t**3
    v = poly(g)
    x = jnp.asarray(np.linspace(-1.9, 1.9, 17))
    got = np.asarray(interp(g, v, x, order=3))
    np.testing.assert_allclose(got, np.asarray(poly(x)), rtol=1e-12)


def test_weights_sum_to_one():
    g = jnp.asarray(np.linspace(0.0, 1.0, 7))
    for order in (1, 2, 3, 5):
        _, w = lagrange_weights(g, jnp.asarray([0.31, 0.77]), order)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-12)


def test_differentiable():
    g = jnp.asarray(np.linspace(0.0, 1.0, 11))
    v = g**2
    dfdx = jax.grad(lambda x: interp(g, v, jnp.asarray([x]), order=2)[0])(0.437)
    np.testing.assert_allclose(float(dfdx), 2 * 0.437, rtol=1e-10)
