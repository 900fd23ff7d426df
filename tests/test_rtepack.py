"""rtepack algebra tests: Cayley-Hamilton expm vs scipy.linalg.expm,
emission recursions (scan vs associative scan vs physics limits)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from arts_tpu.rtepack.emission import (
    cumulative_transmittance,
    emission_polarized,
    emission_unpolarized,
    emission_unpolarized_pscan,
)
from arts_tpu.rtepack.propmat import expm, to_matrix


def rand_propmat(rng, n, scale=1.0):
    k = rng.normal(size=(n, 7)) * scale
    k[:, 0] = np.abs(k[:, 0]) + 1.0  # absorption dominates (physical)
    return jnp.asarray(k)


def test_expm_matches_scipy():
    rng = np.random.default_rng(0)
    k = rand_propmat(rng, 50)
    r = jnp.asarray(np.abs(rng.normal(size=50)) * 0.5)
    T = np.asarray(expm(k, r))
    for i in range(50):
        Km = np.asarray(to_matrix(k[i]))
        ref = scipy.linalg.expm(-float(r[i]) * Km)
        np.testing.assert_allclose(T[i], ref, rtol=1e-10, atol=1e-12)


def test_expm_unpolarized_and_tiny():
    k = jnp.asarray([[0.3, 0, 0, 0, 0, 0, 0], [2.0, 1e-14, 0, 0, 1e-15, 0, 0]])
    r = jnp.asarray([2.0, 1.0])
    T = np.asarray(expm(k, r))
    np.testing.assert_allclose(T[0], np.exp(-0.6) * np.eye(4), rtol=1e-12)
    np.testing.assert_allclose(T[1], np.exp(-2.0) * np.eye(4), rtol=1e-9, atol=1e-12)


def test_expm_grad_stable_at_zero_polarization():
    # the small-x/y limits must differentiate cleanly (reference FIXME at
    # rtepack_transmission.cc:96-115 — our series forms handle it)
    def f(eps):
        k = jnp.array([1.0, eps, 0.0, 0.0, eps / 2, 0.0, 0.0])
        return expm(k, jnp.asarray(1.0)).sum()

    g0 = jax.grad(f)(0.0)
    assert np.isfinite(float(g0))
    h = 1e-6
    fd = (f(h) - f(-h)) / (2 * h)
    np.testing.assert_allclose(float(g0), float(fd), rtol=1e-4, atol=1e-8)


def test_emission_scan_equals_pscan():
    rng = np.random.default_rng(1)
    npts, F = 40, 16
    k = jnp.asarray(np.abs(rng.normal(size=(npts, F))) * 1e-4)
    J = jnp.asarray(np.abs(rng.normal(size=(npts, F))) * 100)
    r = jnp.asarray(np.abs(rng.normal(size=(npts - 1,))) * 1e4)
    I0 = jnp.asarray(np.abs(rng.normal(size=(F,))) * 10)
    a = emission_unpolarized(k, J, r, I0)
    b = emission_unpolarized_pscan(k, J, r, I0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_emission_limits():
    npts, F = 30, 4
    J = jnp.full((npts, F), 250.0)
    r = jnp.full((npts - 1,), 1e3)
    I0 = jnp.full((F,), 2.7)
    # transparent: radiance = background
    I_thin = emission_unpolarized(jnp.zeros((npts, F)), J, r, I0)
    np.testing.assert_allclose(np.asarray(I_thin), 2.7, rtol=1e-12)
    # optically thick: radiance = local source
    I_thick = emission_unpolarized(jnp.full((npts, F), 1.0), J, r, I0)
    np.testing.assert_allclose(np.asarray(I_thick), 250.0, rtol=1e-9)


def test_emission_polarized_reduces_to_scalar():
    rng = np.random.default_rng(2)
    npts, F = 12, 5
    ka = jnp.asarray(np.abs(rng.normal(size=(npts, F))) * 1e-4)
    k = jnp.zeros((npts, F, 7)).at[..., 0].set(ka)
    Js = jnp.asarray(np.abs(rng.normal(size=(npts, F))) * 50)
    J = jnp.zeros((npts, F, 4)).at[..., 0].set(Js)
    r = jnp.asarray(np.abs(rng.normal(size=(npts - 1,))) * 1e4)
    I0s = jnp.asarray(np.abs(rng.normal(size=(F,))))
    I0 = jnp.zeros((F, 4)).at[..., 0].set(I0s)
    Ipol = emission_polarized(k, J, r, I0)
    Isca = emission_unpolarized(ka, Js, r, I0s)
    np.testing.assert_allclose(np.asarray(Ipol[..., 0]), np.asarray(Isca), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Ipol[..., 1:]), 0.0, atol=1e-14)


def test_cumulative_transmittance():
    rng = np.random.default_rng(3)
    npts, F = 6, 3
    k = jnp.asarray(np.abs(rng.normal(size=(npts, F, 7))) * 0.1)
    r = jnp.asarray(np.abs(rng.normal(size=(npts - 1,))))
    P = np.asarray(cumulative_transmittance(k, r))
    assert P.shape == (npts, F, 4, 4)
    np.testing.assert_allclose(P[0], np.broadcast_to(np.eye(4), (F, 4, 4)))
    # P[i] = T_1 ... T_i
    T = np.asarray(expm(0.5 * (k[:-1] + k[1:]), r[:, None]))
    acc = np.broadcast_to(np.eye(4), (F, 4, 4)).copy()
    for i in range(npts - 1):
        acc = np.einsum("fij,fjk->fik", acc, T[i])
        np.testing.assert_allclose(P[i + 1], acc, rtol=1e-10, atol=1e-12)
