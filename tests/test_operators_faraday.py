"""Unit-transform operator and Faraday rotation tests."""

import jax.numpy as jnp
import numpy as np

from arts_tpu.lbl.faraday import add_faraday, faraday_propmat_u
from arts_tpu.operators import spectral_radiance_transform, transform_with_jacobian
from arts_tpu.ops.planck import planck


def test_transform_roundtrip():
    f = jnp.asarray([100e9, 200e9])
    I = planck(f, 250.0)
    tb = spectral_radiance_transform("Tb")(I, f)
    np.testing.assert_allclose(np.asarray(tb), 250.0, rtol=1e-12)
    raw = spectral_radiance_transform("raw")(I, f)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(I))


def test_transform_jacobian_chain_rule():
    f = jnp.asarray([100e9, 200e9])
    I = planck(f, 250.0)
    dI = jnp.stack([I * 0.01, I * 0.02])
    tb, dtb = transform_with_jacobian("Tb", I, dI, f)
    # FD check of the chain rule on the first row
    h = 1e-8
    tb2 = spectral_radiance_transform("Tb")(I + h * dI[0], f)
    fd = (np.asarray(tb2) - np.asarray(tb)) / h
    np.testing.assert_allclose(np.asarray(dtb[0]), fd, rtol=1e-5)


def test_faraday_rotation():
    f = jnp.asarray([1e9, 2e9])
    mag = jnp.asarray([0.0, 0.0, 5e-5])
    u = np.asarray(faraday_propmat_u(f, 1e10, mag, 0.0))  # LOS along B
    assert u[0] != 0
    np.testing.assert_allclose(u[0] / u[1], 4.0, rtol=1e-12)  # 1/f^2
    # perpendicular LOS: no rotation
    u_perp = np.asarray(faraday_propmat_u(f, 1e10, mag, 90.0, 0.0))
    np.testing.assert_allclose(u_perp, 0.0, atol=1e-22)  # cos(90deg) roundoff
    pm = jnp.zeros((2, 7))
    pm2 = add_faraday(pm, f, 1e10, mag, 0.0)
    np.testing.assert_allclose(np.asarray(pm2[:, 4]), u)
