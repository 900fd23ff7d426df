"""Recipes, solar source, and surface field tests."""

import numpy as np

import jax.numpy as jnp

import arts_tpu.constants as const
from arts_tpu.atm.surface import SurfaceField
from arts_tpu.recipe import AtmosphericFlux, SingleSpeciesAbsorption
from arts_tpu.sun import AU, SUN_RADIUS, solar_geometry, sun_blackbody
from tests.test_allsky import allsky_scene
from tests.test_clearsky import F_GRID, SCENE


def test_sun_blackbody_flux():
    f = jnp.asarray([5e14])  # visible
    sun = sun_blackbody(f)
    fbeam = float(sun.toa_flux()[0])
    # total solar constant check: integrate Planck * pi * (R/d)^2 over f
    # ~ 1361 W/m2; spot check the spectral value is positive and sane
    assert 0 < fbeam < 1e-6
    # solid-angle scaling
    sun2 = sun_blackbody(f, distance=2 * AU)
    np.testing.assert_allclose(float(sun2.toa_flux()[0]), fbeam / 4, rtol=1e-12)
    mu0, phi0 = solar_geometry(60.0, 120.0)
    np.testing.assert_allclose(mu0, 0.5, rtol=1e-12)


def test_solar_constant():
    f = jnp.asarray(np.linspace(1e12, 3e15, 4000))
    sun = sun_blackbody(f)
    s0 = float(jnp.trapezoid(sun.toa_flux(), f))
    assert 1300 < s0 < 1420  # solar constant ballpark


def test_atmospheric_flux_recipe():
    recipe = AtmosphericFlux(scene=allsky_scene(), nquad=8)
    f = jnp.asarray(np.asarray(F_GRID)[::20])
    out = recipe(f)
    up, down = np.asarray(out["up"]), np.asarray(out["down"])
    assert up.shape == down.shape == (SCENE.atm.z.shape[0],)
    assert np.all(up > 0)
    # at the surface, upwelling flux ~ pi * B_band(T_surf) (blackbody)
    from arts_tpu.ops.planck import planck

    bsurf = np.asarray(planck(f, 288.0))
    expect = np.pi * np.trapezoid(bsurf, np.asarray(f))
    np.testing.assert_allclose(up[-1], expect, rtol=1e-6)


def test_single_species_absorption_recipe():
    r = SingleSpeciesAbsorption(cat=SCENE.cat, pf=SCENE.pf)
    a = np.asarray(r(np.asarray(F_GRID)[::50], 250.0, 5e4, [0.005, 0.995]))
    assert np.all(np.isfinite(a)) and a.max() > 0


def test_surface_field():
    sf = SurfaceField.constant(temperature=290.0, emissivity=0.95)
    p = sf.at(45.0, 10.0)
    np.testing.assert_allclose(float(p["temperature"]), 290.0)
    # gridded
    lat = jnp.asarray([0.0, 10.0])
    lon = jnp.asarray([0.0, 20.0])
    t = jnp.asarray([[280.0, 282.0], [290.0, 292.0]])
    sf2 = SurfaceField(
        lat=lat, lon=lon, temperature=t, elevation=jnp.zeros((2, 2)),
        emissivity=jnp.ones((2, 2)),
    )
    p2 = sf2.at(5.0, 10.0)
    np.testing.assert_allclose(float(p2["temperature"]), 286.0, rtol=1e-12)


def test_spectral_atmospheric_flux_recipe():
    """Czarnecki two-band recipe (pyarts3.recipe.SpectralAtmosphericFlux
    parity): thermal-only when the sun is below the horizon; adding the
    solar band increases the downwelling flux; mu0 follows the great-
    circle angle to the sub-solar point."""
    import dataclasses as dc

    from arts_tpu.recipe import SpectralAtmosphericFlux
    from arts_tpu.sun import sun_blackbody

    scene = allsky_scene()
    f_grid = jnp.asarray(np.asarray(F_GRID)[::20])
    sun = sun_blackbody(f_grid)

    # sun directly overhead
    r = SpectralAtmosphericFlux(
        scene=scene, nquad=8, sun=sun,
        atm_latitude=0.0, solar_latitude=0.0, solar_longitude=0.0,
    )
    assert abs(r._mu0() - 1.0) < 1e-12
    out = r(f_grid)
    # night side: thermal only
    rn = dc.replace(r, solar_longitude=180.0)
    assert rn._mu0() == 0.0
    out_n = rn(f_grid)
    assert np.all(np.asarray(out["spectral_down"]) >=
                  np.asarray(out_n["spectral_down"]) - 1e-30)
    # at microwave frequencies the real sun is a small (solid-angle
    # diluted, ~2.2e-5) but strictly positive addition; at TOA the added
    # downwelling is exactly the direct beam mu0 * fbeam
    dn = np.asarray(out["spectral_down"]) - np.asarray(out_n["spectral_down"])
    assert dn.sum() > 0
    fbeam = np.asarray(sun.toa_flux())
    np.testing.assert_allclose(dn[:, 0], r._mu0() * fbeam, rtol=1e-9)
    # a sun bright enough to dominate scales the solar band linearly
    bright = dc.replace(sun, spectrum=sun.spectrum * 1e6)
    rb = dc.replace(r, sun=bright)
    out_b = rb(f_grid)
    dnb = np.asarray(out_b["spectral_down"]) - np.asarray(out_n["spectral_down"])
    assert dnb.sum() > 1.5 * np.asarray(out_n["spectral_down"]).sum()
    # atol: dn underflows to 0 against the thermal flux in f64 where the
    # atmosphere is opaque; dnb there is ~1e-24
    np.testing.assert_allclose(dnb, dn * 1e6, rtol=1e-6, atol=1e-20)
    # 60 deg solar zenith
    r60 = dc.replace(r, solar_longitude=60.0)
    np.testing.assert_allclose(r60._mu0(), 0.5, atol=1e-12)
