"""Geodesy, 3D fields, subsurface, geomagnetic-field tests."""

import numpy as np

import jax.numpy as jnp

from arts_tpu.atm.field3d import Atmosphere3D
from arts_tpu.atm.igrf import dipole_field, magnetic_profile
from arts_tpu.atm.subsurface import SubsurfaceField
from arts_tpu.ops.planck import planck
from arts_tpu.path.geodesy import (
    ecef2geodetic,
    ecef2los,
    geodetic2ecef,
    los2ecef,
)


def test_geodetic_roundtrip():
    lat = np.array([0.0, 45.0, -60.0, 89.0])
    lon = np.array([0.0, 90.0, -120.0, 179.0])
    alt = np.array([0.0, 1e3, 100e3, 500.0])
    xyz = geodetic2ecef(lat, lon, alt)
    la2, lo2, al2 = ecef2geodetic(xyz)
    np.testing.assert_allclose(la2, lat, atol=1e-9)
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    np.testing.assert_allclose(al2, alt, atol=1e-4)


def test_los_roundtrip():
    za, aa = 70.0, 120.0
    d = los2ecef(30.0, 40.0, za, aa)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-12)
    pos = geodetic2ecef(30.0, 40.0, 100e3)
    za2, aa2 = ecef2los(pos, d)
    np.testing.assert_allclose([za2, aa2], [za, aa], atol=1e-6)


def test_atmosphere3d_interp():
    z = jnp.linspace(0.0, 10e3, 6)
    lat = jnp.asarray([-10.0, 10.0])
    lon = jnp.asarray([0.0, 20.0])
    t = (
        280.0
        - z[:, None, None] * 5e-3
        + lat[None, :, None] * 0.5
        + lon[None, None, :] * 0.1
    )
    p = 1e5 * jnp.exp(-z / 8e3)[:, None, None] * jnp.ones((6, 2, 2))
    vmr = jnp.full((1, 6, 2, 2), 0.01)
    atm = Atmosphere3D(z=z, lat=lat, lon=lon, t=t, p=p, vmr=vmr)
    pt = atm.at(jnp.asarray(5e3), jnp.asarray(0.0), jnp.asarray(10.0))
    np.testing.assert_allclose(
        float(pt.t), 280.0 - 5e3 * 5e-3 + 0.0 + 1.0, rtol=1e-12
    )
    np.testing.assert_allclose(float(pt.p), 1e5 * np.exp(-5e3 / 8e3), rtol=1e-10)
    # degenerate lat/lon = constant-field behavior
    atm1 = Atmosphere3D(
        z=z, lat=jnp.zeros((1,)), lon=jnp.zeros((1,)),
        t=t[:, :1, :1], p=p[:, :1, :1], vmr=vmr[:, :, :1, :1],
    )
    pt1 = atm1.at(jnp.asarray(5e3), jnp.asarray(45.0), jnp.asarray(123.0))
    np.testing.assert_allclose(float(pt1.t), float(t[2, 0, 0] + t[3, 0, 0]) / 2)


def test_subsurface_emission():
    depth = jnp.linspace(0.0, 5.0, 21)
    t = jnp.full((21,), 275.0)
    sub = SubsurfaceField(depth=depth, t=t, absorption=jnp.full((21,), 10.0))
    f = jnp.asarray([10e9, 100e9])
    I = sub.emerging_radiance(f)
    # isothermal opaque medium: emerging radiance = Planck(T)
    np.testing.assert_allclose(
        np.asarray(I), np.asarray(planck(f, 275.0)), rtol=1e-10
    )


def test_dipole_field():
    B = dipole_field(np.array([80.0, 0.0]), np.array([0.0, 0.0]), np.zeros(2))
    mag = np.linalg.norm(B, axis=-1)
    # polar field ~ 5-6e-5 T, equatorial ~ 2.5-3.5e-5 T
    assert 4e-5 < mag[0] < 7e-5
    assert 2e-5 < mag[1] < 4e-5
    prof = magnetic_profile(np.linspace(0, 80e3, 5), lat_deg=45.0)
    assert prof.shape == (3, 5)
    assert np.all(np.isfinite(prof))


def test_igrf13_degree1_reduces_to_dipole():
    from arts_tpu.atm.igrf import EARTH_RADIUS_IGRF, igrf13

    lats = np.array([0.0, 37.0, -60.0])
    lons = np.array([0.0, -122.0, 140.0])
    alts = np.array([0.0, 10e3, 300e3])
    b1 = igrf13(lats, lons, alts, year=2020.0, nmax=1,
                ell=(EARTH_RADIUS_IGRF, EARTH_RADIUS_IGRF))
    bd = dipole_field(lats, lons, alts)
    np.testing.assert_allclose(b1, bd, rtol=1e-12)


def test_igrf13_schmidt_legendre_vs_scipy():
    """Independent cross-check of the Schmidt recurrences against
    scipy.special.lpmv: P_schmidt = (-1)^m sqrt(2 (n-m)!/(n+m)!) lpmv
    (lpmv carries the Condon-Shortley phase, Schmidt drops it);
    dP/dtheta via central differences in theta."""
    from math import factorial

    from scipy.special import lpmv

    from arts_tpu.atm.igrf import _schmidt_legendre

    nmax = 13
    dth = 1e-6
    for th in (0.6, 1.36, 1.88, 2.9):
        x, st = np.cos(th), np.sin(th)
        P, dP = _schmidt_legendre(nmax, x, st)
        for n in range(nmax + 1):
            for m in range(n + 1):
                norm = 1.0 if m == 0 else (-1.0) ** m * np.sqrt(
                    2.0 * factorial(n - m) / factorial(n + m)
                )
                ps = norm * lpmv(m, n, x)
                np.testing.assert_allclose(
                    P[n, m], ps, rtol=1e-10, atol=1e-12, err_msg=f"P n={n} m={m}"
                )
                dps = (
                    norm
                    * (lpmv(m, n, np.cos(th + dth)) - lpmv(m, n, np.cos(th - dth)))
                    / (2 * dth)
                )
                np.testing.assert_allclose(
                    dP[n, m], dps, rtol=1e-5, atol=1e-7, err_msg=f"dP n={n} m={m}"
                )


def test_igrf13_known_geophysics():
    """Pin the 2020 field against well-known IGRF-13 values: declination
    ~-4.7 deg at (0N,0E), dip ~+60 deg at (45N,0E), South Atlantic Anomaly
    weak field, polar field ~2x equatorial."""
    from arts_tpu.atm.igrf import igrf13

    b00 = igrf13(0.0, 0.0, 0.0, year=2020.0)
    dec = np.rad2deg(np.arctan2(b00[0], b00[1]))
    assert -5.5 < dec < -4.0
    assert 30e-6 < np.linalg.norm(b00) < 34e-6

    b45 = igrf13(45.0, 0.0, 0.0, year=2020.0)
    dip = np.rad2deg(np.arctan2(-b45[2], np.hypot(b45[0], b45[1])))
    assert 58.0 < dip < 63.0

    b_saa = igrf13(-25.0, -50.0, 0.0, year=2020.0)
    assert np.linalg.norm(b_saa) < 24e-6  # anomaly minimum region

    b_pol = igrf13(85.0, 0.0, 0.0, year=2020.0)
    assert np.linalg.norm(b_pol) > 1.6 * np.linalg.norm(b00)


def test_igrf13_epoch_blend():
    from arts_tpu.atm.igrf import igrf13

    b15 = igrf13(40.0, 10.0, 0.0, year=2015.0)
    b20 = igrf13(40.0, 10.0, 0.0, year=2020.0)
    bmid = igrf13(40.0, 10.0, 0.0, year=2017.5)
    np.testing.assert_allclose(bmid, 0.5 * (b15 + b20), rtol=1e-12)
    # clamped outside the table
    np.testing.assert_allclose(
        igrf13(40.0, 10.0, 0.0, year=2035.0), b20, rtol=1e-12
    )


def test_magnetic_profile_igrf():
    prof = magnetic_profile(np.linspace(0, 80e3, 5), lat_deg=60.0, lon_deg=15.0)
    assert prof.shape == (3, 5)
    mag = np.linalg.norm(prof, axis=0)
    assert np.all(np.diff(mag) < 0)  # decays with altitude
    assert 40e-6 < mag[0] < 60e-6


def test_3d_pipeline_matches_1d_on_homogeneous_atmosphere():
    """A lat/lon-homogeneous Atmosphere3D driven along a slanted 3D path
    must reproduce the 1D pipeline on the equivalent (alt, dr) path."""
    import dataclasses

    import jax.numpy as jnp

    from test_clearsky import SCENE, F_GRID

    from arts_tpu.atm import Atmosphere3D
    from arts_tpu.fwd import (
        Clearsky3DScene,
        simulate_clearsky,
        simulate_clearsky_3d,
    )
    from arts_tpu.path import geometric_path_3d

    atm1 = SCENE.atm
    lat_g = jnp.asarray([-90.0, 90.0])
    lon_g = jnp.asarray([-180.0, 180.0])
    atm3 = Atmosphere3D(
        z=atm1.z,
        lat=lat_g,
        lon=lon_g,
        t=jnp.broadcast_to(atm1.t[:, None, None], atm1.t.shape + (2, 2)),
        p=jnp.broadcast_to(atm1.p[:, None, None], atm1.p.shape + (2, 2)),
        vmr=jnp.broadcast_to(
            atm1.vmr[:, :, None, None], atm1.vmr.shape + (2, 2)
        ),
    )
    sc3 = Clearsky3DScene(atm=atm3, cat=SCENE.cat, pf=SCENE.pf)

    p = geometric_path_3d(100e3, 12.0, 30.0, 160.0, 45.0, 0.0, 80e3, 2000.0)
    assert p.background == "surface"
    I3 = simulate_clearsky_3d(
        sc3, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.lat),
        jnp.asarray(p.lon), jnp.asarray(p.dr), background="surface",
    )
    I1 = simulate_clearsky(
        SCENE, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr),
        background="surface",
    )
    np.testing.assert_allclose(np.asarray(I3), np.asarray(I1), rtol=1e-10)


def test_3d_pipeline_sees_horizontal_gradient():
    """A warm-north/cold-south temperature gradient: the north-looking
    slant path must be warmer than the south-looking one."""
    import dataclasses

    import jax.numpy as jnp

    from test_clearsky import SCENE, F_GRID

    from arts_tpu.atm import Atmosphere3D
    from arts_tpu.fwd import Clearsky3DScene, simulate_clearsky_3d
    from arts_tpu.path import geometric_path_3d

    atm1 = SCENE.atm
    lat_g = jnp.asarray([-30.0, 50.0])
    lon_g = jnp.asarray([-180.0, 180.0])
    # +20 K at lat 50, -20 K at lat -30 (linear in between)
    t3 = jnp.stack(
        [atm1.t - 20.0, atm1.t + 20.0], axis=1
    )[:, :, None] * jnp.ones((1, 1, 2))
    atm3 = Atmosphere3D(
        z=atm1.z,
        lat=lat_g,
        lon=lon_g,
        t=t3,
        p=jnp.broadcast_to(atm1.p[:, None, None], atm1.p.shape + (2, 2)),
        vmr=jnp.broadcast_to(
            atm1.vmr[:, :, None, None], atm1.vmr.shape + (2, 2)
        ),
    )
    sc3 = Clearsky3DScene(
        atm=atm3, cat=SCENE.cat, pf=SCENE.pf,
        surface_temperature=jnp.asarray(288.0),
    )

    args = dict(z_surf=0.0, z_toa=80e3, max_step=2000.0)
    pn = geometric_path_3d(100e3, 10.0, 0.0, 135.0, 0.0, **args)
    ps = geometric_path_3d(100e3, 10.0, 0.0, 135.0, 180.0, **args)

    def run(p):
        return simulate_clearsky_3d(
            sc3, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.lat),
            jnp.asarray(p.lon), jnp.asarray(p.dr), background=p.background,
        )

    In, Is = np.asarray(run(pn)), np.asarray(run(ps))
    i_line = int(np.argmin(np.abs(np.asarray(F_GRID) - 183.31e9)))
    # the slant paths separate by ~1 deg latitude -> ~0.5 K contrast on
    # the 0.5 K/deg gradient; require a clear >0.1% split, north warmer
    assert In[i_line] > Is[i_line] * 1.001
    # and identical paths through the homogeneous pressure field agree on
    # the transparent-window surface view (same surface temperature)
    i_win = int(np.argmin(np.abs(np.asarray(F_GRID) - 200e9)))
    np.testing.assert_allclose(In[i_win], Is[i_win], rtol=5e-3)


def test_subsurface_disort_matches_recursion_absorbing():
    """Pure-absorption subsurface DISORT == the scalar layer recursion at
    each quadrature angle (spectral_radSubsurfaceDisortEmission parity)."""
    from arts_tpu.ops.planck import planck

    depth = jnp.linspace(0.0, 5.0, 21)
    t = 260.0 + 8.0 * depth  # warming with depth
    sub = SubsurfaceField(depth=depth, t=t, absorption=jnp.full((21,), 2.0))
    f = jnp.asarray([10e9, 90e9])

    out = sub.emerging_radiance_disort(f, nquad=8)
    mus = np.asarray(out.mu)[4:]  # positive (upwelling) quadrature cosines
    u_up = np.asarray(out.u0[:, 0, 4:])  # [F, 4] emerging at the surface
    for i, mu in enumerate(mus):
        I_rec = np.asarray(sub.emerging_radiance(f, mu=float(mu)))
        np.testing.assert_allclose(u_up[:, i], I_rec, rtol=1e-6)


def test_subsurface_disort_scattering_darkens():
    """Volume scattering under a cold sky lowers the emerging radiance
    below the pure-absorption value (snow emissivity effect) and reflects
    part of a warm downwelling illumination."""
    from arts_tpu.ops.planck import planck

    depth = jnp.linspace(0.0, 2.0, 31)
    t = jnp.full((31,), 265.0)
    f = jnp.asarray([37e9])
    base = SubsurfaceField(depth=depth, t=t, absorption=jnp.full((31,), 5.0))
    scat = SubsurfaceField(
        depth=depth, t=t, absorption=jnp.full((31,), 5.0),
        ssa=jnp.full((31,), 0.6), g=jnp.full((31,), 0.3),
    )
    I_base = float(base.emerging_radiance_disort(f, nquad=8).u0[0, 0, -1])
    I_scat = float(scat.emerging_radiance_disort(f, nquad=8).u0[0, 0, -1])
    B = float(planck(f, 265.0)[0])
    assert I_scat < I_base <= B * (1 + 1e-9)
    # warm illumination partially reflected by the scattering layer
    I_illum = float(
        scat.emerging_radiance_disort(
            f, I_down=jnp.asarray([B]), nquad=8
        ).u0[0, 0, -1]
    )
    assert I_illum > I_scat
    np.testing.assert_allclose(I_illum, B, rtol=0.05)  # near-cavity limit


def test_planet_bodies_and_ellipsoid_gravity():
    """Body registry + GM/r^2 gravity (planet_data.h, functional_gravity.cpp:7,
    gravity_operatorCentralMass m_planets.cc:261)."""
    from arts_tpu.path.geodesy import BODIES, ellipsoid_gravity, ellipsoid_radii

    # the seven planet_data.h bodies plus Io (surf_fieldIo sphere)
    for name in ("Earth", "Jupiter", "Mars", "Moon", "Mercury", "Venus",
                 "Saturn", "Io"):
        a, b = ellipsoid_radii(name)
        assert a >= b > 0

    g_earth = ellipsoid_gravity("Earth")
    a, b, GM = BODIES["Earth"]
    # equator: r = a; pole: r = b (purely radial GM/r^2, as the reference)
    np.testing.assert_allclose(g_earth(0.0, 0.0), GM / a**2, rtol=1e-12)
    np.testing.assert_allclose(g_earth(0.0, 90.0), GM / b**2, rtol=1e-9)
    assert abs(g_earth(0.0, 0.0) - 9.798) < 0.01
    # altitude decay ~ 1/r^2
    np.testing.assert_allclose(
        g_earth(400e3, 0.0), GM / (a + 400e3) ** 2, rtol=1e-12
    )
    # explicit GM/a/b path (gravity_operatorCentralMass: GM = G*mass)
    g_custom = ellipsoid_gravity(GM=GM, a=a, b=b)
    np.testing.assert_allclose(g_custom(123e3, 37.0), g_earth(123e3, 37.0))
    # Mars surface gravity ~ 3.7 m/s^2
    assert abs(ellipsoid_gravity("Mars")(0.0, 0.0) - 3.72) < 0.02


def test_hydrostatic_with_planet_gravity():
    """hydrostatic_pressure(gravity=...) uses the body's g: the Mars CO2
    column has a larger scale height than the same column under Earth g."""
    from arts_tpu.atm.field import hydrostatic_pressure
    from arts_tpu.path.geodesy import ellipsoid_gravity

    z = jnp.linspace(0.0, 30e3, 61)
    t = jnp.full((61,), 210.0)
    p_mars = hydrostatic_pressure(
        z, t, 636.0, mean_mass_gmol=43.34,
        gravity=ellipsoid_gravity("Mars"),
    )
    p_earthg = hydrostatic_pressure(
        z, t, 636.0, mean_mass_gmol=43.34,
        gravity=ellipsoid_gravity("Earth"),
    )
    assert float(p_mars[-1]) > float(p_earthg[-1])
    # closed-form isothermal check: H = kT/(m g), p = p0 exp(-z/H) with
    # g evaluated mid-column (small 1/r^2 variation over 30 km)
    import arts_tpu.constants as const

    g_mid = ellipsoid_gravity("Mars")(15e3, 0.0)
    H = const.k * 210.0 / (43.34e-3 / const.NA * g_mid)
    np.testing.assert_allclose(
        float(p_mars[-1]), 636.0 * np.exp(-30e3 / H), rtol=2e-3
    )
