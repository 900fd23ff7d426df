"""Surface reflection: Fresnel algebra and reflecting-surface clear-sky
emission (parity: rtepack_surface.{h,cc} + spectral_radSurfaceReflectance,
src/m_surface.cc:140-240).  Methodology mirrors the reference's physics-limit
tests: thermodynamic-equilibrium closure, Brewster angle, normal-incidence
reductions, and Jacobians vs finite differences."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from arts_tpu.fwd import simulate_clearsky, ZeemanScene, simulate_clearsky_polarized
from arts_tpu.ops.planck import planck
from arts_tpu.rtepack.surface import (
    flat_scalar_reflection,
    fresnel,
    fresnel_reflectance,
    fresnel_reflectance_nonspecular,
    fresnel_reflectance_specular,
    reflection,
    specular_radiance,
    specular_reflected_direction,
)

from test_clearsky import F_GRID, SCENE, toa_nadir_path


def test_fresnel_normal_incidence():
    rv, rh = fresnel(1.0, 2.0, 0.0)
    # at normal incidence |R|^2 = ((n1-n2)/(n1+n2))^2 for both pols
    r_expect = ((1.0 - 2.0) / (1.0 + 2.0)) ** 2
    np.testing.assert_allclose(np.abs(rv) ** 2, r_expect, rtol=1e-12)
    np.testing.assert_allclose(np.abs(rh) ** 2, r_expect, rtol=1e-12)


def test_fresnel_brewster():
    n1, n2 = 1.0, 1.5
    theta_b = np.rad2deg(np.arctan(n2 / n1))
    rv, rh = fresnel(n1, n2, theta_b)
    assert abs(rv) < 1e-12  # vertical (p) polarization vanishes at Brewster
    assert abs(rh) > 0.1


def test_fresnel_grazing_total():
    rv, rh = fresnel(1.0, 1.5, 89.999)
    np.testing.assert_allclose(np.abs(rv), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(rh), 1.0, atol=1e-3)


def test_fresnel_reflectance_matrix_structure():
    rv, rh = fresnel(1.0, 4.0 + 0.5j, 53.0)
    M = np.asarray(fresnel_reflectance(rv, rh))
    pv, ph = abs(rv) ** 2, abs(rh) ** 2
    np.testing.assert_allclose(M[0, 0], 0.5 * (pv + ph), rtol=1e-12)
    np.testing.assert_allclose(M[0, 1], 0.5 * (pv - ph), rtol=1e-12)
    np.testing.assert_allclose(M[1, 0], M[0, 1], rtol=1e-12)
    # unpolarized input: reflected I = mean power reflectance
    I = M @ np.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(I[0], 0.5 * (pv + ph), rtol=1e-12)
    # 2x2 lower block from amplitudes
    a = rh * np.conj(rv)
    np.testing.assert_allclose(M[2, 2], np.real(a), rtol=1e-12)
    np.testing.assert_allclose(M[3, 3], np.real(a), rtol=1e-12)


def test_specular_direction_and_normal_incidence_reduction():
    n = jnp.array([0.0, 0.0, 1.0])
    k = jnp.array([0.0, 0.0, -1.0])  # straight down
    out = np.asarray(specular_reflected_direction(k, n))
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-14)

    rv, rh = fresnel(1.0, 3.0, 0.0)
    M_flat = np.asarray(fresnel_reflectance(rv, rh))
    M_spec = np.asarray(fresnel_reflectance_specular(rv, rh, k, n))
    # normal incidence: specular matrix = flat with U,V sign flips
    F = np.diag([1.0, 1.0, -1.0, -1.0])
    np.testing.assert_allclose(M_spec, F @ M_flat, atol=1e-14)
    # nonspecular with k_out = reflected direction likewise
    M_non = np.asarray(
        fresnel_reflectance_nonspecular(rv, rh, k, jnp.array([0.0, 0.0, 1.0]), n)
    )
    np.testing.assert_allclose(M_non, F @ M_flat, atol=1e-14)


def test_specular_vs_nonspecular_consistency():
    # for the true specular outgoing direction the two frame constructions
    # must agree
    n = jnp.array([0.0, 0.0, 1.0])
    k = jnp.array([0.5, 0.3, -0.8])
    k = k / jnp.linalg.norm(k)
    k_out = specular_reflected_direction(k, n)
    rv, rh = fresnel(1.0, 2.0 + 0.1j, 40.0)
    M1 = np.asarray(fresnel_reflectance_specular(rv, rh, k, n))
    M2 = np.asarray(fresnel_reflectance_nonspecular(rv, rh, k, k_out, n))
    np.testing.assert_allclose(M1, M2, atol=1e-12)


def test_flat_scalar_reflection_algebra():
    I = jnp.array([2.0, 0.5, -0.3, 0.2])
    B = jnp.array([1.0, 0.0, 0.0, 0.0])
    out = np.asarray(flat_scalar_reflection(I, 0.4, B))
    np.testing.assert_allclose(
        out, [0.4 * 2.0 + 0.6, 0.4 * 0.5, 0.4 * -0.3, -0.4 * 0.2], rtol=1e-14
    )
    # reflection() with R = r*I4 matches the scalar version
    R = 0.4 * jnp.eye(4)
    out2 = np.asarray(reflection(I, R, B))
    np.testing.assert_allclose(out2, out, rtol=1e-14)


def test_specular_radiance_energy_closure():
    # I_in == J  ->  I_out == J (perfect thermodynamic closure)
    n = jnp.array([0.0, 0.0, 1.0])
    k = jnp.array([0.3, -0.2, -0.93])
    k = k / jnp.linalg.norm(k)
    rv, rh = fresnel(1.0, 5.0 + 1.0j, 30.0)
    J = jnp.array([3.0, 0.0, 0.0, 0.0])
    out = np.asarray(specular_radiance(J, J, rv, rh, k, n))
    np.testing.assert_allclose(out, np.asarray(J), atol=1e-14)


# ---------------------------------------------------------------- pipeline


def _isothermal_scene(T=260.0):
    sc = SCENE
    atm = dataclasses.replace(sc.atm, t=jnp.full_like(sc.atm.t, T))
    return dataclasses.replace(
        sc,
        atm=atm,
        surface_temperature=jnp.asarray(T),
        surface_emissivity=jnp.asarray(0.35),
    )


def test_reflecting_surface_thermodynamic_equilibrium():
    """Isothermal atmosphere + surface at T: the upwelling radiance must be
    exactly B(T) for ANY emissivity — the reflected downwelling and the
    surface emission rebuild the blackbody (Kirchhoff closure).  The CMB
    term breaks it only where the atmosphere is transparent, so test at the
    opaque line center."""
    scene = _isothermal_scene(260.0)
    p = toa_nadir_path()
    I = simulate_clearsky(
        scene,
        F_GRID,
        jnp.asarray(p.alt),
        jnp.asarray(p.dr),
        background="surface_reflect",
    )
    B = planck(F_GRID, 260.0)
    i_line = int(np.argmin(np.abs(np.asarray(F_GRID) - 183.31e9)))
    np.testing.assert_allclose(
        np.asarray(I)[i_line], np.asarray(B)[i_line], rtol=1e-10
    )


def test_reflecting_surface_blackbody_limit():
    """emissivity = 1 reduces surface_reflect to the blackbody surface."""
    scene = dataclasses.replace(SCENE, surface_emissivity=jnp.asarray(1.0))
    p = toa_nadir_path()
    a, d = jnp.asarray(p.alt), jnp.asarray(p.dr)
    I1 = simulate_clearsky(scene, F_GRID, a, d, background="surface_reflect")
    I2 = simulate_clearsky(scene, F_GRID, a, d, background="surface")
    np.testing.assert_allclose(np.asarray(I1), np.asarray(I2), rtol=1e-12)


def test_reflecting_surface_cools_vs_blackbody():
    """A reflective (low-e) surface is strictly colder than a blackbody one
    whenever the downwelling sky is colder than the surface; in a
    transparent atmosphere the limit is exact: I = e B_s + (1 - e) B_cmb."""
    import arts_tpu.constants as const

    p = toa_nadir_path()
    a, d = jnp.asarray(p.alt), jnp.asarray(p.dr)
    sc_refl = dataclasses.replace(SCENE, surface_emissivity=jnp.asarray(0.5))
    I_bb = simulate_clearsky(SCENE, F_GRID, a, d, background="surface")
    I_rf = simulate_clearsky(sc_refl, F_GRID, a, d, background="surface_reflect")
    # never warmer anywhere (equal at opaque line centers where the surface
    # is invisible), strictly colder at the most transparent channel
    assert np.all(np.asarray(I_rf) <= np.asarray(I_bb) * (1 + 1e-12))
    i_min = int(np.argmin(np.asarray(I_rf) / np.asarray(I_bb)))
    assert np.asarray(I_rf)[i_min] < 0.999 * np.asarray(I_bb)[i_min]

    # transparent atmosphere: exact closed form
    atm0 = dataclasses.replace(SCENE.atm, vmr=SCENE.atm.vmr.at[0].set(0.0))
    sc0 = dataclasses.replace(
        sc_refl, atm=atm0, surface_temperature=jnp.asarray(288.0)
    )
    I0 = simulate_clearsky(sc0, F_GRID, a, d, background="surface_reflect")
    expect = 0.5 * np.asarray(planck(F_GRID, 288.0)) + 0.5 * np.asarray(
        planck(F_GRID, const.cosmic_microwave_background_temperature)
    )
    np.testing.assert_allclose(np.asarray(I0), expect, rtol=1e-10)


def test_reflecting_surface_emissivity_jacobian_vs_fd():
    p = toa_nadir_path()
    a, d = jnp.asarray(p.alt), jnp.asarray(p.dr)
    f = F_GRID[::20]

    def fwd(e):
        sc = dataclasses.replace(SCENE, surface_emissivity=e)
        return simulate_clearsky(sc, f, a, d, background="surface_reflect")

    e0 = jnp.asarray(0.7)
    g = np.asarray(jax.jacfwd(fwd)(e0))
    h = 1e-6
    fd = np.asarray((fwd(e0 + h) - fwd(e0 - h)) / (2 * h))
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-22)


def test_polarized_reflecting_surface():
    """Zeeman scene over a reflecting surface: equilibrium closure at the
    line center (isothermal) and correct V mirroring."""
    from test_zeeman import ZCAT, PF, F

    nlev = 41
    z = jnp.linspace(0.0, 80e3, nlev)
    T = 250.0
    t = jnp.full((nlev,), T)
    from arts_tpu.atm import Atmosphere1D
    from arts_tpu.atm.field import hydrostatic_pressure

    pgrid = hydrostatic_pressure(z, t, 101325.0)
    vmr = jnp.full((1, nlev), 0.21)
    mag = jnp.broadcast_to(jnp.array([[2e-5], [1e-5], [3e-5]]), (3, nlev))
    atm = Atmosphere1D(z=z, t=t, p=pgrid, vmr=vmr, mag=mag)
    scene = ZeemanScene(
        atm=atm,
        zcat=ZCAT,
        pf=PF,
        surface_temperature=jnp.asarray(T),
        surface_reflectance=jnp.asarray(0.6),
    )
    # nadir-ish path, observer at 80 km looking down (za=180)
    alts = z[::-1]
    za = jnp.full((nlev,), 180.0)
    dr = jnp.diff(z)[::-1]
    I = simulate_clearsky_polarized(
        scene, F, alts, za, dr, background="surface_reflect"
    )
    I = np.asarray(I)
    assert np.all(np.isfinite(I))
    B = np.asarray(planck(F, T))
    i_line = int(np.argmin(np.abs(np.asarray(F) - 118.75e9)))
    # opaque line center: equilibrium closure to B(T), Q/U/V -> 0
    np.testing.assert_allclose(I[i_line, 0], B[i_line], rtol=1e-6)
    np.testing.assert_allclose(I[i_line, 1:], 0.0, atol=1e-9 * B[i_line])


def test_nonspecular_patches():
    """Patch-integral rough-surface scattering (rtepack::
    nonspecular_radiance_from_patches parity): Lambertian-like closure —
    a hemisphere of patches all emitting J with perfect reflection
    amplitudes integrates to I ~ J + albedo-weighted J; and behind-surface
    patches contribute nothing."""
    from arts_tpu.rtepack.surface import nonspecular_radiance_from_patches

    radius = 6.371e6
    # a north-facing slope at (0, 0), 2000 m, scattering radiance emitted
    # by plains patches to its north (the geometry the reference's patch
    # model targets: radial patch normals can only illuminate a receiver
    # above them, whose own receiving surface must then be tilted)
    lats = np.linspace(0.05, 0.6, 12)
    lons = np.linspace(-0.3, 0.3, 13)
    LA, LO = np.meshgrid(lats, lons, indexing="ij")
    coords = jnp.asarray(np.stack([LA.ravel(), LO.ravel()], -1))
    P = coords.shape[0]
    alts = jnp.zeros((P,))
    sources = jnp.zeros((P, 4)).at[:, 0].set(1.0)
    J = jnp.asarray([0.5, 0.0, 0.0, 0.0])
    # ECEF at (0,0): +x is up (radial), +z is north -> north-facing cliff
    n = jnp.asarray([0.0, 0.0, 1.0])
    k_out = jnp.asarray(np.array([0.3, 0.0, 0.95]) / np.hypot(0.3, 0.95))
    rv = jnp.asarray(0.7 + 0.0j)
    rh = jnp.asarray(0.7 + 0.0j)
    args = (jnp.asarray([0.0, 0.0]), 2000.0, n, k_out, radius,
            float(lats[1] - lats[0]), float(lons[1] - lons[0]))
    out = np.asarray(
        nonspecular_radiance_from_patches(
            coords, alts, sources, J, rv, rh, *args
        )
    )
    assert np.all(np.isfinite(out))
    assert out[0] > float(J[0])  # scattered light adds to the emission
    # zero-reflectance limit: pure emission
    out0 = np.asarray(
        nonspecular_radiance_from_patches(
            coords, alts, sources, J, 0.0j, 0.0j, *args
        )
    )
    np.testing.assert_allclose(out0, np.asarray(J), atol=1e-14)
    # patches behind the cliff face (south) must not contribute
    coords_s = jnp.asarray(
        np.stack([-LA.ravel(), LO.ravel()], -1)
    )
    outs = np.asarray(
        nonspecular_radiance_from_patches(
            coords_s, alts, sources, J, rv, rh, *args
        )
    )
    np.testing.assert_allclose(outs, np.asarray(J), atol=1e-14)
