"""End-to-end clear-sky emission: mirrors the structure of the reference's
examples/2-clearsky-radiative-transfer (nadir TOA radiance) on a synthetic
atmosphere + catalog, with physics-limit checks and Jacobians vs finite
differences (the reference's test methodology, tests/core/zeeman/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import arts_tpu.constants as const
from arts_tpu.atm import Atmosphere1D
from arts_tpu.atm.field import hydrostatic_pressure
from arts_tpu.fwd import ClearskyScene, simulate_clearsky, simulate_clearsky_bt
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.ops.planck import planck
from arts_tpu.path import geometric_path_1d


def make_scene(n_lev=51):
    z = jnp.linspace(0.0, 80e3, n_lev)
    t = 288.0 - 6.5e-3 * jnp.minimum(z, 12e3) + 1e-3 * jnp.maximum(z - 20e3, 0.0)
    p = hydrostatic_pressure(z, t, 101325.0)
    # species 0: absorber with ~1% VMR decaying with altitude; species 1: filler
    vmr0 = 0.01 * jnp.exp(-z / 2e3)
    vmr = jnp.stack([vmr0, 1.0 - vmr0])
    atm = Atmosphere1D(z=z, t=t, p=p, vmr=vmr)

    lines = [
        dict(
            f0=183.31e9,
            a=1e-5,
            e0=2.2e-21,
            gu=9.0,
            gl=7.0,
            iso_mass=18.0,
            iso_ratio=1.0,
            spec_idx=0,
            iso_idx=0,
            band_idx=0,
            t0=296.0,
            cutoff=np.inf,
            ls={
                "bath": {
                    "G0": (Law.T1, [2.5e4, 0.7]),
                    "D0": (Law.T0, [10.0]),
                }
            },
        ),
        dict(
            f0=230.0e9,
            a=3e-6,
            e0=1.0e-21,
            gu=5.0,
            gl=3.0,
            iso_mass=18.0,
            iso_ratio=1.0,
            spec_idx=0,
            iso_idx=0,
            band_idx=1,
            t0=296.0,
            cutoff=np.inf,
            ls={"bath": {"G0": (Law.T1, [2.0e4, 0.75])}},
        ),
    ]
    cat = build_catalog(lines)
    pf = rigid_rotor_table(1, 180.0, 1.5)
    return ClearskyScene(
        atm=atm, cat=cat, pf=pf, surface_temperature=jnp.asarray(288.0)
    )


SCENE = make_scene()
F_GRID = jnp.linspace(170e9, 240e9, 101)


def toa_nadir_path():
    p = geometric_path_1d(100e3, 180.0, 0.0, 80e3, max_stepsize_ok := 1000.0)
    return p


def test_nadir_radiance_physical():
    p = toa_nadir_path()
    assert p.background == "surface"
    I = simulate_clearsky(
        SCENE, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr), background="surface"
    )
    I = np.asarray(I)
    assert np.all(np.isfinite(I))
    # bounded by Planck at min/max atmospheric temperature
    tmin, tmax = 200.0, 290.0
    bmax = np.asarray(planck(F_GRID, tmax))
    assert np.all(I > 0)
    assert np.all(I <= bmax * 1.001)
    # line center (183 GHz) should be colder (higher, colder emission level)
    bt = np.asarray(simulate_clearsky_bt(
        SCENE, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr), background="surface"
    ))
    i_line = np.argmin(np.abs(np.asarray(F_GRID) - 183.31e9))
    i_win = np.argmin(np.abs(np.asarray(F_GRID) - 200e9))
    assert bt[i_line] < bt[i_win] - 5.0  # strong line is colder than window
    # window channel close to surface temperature
    assert bt[i_win] > 270.0


def test_transparent_atmosphere_gives_surface():
    scene0 = make_scene()
    # zero absorber
    import dataclasses

    atm0 = dataclasses.replace(
        scene0.atm, vmr=scene0.atm.vmr.at[0].set(0.0)
    )
    scene0 = dataclasses.replace(scene0, atm=atm0)
    p = toa_nadir_path()
    I = simulate_clearsky(
        scene0, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr), background="surface"
    )
    np.testing.assert_allclose(
        np.asarray(I), np.asarray(planck(F_GRID, 288.0)), rtol=1e-10
    )


def test_uplooking_vs_downlooking():
    pup = geometric_path_1d(0.0, 0.0, 0.0, 80e3, 1000.0)
    assert pup.background == "space"
    I = simulate_clearsky(
        SCENE, F_GRID, jnp.asarray(pup.alt), jnp.asarray(pup.dr), background="space"
    )
    bt = np.asarray(simulate_clearsky_bt(
        SCENE, F_GRID, jnp.asarray(pup.alt), jnp.asarray(pup.dr), background="space"
    ))
    # uplooking: line center warm (opaque, sees low atmosphere), window cold (CMB-ish)
    i_line = np.argmin(np.abs(np.asarray(F_GRID) - 183.31e9))
    i_win = np.argmin(np.abs(np.asarray(F_GRID) - 220e9))
    assert bt[i_line] > bt[i_win] + 20.0


def test_jacobian_temperature_vs_fd():
    import dataclasses

    p = toa_nadir_path()
    alt, dr = jnp.asarray(p.alt), jnp.asarray(p.dr)
    f = F_GRID[::20]

    def fwd_t(tprof):
        scene = dataclasses.replace(
            SCENE, atm=dataclasses.replace(SCENE.atm, t=tprof)
        )
        return simulate_clearsky(scene, f, alt, dr, background="surface")

    t0 = SCENE.atm.t
    jac = jax.jacrev(fwd_t)(t0)  # [F, N]
    assert np.all(np.isfinite(np.asarray(jac)))
    # FD on a mid-tropospheric level
    lev = 10
    h = 0.01
    e = jnp.zeros_like(t0).at[lev].set(h)
    fd = (np.asarray(fwd_t(t0 + e)) - np.asarray(fwd_t(t0 - e))) / (2 * h)
    np.testing.assert_allclose(np.asarray(jac[:, lev]), fd, rtol=5e-4, atol=1e-18)


def test_jacobian_vmr_vs_fd():
    import dataclasses

    p = toa_nadir_path()
    alt, dr = jnp.asarray(p.alt), jnp.asarray(p.dr)
    f = F_GRID[::20]

    def fwd_v(vmr0):
        atm = dataclasses.replace(
            SCENE.atm, vmr=SCENE.atm.vmr.at[0].set(vmr0)
        )
        scene = dataclasses.replace(SCENE, atm=atm)
        return simulate_clearsky(scene, f, alt, dr, background="surface")

    v0 = SCENE.atm.vmr[0]
    jac = jax.jacrev(fwd_v)(v0)
    lev = 5
    h = 1e-7
    e = jnp.zeros_like(v0).at[lev].set(h)
    fd = (np.asarray(fwd_v(v0 + e)) - np.asarray(fwd_v(v0 - e))) / (2 * h)
    np.testing.assert_allclose(np.asarray(jac[:, lev]), fd, rtol=1e-4, atol=1e-16)


def test_path_geometry():
    # nadir from above TOA
    p = geometric_path_1d(100e3, 180.0, 0.0, 80e3, 1000.0)
    assert p.background == "surface"
    np.testing.assert_allclose(p.alt[0], 80e3)
    np.testing.assert_allclose(p.alt[-1], 0.0)
    np.testing.assert_allclose(p.dr, 1000.0 * np.ones_like(p.dr), rtol=0.3)
    # limb path: tangent above surface, exits to space
    plimb = geometric_path_1d(100e3, 95.0, 0.0, 80e3, 5000.0)
    assert plimb.background == "space"
    assert plimb.alt.min() > 0.0
    assert plimb.alt[0] == pytest.approx(80e3)
    assert plimb.alt[-1] == pytest.approx(80e3)
    # slant downlooking 45 deg
    ps = geometric_path_1d(100e3, 135.0, 0.0, 80e3, 1000.0)
    assert ps.background == "surface"
    assert ps.s[-1] > 80e3 * np.sqrt(2) * 0.98


def test_wind_doppler_shift():
    """Wind along the LOS Doppler-shifts absorption (freq_grid_pathFromPath
    parity): 300 m/s along an uplooking LOS produces an O(v/c) spectral
    perturbation in the line wings (the core is saturated)."""
    import dataclasses as dc

    wind = jnp.stack(
        [jnp.zeros_like(SCENE.atm.z), jnp.zeros_like(SCENE.atm.z),
         jnp.full_like(SCENE.atm.z, 300.0)]
    )
    scene_w = dc.replace(SCENE, atm=dc.replace(SCENE.atm, wind=wind))
    pup = geometric_path_1d(0.0, 0.0, 0.0, 80e3, 2000.0)
    alt, dr = jnp.asarray(pup.alt), jnp.asarray(pup.dr)
    za = jnp.asarray(pup.za)
    f = jnp.linspace(183.31e9 - 2e10, 183.31e9 + 2e10, 401)
    I0 = np.asarray(simulate_clearsky(scene_w, f, alt, dr, background="space"))
    I1 = np.asarray(
        simulate_clearsky(scene_w, f, alt, dr, background="space", path_za=za)
    )
    rel = np.abs(I1 - I0).max() / I0.max()
    assert 1e-7 < rel < 1e-4  # O(v/c * dlnI/dlnf)


def test_limb_radiance():
    """Limb-sounding geometry end-to-end (BASELINE config 2 geometry)."""
    p = geometric_path_1d(100e3, 99.7, 0.0, 80e3, 5000.0)  # tangent ~ 8 km
    assert p.background == "space"
    I = simulate_clearsky(
        SCENE, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr), background="space"
    )
    bt = np.asarray(simulate_clearsky_bt(
        SCENE, F_GRID, jnp.asarray(p.alt), jnp.asarray(p.dr), background="space"
    ))
    assert np.all(np.isfinite(bt))
    # at the 183 GHz line center the limb path is opaque -> warm; in the
    # window it is transparent down to the tangent -> sees cold space
    i_line = np.argmin(np.abs(np.asarray(F_GRID) - 183.31e9))
    i_win = np.argmin(np.abs(np.asarray(F_GRID) - 205e9))
    assert bt[i_line] > 150.0
    assert bt[i_win] < bt[i_line]
