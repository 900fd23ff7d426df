"""All-sky DISORT pipeline tests: clearsky-limit cross-check against the
pencil-beam clearsky solver (the reference's own validation pattern,
examples/3-allsky-radiative-transfer/1-disort/1-disort.sht.py:182 compares
DISORT clearsky against known brightness temperatures), plus cloudy-sky
physics checks with HG and habit scatterers."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from arts_tpu.fwd_allsky import AllskyScene, HabitProfile, simulate_allsky
from arts_tpu.ops.planck import inv_planck
from arts_tpu.scattering import (
    BinnedPSD,
    HenyeyGreenstein,
    MGDSingleMoment,
    ParticleHabit,
    ScatteringHabit,
)
from tests.test_clearsky import SCENE as CK_SCENE
from tests.test_clearsky import F_GRID, simulate_clearsky_bt

F = jnp.asarray(np.asarray(F_GRID)[::10])  # 11 freqs


def allsky_scene(scatterers=()):
    return AllskyScene(
        atm=CK_SCENE.atm,
        cat=CK_SCENE.cat,
        pf=CK_SCENE.pf,
        scatterers=tuple(scatterers),
        surface_temperature=CK_SCENE.surface_temperature,
    )


def test_clearsky_limit_matches_pencil_beam():
    """DISORT with no particles ~ nadir pencil-beam clearsky (different
    discretizations, so ~0.5 K agreement like the reference's own check)."""
    out = simulate_allsky(allsky_scene(), F, nquad=16)
    # TOA upwelling at the most-nadir stream (mu closest to 1)
    bt_disort = np.asarray(inv_planck(out.u0[:, 0, -1], F))
    # pencil-beam clearsky along vertical from TOA
    from arts_tpu.path import geometric_path_1d

    p = geometric_path_1d(100e3, 180.0, 0.0, 80e3, 500.0)
    bt_beam = np.asarray(
        simulate_clearsky_bt(
            CK_SCENE, F, jnp.asarray(p.alt), jnp.asarray(p.dr), background="surface"
        )
    )
    # mu = 0.99 stream vs mu = 1: small airmass difference; loose tolerance
    np.testing.assert_allclose(bt_disort, bt_beam, atol=1.5)


def test_cloud_darkens_microwave_window():
    """A scattering cloud lowers window-channel TB over a warm surface."""
    cloud = HenyeyGreenstein(
        ext=jnp.where(
            (CK_SCENE.atm.z > 4e3) & (CK_SCENE.atm.z < 8e3), 5e-4, 0.0
        ),
        ssa=jnp.full(CK_SCENE.atm.z.shape, 0.9),
        g=jnp.full(CK_SCENE.atm.z.shape, 0.7),
    )
    clear = simulate_allsky(allsky_scene(), F, nquad=16)
    cloudy = simulate_allsky(allsky_scene([cloud]), F, nquad=16)
    bt_clear = np.asarray(inv_planck(clear.u0[:, 0, -1], F))
    bt_cloud = np.asarray(inv_planck(cloudy.u0[:, 0, -1], F))
    iwin = int(np.argmin(np.abs(np.asarray(F) - 219e9)))
    assert bt_cloud[iwin] < bt_clear[iwin] - 2.0
    assert np.all(np.isfinite(bt_cloud))


def make_habit():
    sizes = jnp.asarray(np.logspace(-5, -2.3, 12))  # 10 um .. 5 mm
    fg = jnp.asarray([150e9, 250e9])
    tg = jnp.asarray([200.0, 300.0])
    S, Fh, T = 12, 2, 2
    # toy Mie-like: ext ~ D^2 scaled with freq; ssa ~ 0.6; HG-ish moments
    D = np.asarray(sizes)
    ext = np.broadcast_to((D**2)[:, None, None] * np.asarray([1.0, 2.0])[None, :, None], (S, Fh, T))
    sca = 0.6 * ext
    g = 0.6
    nl = 8
    leg = np.broadcast_to(g ** np.arange(nl), (S, Fh, T, nl))
    return ParticleHabit(
        sizes=sizes,
        f_grid=fg,
        t_grid=tg,
        ext=jnp.asarray(ext),
        sca=jnp.asarray(sca),
        leg=jnp.asarray(leg),
        a=jnp.asarray(500.0 * np.pi / 6),
        b=jnp.asarray(3.0),
    )


def test_habit_psd_pipeline():
    habit = make_habit()
    psd = MGDSingleMoment.from_name("Wang16")
    wc = jnp.where(
        (CK_SCENE.atm.z > 3e3) & (CK_SCENE.atm.z < 7e3), 1e-4, 0.0
    )  # kg/m^3
    hp = HabitProfile(habit_psd=ScatteringHabit(habit=habit, psd=psd), wc=wc)
    out = simulate_allsky(allsky_scene([hp]), F, nquad=8)
    bt = np.asarray(inv_planck(out.u0[:, 0, -1], F))
    assert np.all(np.isfinite(bt))
    assert np.all(bt > 100) and np.all(bt < 300)


def test_mgd_psd_moment_consistency():
    """MGD lambda chosen so the mass integral reproduces the water content."""
    psd = MGDSingleMoment.from_name("Wang16")
    a, b = 500.0 * np.pi / 6, 3.0
    wc = 2e-4
    D = np.logspace(-6.5, -1.5, 4001)
    n = np.asarray(psd.evaluate(wc, 280.0, jnp.asarray(D), jnp.asarray(a), jnp.asarray(b)))
    mass = np.trapezoid(a * D**b * n, D)
    np.testing.assert_allclose(mass, wc, rtol=1e-3)


def test_binned_psd():
    psd = BinnedPSD(
        bins=jnp.asarray([1e-5, 1e-4, 1e-3]), counts=jnp.asarray([1e6, 1e3])
    )
    vals = np.asarray(
        psd.evaluate(0.0, 280.0, jnp.asarray([5e-6, 5e-5, 5e-4, 5e-3]))
    )
    np.testing.assert_allclose(vals, [0.0, 1e6, 1e3, 0.0])
