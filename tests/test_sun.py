"""Sun in the pencil beam: occultation (sun at end of path attenuated by
Beer-Lambert), miss -> CMB, scattered-sun single-Rayleigh source, gridded
solar spectra, and the Rayleigh phase matrix.

Parity methodology: spectral_radSunOrCosmicBackground
(workspace_methods.cpp:4858), hit_sun (sun.cc:276), sunFromGrid
(m_sun.cc:41), spectral_rad_scat_pathSunsFirstOrderRayleigh
(m_sun.cc:306-436), rtepack::rayleigh_scattering
(rtepack_scattering.cc:186).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arts_tpu.fwd import ClearskyScene, simulate_clearsky
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.atm.standard import standard_atmosphere
from arts_tpu.path.geometry import geometric_path_1d
from arts_tpu.rtepack.scattering import (
    rayleigh_scat_airsimple,
    rayleigh_scattering,
)
from arts_tpu.sun import (
    Sun,
    hit_sun,
    hit_sun_los,
    sun_blackbody,
    sun_from_grid,
)

F = jnp.linspace(180e9, 184e9, 33)

LINES = [
    dict(
        f0=183.31e9, a=3e-3, e0=2.0e-21, gu=5.0, gl=3.0, iso_mass=18.0,
        iso_ratio=1.0, spec_idx=0, iso_idx=0, band_idx=0, t0=296.0,
        cutoff=np.inf, ls={"bath": {"G0": (Law.T1, [1.2e4, 0.7])}},
    )
]


def scene():
    atm = standard_atmosphere(n_levels=40, z_top=80e3, species=("H2O",))
    return ClearskyScene(
        atm=atm, cat=build_catalog(LINES), pf=rigid_rotor_table(1, 174.6, 1.5)
    )


def test_hit_sun_los_geometry():
    sun = sun_blackbody(F)
    alpha_deg = float(np.degrees(np.arctan2(6.963242e8, 1.495978707e11)))
    # dead-on
    _, hit = hit_sun_los(sun, 120.0, 40.0, 120.0, 40.0)
    assert bool(hit)
    # just inside / just outside the disk
    _, hin = hit_sun_los(sun, 120.0 + 0.9 * alpha_deg, 40.0, 120.0, 40.0)
    _, hout = hit_sun_los(sun, 120.0 + 1.5 * alpha_deg, 40.0, 120.0, 40.0)
    assert bool(hin) and not bool(hout)


def test_hit_sun_geodetic():
    sun = sun_blackbody(F, latitude=0.0, longitude=0.0)
    pos = (jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
    # sun at (lat 0, lon 0) seen from (0, 0, alt 0): straight up
    beta, hit = hit_sun(sun, pos, (jnp.asarray(0.0), jnp.asarray(0.0)),
                        6.371e6)
    assert bool(hit) and float(beta) < 1e-6
    _, miss = hit_sun(sun, pos, (jnp.asarray(90.0), jnp.asarray(0.0)),
                      6.371e6)
    assert not bool(miss)


def test_occultation_beer_lambert():
    """Limb path ending in space pointed at the sun: radiance equals the
    Beer-Lambert-attenuated photosphere radiance plus (tiny) emission."""
    sc = scene()
    path = geometric_path_1d(
        alt_obs=600e3, za_obs=113.2, z_surf=0.0, z_toa=80e3, max_step=2e3
    )
    assert path.background == "space"
    alt = jnp.asarray(path.alt)
    dr = jnp.asarray(path.dr)
    za = jnp.asarray(path.za)
    sun = sun_blackbody(F)
    # sun exactly along the viewing direction at the path end
    sun_za = float(path.za[-1])

    I_sun = simulate_clearsky(
        sc, F, alt, dr, path_za=za, sun=sun, sun_za=sun_za, sun_aa=0.0
    )
    I_no = simulate_clearsky(sc, F, alt, dr, path_za=za)

    # transmittance of the path from the absorption directly
    pts = sc.atm.at(alt)
    k = jax.vmap(
        lambda t, p, v: jnp.asarray(
            __import__("arts_tpu.lbl.voigt", fromlist=["absorption"]).absorption(
                F, sc.cat, sc.pf, t, p, v
            )
        )
    )(pts.t, pts.p, pts.vmr)
    tau = jnp.sum(0.5 * (k[1:] + k[:-1]) * dr[:, None], axis=0)
    trans = np.exp(-np.asarray(tau))

    analytic = trans * np.asarray(sun.spectrum)
    got = np.asarray(I_sun) - np.asarray(I_no)  # removes emission+CMB terms
    # I_sun - I_no = T * (S_sun - CMB); compare against analytic difference
    # (scale-aware atol: opaque line-center channels have T ~ e^-30 where
    # relative comparison of rounded exponentials is meaningless)
    from arts_tpu.ops.planck import planck
    import arts_tpu.constants as const

    cmb = np.asarray(
        planck(F, jnp.asarray(const.cosmic_microwave_background_temperature))
    )
    expect = trans * (np.asarray(sun.spectrum) - cmb)
    np.testing.assert_allclose(
        got, expect, rtol=1e-3, atol=1e-6 * expect.max()
    )
    # and the sun dominates where the path is transparent: radiance within
    # a few % of pure Beer-Lambert sun (thermal emission ~ 4e-13 vs solar
    # ~1e-11 W/(m^2 Hz sr) at these frequencies)
    win = trans > 0.5
    assert win.any()
    np.testing.assert_allclose(
        np.asarray(I_sun)[win], analytic[win], rtol=5e-2
    )

    # sun off-axis by 2 degrees: no hit, radiance back to thermal-only
    I_miss = simulate_clearsky(
        sc, F, alt, dr, path_za=za, sun=sun, sun_za=sun_za + 2.0, sun_aa=0.0
    )
    np.testing.assert_allclose(np.asarray(I_miss), np.asarray(I_no), rtol=1e-12)


def test_scattered_sun_nonzero_off_axis():
    """Sun off the beam axis contributes via single Rayleigh scattering
    (visible frequencies, where air Rayleigh matters); the contribution
    scales as the solar solid angle and vanishes with the sun below the
    horizon."""
    Fv = jnp.linspace(4.5e14, 5.5e14, 9)  # ~0.55-0.67 um
    atm = standard_atmosphere(n_levels=40, z_top=80e3, species=("H2O",))
    sc = ClearskyScene(atm=atm, cat=None, pf=None)
    path = geometric_path_1d(
        alt_obs=0.0, za_obs=30.0, z_surf=0.0, z_toa=80e3, max_step=2e3
    )
    alt = jnp.asarray(path.alt)
    dr = jnp.asarray(path.dr)
    za = jnp.asarray(path.za)
    sun = sun_blackbody(Fv)

    I_plain = simulate_clearsky(sc, Fv, alt, dr, path_za=za)
    I_scat = simulate_clearsky(
        sc, Fv, alt, dr, path_za=za, sun=sun, sun_za=50.0, sun_aa=120.0,
        scattered_sun=True,
    )
    dI = np.asarray(I_scat) - np.asarray(I_plain)
    assert (dI > 0).all()  # blue-sky radiance

    # magnitude: a sizeable fraction of the attenuated solar radiance
    # (sky-to-sun ratio ~1e-5..1e-4 for the solar solid-angle factor)
    ratio = dI / np.asarray(sun.spectrum)
    assert (ratio > 1e-7).all() and (ratio < 1e-3).all()

    # scattered radiance scales with the solar solid angle (~1/d^2)
    import dataclasses as dc

    sun_far = dc.replace(sun, distance=2.0 * sun.distance)
    I_far = simulate_clearsky(
        sc, Fv, alt, dr, path_za=za, sun=sun_far, sun_za=50.0, sun_aa=120.0,
        scattered_sun=True,
    )
    dI_far = np.asarray(I_far) - np.asarray(I_plain)
    np.testing.assert_allclose(dI_far, dI / 4.0, rtol=1e-4)

    I_night = simulate_clearsky(
        sc, Fv, alt, dr, path_za=za, sun=sun, sun_za=120.0, sun_aa=120.0,
        scattered_sun=True,
    )
    dI_n = np.asarray(I_night) - np.asarray(I_plain)
    # below horizon: no transmitted sun; only the (tiny) added Rayleigh
    # extinction changes the radiance
    assert np.abs(dI_n).max() < np.abs(dI).max() * 1e-3


def test_sun_from_grid_interp_and_planck_fill():
    fg = jnp.linspace(100e9, 200e9, 21)
    raw_f = jnp.asarray([120e9, 150e9, 180e9])
    raw_v = jnp.asarray([1.0, 2.0, 3.0]) * 1e-12  # photosphere flux
    sun = sun_from_grid(fg, raw_f, raw_v, temperature=5000.0)
    # inside the raw grid: linear interpolation / pi
    i = 10  # f = 150 GHz
    np.testing.assert_allclose(
        float(sun.spectrum[i]), 2e-12 / np.pi, rtol=1e-6
    )
    # outside: blackbody fill
    from arts_tpu.ops.planck import planck

    np.testing.assert_allclose(
        float(sun.spectrum[0]), float(planck(fg[0], 5000.0)), rtol=1e-6
    )


def test_rayleigh_phase_matrix():
    # normalization: (1/4pi) int F11 dOmega = 1 (depol 0)
    mu = np.linspace(-1, 1, 20001)
    F11 = 0.75 * (1 + mu**2)
    np.testing.assert_allclose(np.trapezoid(F11, mu) / 2.0, 1.0, rtol=1e-6)

    # forward scattering: diagonal-ish, F11 = 1.5 at theta=0 (depol 0)
    M = np.asarray(
        rayleigh_scattering(jnp.asarray([60.0, 30.0]), jnp.asarray([60.0, 30.0]))
    )
    np.testing.assert_allclose(M[0, 0], 1.5, rtol=1e-6)
    np.testing.assert_allclose(M[0, 1], 0.0, atol=1e-6)

    # 90-degree scattering in the meridian plane: fully polarizing
    M90 = np.asarray(
        rayleigh_scattering(jnp.asarray([0.0, 0.0]), jnp.asarray([90.0, 0.0]))
    )
    np.testing.assert_allclose(M90[0, 0], 0.75, rtol=1e-6)
    np.testing.assert_allclose(M90[0, 1], -0.75, rtol=1e-6)

    # depolarization weakens polarization
    Md = np.asarray(
        rayleigh_scattering(
            jnp.asarray([0.0, 0.0]), jnp.asarray([90.0, 0.0]), 0.1
        )
    )
    assert abs(Md[0, 1]) < 0.75

    # energy: scattering coefficient positive, ~lambda^-4 growth
    ks1 = float(rayleigh_scat_airsimple(jnp.asarray(300e9), 1e5, 288.0))
    ks2 = float(rayleigh_scat_airsimple(jnp.asarray(600e9), 1e5, 288.0))
    assert ks1 > 0 and 15.0 < ks2 / ks1 < 17.5  # ~2^4 with dispersion


def test_sun_leg_tau_vs_brute_force_near_horizon():
    """sun_leg_tau (spherical-shell geometric sun leg, the reference's
    find_sun_path parity) vs a brute-force step integration along the
    ray, at sun zenith angles 85-95 deg where plane-parallel visibly
    breaks (VERDICT r4 item 6)."""
    import numpy as np

    from arts_tpu.fwd import sun_leg_tau
    from arts_tpu.path.geometry import EARTH_RADIUS as R

    zg = np.linspace(0.0, 80e3, 41)
    k_mid = (1e-5 * np.exp(-0.5 * (zg[:-1] + zg[1:]) / 2 / 8e3))[:, None]
    alts = np.asarray([1e3, 10e3, 30e3])

    def brute(h, za_deg):
        th = np.deg2rad(za_deg)
        smax = 4e6
        s = np.linspace(0.0, smax, 400_001)
        r = np.sqrt((R + h) ** 2 + s**2 + 2 * (R + h) * s * np.cos(th))
        hh = r - R
        if hh.min() < 0:
            return None  # blocked by the planet
        lay = np.clip(np.searchsorted(zg, hh) - 1, 0, len(zg) - 2)
        k = np.where(hh < zg[-1], k_mid[lay, 0], 0.0)
        return float(np.trapezoid(k, s))

    for za in (85.0, 89.0, 91.0, 93.0):
        tau, vis = sun_leg_tau(
            jnp.asarray(zg), jnp.asarray(k_mid), jnp.asarray(alts),
            jnp.asarray(za),
        )
        tau = np.asarray(tau)[:, 0]
        vis = np.asarray(vis)
        for i, h in enumerate(alts):
            bf = brute(h, za)
            if bf is None:
                assert not vis[i], (za, h)
            else:
                assert vis[i], (za, h)
                np.testing.assert_allclose(tau[i], bf, rtol=2e-3,
                                           err_msg=f"za={za} h={h}")

    # plane-parallel visibly wrong here: at 85 deg it overestimates the
    # slant by ignoring curvature; at 91 deg it returns zero sun
    tau85, _ = sun_leg_tau(jnp.asarray(zg), jnp.asarray(k_mid),
                           jnp.asarray(alts), jnp.asarray(85.0))
    tau_vert, _ = sun_leg_tau(jnp.asarray(zg), jnp.asarray(k_mid),
                              jnp.asarray(alts), jnp.asarray(0.0))
    pp85 = np.asarray(tau_vert)[:, 0] / np.cos(np.deg2rad(85.0))
    assert (np.abs(pp85 - np.asarray(tau85)[:, 0]) / np.asarray(tau85)[:, 0]
            > 0.05).all()
    _, vis91 = sun_leg_tau(jnp.asarray(zg), jnp.asarray(k_mid),
                           jnp.asarray([30e3]), jnp.asarray(91.0))
    assert bool(np.asarray(vis91)[0])  # twilight: geometric leg clears


def test_sun_leg_tau_refracted():
    """sun_leg_tau with a refractive-index profile (Bouguer invariant,
    VERDICT r5 item 9): converges to a 50x finer-shell evaluation of the
    same continuous n(r), and bends the near-horizon leg deeper into the
    atmosphere than the geometric one (larger twilight tau)."""
    import numpy as np

    from arts_tpu.fwd import sun_leg_tau
    from arts_tpu.path.refraction import microwave_refractivity

    zg = np.linspace(0.0, 80e3, 81)
    zmid = 0.5 * (zg[:-1] + zg[1:])
    k_prof = lambda z: 1e-5 * np.exp(-z / 8e3)
    k_mid = k_prof(zmid)[:, None]
    # Smith-Weintraub n(z) for an exponential dry atmosphere
    p_prof = lambda z: 101325.0 * np.exp(-z / 7.5e3)
    n_prof = lambda z: 1.0 + microwave_refractivity(p_prof(z), 280.0)
    n_lvl = n_prof(zg)
    alts = np.asarray([2e3, 20e3])

    # truth: same shell model at 50x resolution (k piecewise per coarse
    # shell, n sampled on the fine grid)
    zf = np.linspace(0.0, 80e3, 4001)
    zfm = 0.5 * (zf[:-1] + zf[1:])
    lay = np.clip(np.searchsorted(zg, zfm) - 1, 0, len(zg) - 2)
    kf = k_mid[lay]
    nf = n_prof(zf)

    for za in (85.0, 90.5, 92.0):
        tau, vis = sun_leg_tau(
            jnp.asarray(zg), jnp.asarray(k_mid), jnp.asarray(alts),
            jnp.asarray(za), n_levels=jnp.asarray(n_lvl),
        )
        tau_f, vis_f = sun_leg_tau(
            jnp.asarray(zf), jnp.asarray(kf), jnp.asarray(alts),
            jnp.asarray(za), n_levels=jnp.asarray(nf),
        )
        np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_f))
        for i in range(len(alts)):
            if np.asarray(vis)[i]:
                # near-tangent shells converge slowly (sqrt kink at
                # the tangent radius): ~1% at 1-km shells is geometric
                # discretization, not refraction algebra
                np.testing.assert_allclose(
                    np.asarray(tau)[i, 0], np.asarray(tau_f)[i, 0],
                    rtol=2e-2, err_msg=f"za={za} alt={alts[i]}",
                )

    # twilight: the refracted leg dips deeper -> more tau than geometric
    za = 91.0
    tau_r, vis_r = sun_leg_tau(
        jnp.asarray(zg), jnp.asarray(k_mid), jnp.asarray([20e3]),
        jnp.asarray(za), n_levels=jnp.asarray(n_lvl),
    )
    tau_g, vis_g = sun_leg_tau(
        jnp.asarray(zg), jnp.asarray(k_mid), jnp.asarray([20e3]),
        jnp.asarray(za),
    )
    assert bool(np.asarray(vis_r)[0]) and bool(np.asarray(vis_g)[0])
    assert float(tau_r[0, 0]) > float(tau_g[0, 0]) * 1.001
