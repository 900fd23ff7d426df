"""NLTE tests: LTE-population limit recovers the LTE line (the reference's
spectral-radiance-nlte-vs-lte.py check), source/absorption signs, and the
statistical-equilibrium solver."""

import jax.numpy as jnp
import numpy as np

import arts_tpu.constants as const
from arts_tpu.lbl.nlte import (
    nlte_absorption_source,
    statistical_equilibrium,
    two_level_rates,
)
from arts_tpu.lbl.voigt import absorption
from arts_tpu.ops.planck import planck
from tests.test_zeeman import CAT, PF

T, P = 250.0, 5e4
VMR = jnp.asarray([0.21])
F = jnp.linspace(118.75e9 - 2e7, 118.75e9 + 2e7, 101)


def lte_populations(T):
    """Boltzmann ratios for the single test line (e0 = 0)."""
    gu, gl = 5.0, 3.0
    e0 = float(CAT.e0[0])
    f0 = float(CAT.f0[0])
    # partition over just the two levels of this line (ratios normalized
    # to r_l + r_u consistent with Q-less convention: the reference stores
    # absolute ratios; the LTE check only needs the Boltzmann relation)
    el = e0
    eu = e0 + const.h * f0
    wl = gl * np.exp(-el / (const.k * T))
    wu = gu * np.exp(-eu / (const.k * T))
    Z = wl + wu
    return wu / Z, wl / Z


def test_lte_limit_matches_planck_source():
    ru, rl = lte_populations(T)
    alpha, src = nlte_absorption_source(
        F, CAT, T, P, VMR, jnp.asarray([ru]), jnp.asarray([rl])
    )
    alpha = np.asarray(alpha)
    src = np.asarray(src)
    assert np.all(alpha > 0)
    # in LTE the total source function K^-1(alpha B + src) must equal B:
    # i.e. src must vanish (J = B + K^-1 S with S = 0)
    B = np.asarray(planck(F, T))
    ratio = src / (alpha * B)
    np.testing.assert_allclose(ratio, 0.0, atol=1e-10)


def test_inverted_population_gives_negative_absorption():
    # maser-like: more upper than Boltzmann -> k < 0 possible
    alpha, src = nlte_absorption_source(
        F, CAT, T, P, VMR, jnp.asarray([0.9]), jnp.asarray([0.1])
    )
    assert np.asarray(alpha).min() < 0  # stimulated emission dominates
    assert np.asarray(src).max() > 0  # strong spontaneous source


def test_statistical_equilibrium_two_level():
    # no radiation, collisions only: detailed balance n_u/n_l = Clu/Cul
    A, Bul, Blu = 0.0, 0.0, 0.0
    Cul, Clu = 2.0, 0.5
    W = two_level_rates(A, Bul, Blu, Cul, Clu, jnp.asarray(0.0))
    n = np.asarray(statistical_equilibrium(W))
    np.testing.assert_allclose(n.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(n[1] / n[0], Clu / Cul, rtol=1e-10)
    # strong radiation field drives toward B-ratio equilibrium
    W2 = two_level_rates(1.0, 2.0, 3.0, 0.0, 0.0, jnp.asarray(1e6))
    n2 = np.asarray(statistical_equilibrium(W2))
    np.testing.assert_allclose(n2[1] / n2[0], 3.0 / 2.0, rtol=1e-5)


def _two_level_setup(f0=115.27e9):
    from arts_tpu.lbl.catalog import build_catalog
    from arts_tpu.lbl.tmodel import Law

    line = dict(
        f0=f0, a=7.2e-8, e0=0.0, gu=3.0, gl=1.0, iso_mass=28.0,
        iso_ratio=1.0, spec_idx=0, iso_idx=0, band_idx=0, t0=296.0,
        cutoff=1e30, ls={"bath": {"G0": (Law.T1, [2.4e4, 0.75])}},
    )
    cat = build_catalog([line])
    nz = 16
    z = jnp.linspace(0.0, 30e3, nz)
    t_prof = 280.0 - 60.0 * z / 30e3
    p_prof = 1e5 * jnp.exp(-z / 8e3)
    vmr_prof = jnp.full((nz, 1), 1e-7)
    f_grid = jnp.linspace(f0 - 8e9, f0 + 8e9, 512)
    E = jnp.asarray([0.0, const.h * f0])
    g = jnp.asarray([1.0, 3.0])
    return cat, z, t_prof, p_prof, vmr_prof, f_grid, E, g


def _boltzmann(T, g, E):
    from arts_tpu.lbl.nlte import boltzmann_ratios

    Q = jnp.sum(g * jnp.exp(-E / (const.k * jnp.asarray(T)[..., None])), -1)
    return boltzmann_ratios(T, g, E, Q)


def test_nlte_fit_collision_dominated_recovers_lte():
    """Strong collisions (with detailed balance) must thermalize to LTE
    (atm_profileFitNonLTE parity, src/m_nlte.cc:49-142)."""
    from arts_tpu.lbl.nlte import nlte_fit_profile

    cat, z, t_prof, p_prof, vmr_prof, f_grid, E, g = _two_level_setup()
    nz = z.shape[0]
    hf_kt = const.h * float(cat.f0[0]) / (const.k * t_prof)
    Cul = jnp.full((nz, 1), 1.0e3)
    Clu = Cul * (g[1] / g[0]) * jnp.exp(-hf_kt)[:, None]  # detailed balance

    r_lte = _boltzmann(t_prof, g, E)
    r_init = jnp.full((nz, 2), 0.5)  # start far from the answer
    r, n_iter, mc = nlte_fit_profile(
        f_grid, z, t_prof, p_prof, vmr_prof, cat, 2,
        jnp.asarray([1]), jnp.asarray([0]), Cul, Clu,
        r_sum=jnp.sum(r_lte, -1), r_init=r_init,
        surf_t=jnp.asarray(280.0), convergence_limit=1e-9,
    )
    assert mc < 1e-9 and n_iter < 100
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_lte), rtol=1e-4)


def test_nlte_fit_radiation_dominated_isothermal_cavity():
    """No collisions inside an isothermal blackbody cavity: populations
    thermalize to the radiation temperature, not the local kinetic T."""
    from arts_tpu.lbl.nlte import nlte_fit_profile

    # THz line so h f0/kT spreads the kinetic-T Boltzmann ratios (2.0-2.2)
    # well apart from the radiation-T answer — a discriminating check
    cat, z, t_prof, p_prof, vmr_prof, f_grid, E, g = _two_level_setup(f0=2.0e12)
    nz = z.shape[0]
    t_rad = 250.0
    vmr_thin = jnp.full((nz, 1), 1e-12)  # optically thin line
    zero = jnp.zeros((nz, 1))

    r_init = _boltzmann(t_prof, g, E)  # start at kinetic-T LTE
    r, n_iter, mc = nlte_fit_profile(
        f_grid, z, t_prof, p_prof, vmr_thin, cat, 2,
        jnp.asarray([1]), jnp.asarray([0]), zero, zero,
        r_sum=jnp.sum(r_init, -1), r_init=r_init,
        surf_t=jnp.asarray(t_rad), surf_eps=1.0, t_space=t_rad,
        convergence_limit=1e-10,
    )
    assert mc < 1e-10
    r_expect = _boltzmann(jnp.full((nz,), t_rad), g, E) * (
        jnp.sum(r_init, -1) / jnp.sum(_boltzmann(jnp.full((nz,), t_rad), g, E), -1)
    )[:, None]
    ratio = np.asarray(r[:, 1] / r[:, 0])
    ratio_expect = np.asarray(r_expect[:, 1] / r_expect[:, 0])
    np.testing.assert_allclose(ratio, ratio_expect, rtol=5e-3)
    # and it must NOT sit at the kinetic-temperature answer
    r_kin = np.asarray(r_init[:, 1] / r_init[:, 0])
    assert np.abs(ratio - r_kin).max() > 20 * np.abs(ratio - ratio_expect).max()


def _pf_two_level(g, E):
    """PartFunTable with Q(T) = sum g exp(-E/kT) over the two test levels,
    so the LTE strength path and Boltzmann NLTE populations are consistent."""
    from arts_tpu.lbl.partfun import PartFunTable

    t = jnp.linspace(150.0, 350.0, 401)
    q = jnp.sum(
        jnp.asarray(g)[None, :]
        * jnp.exp(-jnp.asarray(E)[None, :] / (const.k * t[:, None])),
        -1,
    )
    return PartFunTable(t_grid=t, q_grid=q[None, :])


def _nadir_scene_pair(r_field):
    """(scene_nlte, scene_lte, f_grid, path_alt, path_dr) for a TOA
    down-looking geometry over the two-level test band."""
    from arts_tpu.atm import Atmosphere1D
    from arts_tpu.fwd import ClearskyScene
    from arts_tpu.lbl.nlte import NlteField

    cat, z, t_prof, p_prof, vmr_prof, _, E, g = _two_level_setup()
    f0 = float(cat.f0[0])
    # narrow grid: the LTE path applies (1 - e^{-hf/kT}) at f, the NLTE
    # population difference at f0 — agreement to ~|f-f0|/f0 of that factor
    f_grid = jnp.linspace(f0 - 5e7, f0 + 5e7, 101)
    vmr_strong = jnp.full_like(vmr_prof, 1e-4)
    atm = Atmosphere1D(z=z, t=t_prof, p=p_prof, vmr=vmr_strong.T)

    nlte = NlteField(
        z=z, r=r_field, cat=cat,
        up_idx=jnp.asarray([1]), lo_idx=jnp.asarray([0]),
    )
    scene_nlte = ClearskyScene(atm=atm, cat=None, pf=None, nlte=nlte)
    scene_lte = ClearskyScene(atm=atm, cat=cat, pf=_pf_two_level(g, E))
    path_alt = z[::-1]
    path_dr = -jnp.diff(path_alt)
    return scene_nlte, scene_lte, f_grid, path_alt, path_dr, t_prof, g, E


def test_clearsky_nlte_lte_limit_and_pumping():
    """End-to-end simulate_clearsky with scene.nlte: Boltzmann populations
    reproduce the LTE radiance; a pumped upper level changes TOA radiance
    (rtepack_rtestep.h:30 / level_nlte parity)."""
    from arts_tpu.fwd import simulate_clearsky

    cat, z, t_prof, p_prof, vmr_prof, _, E, g = _two_level_setup()
    r_lte = _boltzmann(t_prof, g, E)
    (scene_nlte, scene_lte, f_grid, path_alt, path_dr,
     t_prof, g, E) = _nadir_scene_pair(r_lte)

    I_nlte = np.asarray(
        simulate_clearsky(scene_nlte, f_grid, path_alt, path_dr,
                          background="surface")
    )
    I_lte = np.asarray(
        simulate_clearsky(scene_lte, f_grid, path_alt, path_dr,
                          background="surface")
    )
    # line must actually matter: contrast vs the line-free window edges
    assert abs(I_lte[50] - I_lte[0]) > 1e-3 * abs(I_lte[0])
    np.testing.assert_allclose(I_nlte, I_lte, rtol=2e-3)

    # depopulate the upper level slightly: at microwave frequencies the
    # Boltzmann population difference (rl gu/gl - ru) is tiny, so a 2%
    # depumping multiplies the line absorption severalfold and kills the
    # source excess -> a large, finite radiance change (a 2x pump would
    # invert the population and mase)
    r_pump = r_lte.at[:, 1].mul(0.98)
    nlte_p = dataclasses_replace_nlte(scene_nlte, r_pump)
    I_pump = np.asarray(
        simulate_clearsky(nlte_p, f_grid, path_alt, path_dr,
                          background="surface")
    )
    assert np.all(np.isfinite(I_pump))
    assert np.max(np.abs(I_pump - I_nlte)) > 10 * np.max(
        np.abs(I_nlte - I_lte)
    )
    # stronger line + weaker source: dimmer at line center (cold line
    # against the warm surface background)
    assert I_pump[50] < I_nlte[50]


def dataclasses_replace_nlte(scene, r_new):
    import dataclasses as _dc

    return _dc.replace(scene, nlte=_dc.replace(scene.nlte, r=r_new))


def test_clearsky_nlte_collision_dominated_matches_lte():
    """Full chain: nlte_fit_profile under strong collisions -> scene.nlte ->
    simulate_clearsky equals the LTE radiance (VERDICT round-1 item 2)."""
    from arts_tpu.fwd import simulate_clearsky
    from arts_tpu.lbl.nlte import nlte_fit_profile

    cat, z, t_prof, p_prof, vmr_prof, f_fit, E, g = _two_level_setup()
    nz = z.shape[0]
    hf_kt = const.h * float(cat.f0[0]) / (const.k * t_prof)
    Cul = jnp.full((nz, 1), 1.0e3)
    Clu = Cul * (g[1] / g[0]) * jnp.exp(-hf_kt)[:, None]
    r_lte = _boltzmann(t_prof, g, E)
    r_fit, _, mc = nlte_fit_profile(
        f_fit, z, t_prof, p_prof, vmr_prof, cat, 2,
        jnp.asarray([1]), jnp.asarray([0]), Cul, Clu,
        r_sum=jnp.sum(r_lte, -1), r_init=jnp.full((nz, 2), 0.5),
        surf_t=jnp.asarray(280.0), convergence_limit=1e-9,
    )
    assert mc < 1e-9

    (scene_nlte, scene_lte, f_grid, path_alt, path_dr,
     *_) = _nadir_scene_pair(r_fit)
    I_fit = np.asarray(
        simulate_clearsky(scene_nlte, f_grid, path_alt, path_dr,
                          background="surface")
    )
    I_lte = np.asarray(
        simulate_clearsky(scene_lte, f_grid, path_alt, path_dr,
                          background="surface")
    )
    np.testing.assert_allclose(I_fit, I_lte, rtol=3e-3)


def test_polarized_nlte_matches_scalar():
    """ZeemanScene.nlte at zero magnetic field: Stokes I equals the scalar
    NLTE radiance, Q/U/V stay zero (J = B e1 + K^-1 S, level_nlte)."""
    import dataclasses as _dc

    from arts_tpu.atm import Atmosphere1D
    from arts_tpu.fwd import ZeemanScene, simulate_clearsky_polarized
    from arts_tpu.lbl.nlte import NlteField
    from arts_tpu.lbl.tmodel import Law
    from arts_tpu.lbl.zeeman import expand_zeeman

    cat, z, t_prof, p_prof, vmr_prof, _, E, g = _two_level_setup()
    f0 = float(cat.f0[0])
    f_grid = jnp.linspace(f0 - 5e7, f0 + 5e7, 51)
    r_pump = _boltzmann(t_prof, g, E).at[:, 1].mul(0.98)
    nlte = NlteField(
        z=z, r=r_pump, cat=cat,
        up_idx=jnp.asarray([1]), lo_idx=jnp.asarray([0]),
    )
    atm = Atmosphere1D(
        z=z, t=t_prof, p=p_prof, vmr=jnp.full_like(vmr_prof, 1e-4).T,
        mag=jnp.zeros((3, z.shape[0])),
    )
    # empty Zeeman band (zero line strength) so only the NLTE band acts
    zline = dict(
        f0=f0, a=1e-30, e0=0.0, gu=3.0, gl=1.0, iso_mass=28.0,
        iso_ratio=1.0, spec_idx=0, iso_idx=0, band_idx=0, t0=296.0,
        cutoff=np.inf, ls={"bath": {"G0": (Law.T1, [2.4e4, 0.75])}},
    )
    from arts_tpu.lbl.catalog import build_catalog

    zcat = expand_zeeman(
        build_catalog([zline]), ju=[1.0], jl=[0.0], gu_z=[0.0], gl_z=[0.0]
    )
    scene = ZeemanScene(
        atm=atm, zcat=zcat, pf=_pf_two_level(g, E),
        surface_temperature=jnp.asarray(280.0), nlte=nlte,
    )
    path_alt = z[::-1]
    path_za = jnp.full_like(path_alt, 180.0)
    path_dr = -jnp.diff(path_alt)
    I_pol = np.asarray(
        simulate_clearsky_polarized(
            scene, f_grid, path_alt, path_za, path_dr, background="surface"
        )
    )

    from arts_tpu.fwd import ClearskyScene, simulate_clearsky

    scene_s = ClearskyScene(
        atm=atm, cat=None, pf=None, nlte=nlte,
        surface_temperature=jnp.asarray(280.0),
    )
    I_sca = np.asarray(
        simulate_clearsky(scene_s, f_grid, path_alt, path_dr,
                          background="surface")
    )
    np.testing.assert_allclose(I_pol[:, 0], I_sca, rtol=1e-10)
    np.testing.assert_allclose(I_pol[:, 1:], 0.0, atol=1e-20)
