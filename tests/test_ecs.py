"""ECS full-band line mixing tests: Wigner symbols vs known values, the
no-coupling limit against the plain Voigt LBL path, area conservation of
line mixing, and spectral-shape physics (intensity transfer toward the
band center — the 60-GHz O2 band signature)."""

import jax.numpy as jnp
import numpy as np
import pytest

import arts_tpu.constants as const
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.ecs import (
    EcsBand,
    ecs_absorption,
    make_o2_band,
    makarov_reduced_dipole,
    o2_erot,
    wigner3j,
    wigner6j,
)
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.voigt import absorption

PF = rigid_rotor_table(1, 150.0, 1.0)


def o2_like_lines(n_pairs=4):
    """Synthetic 60-GHz-band-like O2 lines: N+- fine-structure pairs."""
    lines = []
    f0s = [56.26e9, 58.45e9, 60.31e9, 62.49e9, 64.13e9, 59.59e9, 61.15e9, 57.61e9]
    k = 0
    for N in range(1, 2 * n_pairs, 2):
        for branch in (+1, -1):
            Ju = N + (1 if branch > 0 else 0)
            Jl = N + (0 if branch > 0 else 1) - (0 if branch > 0 else 0)
            # O2 magnetic dipole: N+ line J: N -> N+1? use (Ju, Jl) valid
            Ju_, Jl_ = (N, N + 1) if branch < 0 else (N + 1, N)
            lines.append(
                dict(
                    f0=f0s[k % len(f0s)],
                    a=4e-10 / N,
                    e0=o2_erot(N),
                    gu=2.0 * Ju_ + 1.0,
                    Ju=float(Ju_), Jl=float(Jl_), Nu=float(N), Nl=float(N),
                    g0=(1.5e4, 0.8),  # ~0.05 cm-1/atm in Hz/Pa: realistic O2
                    t0=296.0,
                )
            )
            k += 1
    return lines


def test_wigner_symbols():
    # classic values
    np.testing.assert_allclose(
        wigner3j(1, 1, 2, 0, 0, 0), np.sqrt(2.0 / 15.0), rtol=1e-12
    )
    np.testing.assert_allclose(
        wigner3j(2, 2, 2, 0, 0, 0), -np.sqrt(2.0 / 35.0), rtol=1e-12
    )
    np.testing.assert_allclose(
        wigner6j(1, 1, 1, 1, 1, 1), 1.0 / 6.0, rtol=1e-12
    )
    np.testing.assert_allclose(
        wigner6j(2, 2, 2, 2, 2, 2), -3.0 / 70.0, rtol=1e-12
    )
    assert wigner6j(0, 1, 2, 0, 1, 1) == 0.0  # triangle violation


def test_o2_erot():
    assert o2_erot(1, 0) == pytest.approx(0.0)
    # rotational ladder increases with N; magnitudes ~ K-scale (1e-22 J)
    assert 0 < o2_erot(3) < o2_erot(5) < o2_erot(9)
    assert 1e-23 < o2_erot(3) < 1e-20


def test_reduced_dipole_nonzero():
    d = makarov_reduced_dipole(2.0, 1.0, 1.0)
    assert abs(d) > 0.01


def test_no_coupling_limit_matches_voigt():
    """With the ECS basis forced to zero coupling (scaling = 0), the band
    shape must equal the sum of independent Voigt lines."""
    lines = o2_like_lines(3)
    ecs0 = dict(scaling=0.0, beta=0.567, lam=0.39, collisional_distance=0.61e-10)
    band = make_o2_band(lines, ecs=ecs0)
    f = jnp.linspace(54e9, 67e9, 801)
    T, P, vmr = 250.0, 5e4, 0.21
    a_ecs = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))

    cat = build_catalog([
        dict(
            f0=l["f0"], a=l["a"], e0=l["e0"], gu=l["gu"], gl=1.0,
            iso_mass=31.98983, iso_ratio=1.0, spec_idx=0, iso_idx=0,
            band_idx=0, t0=296.0, cutoff=np.inf,
            ls={"bath": {"G0": (Law.T1, [l["g0"][0], l["g0"][1]])}},
        )
        for l in lines
    ])
    a_ref = np.asarray(
        absorption(f, cat, PF, T, P, jnp.asarray([vmr]),
                   no_negative_absorption=False)
    )
    rel = np.abs(a_ecs - a_ref) / a_ref.max()
    assert rel.max() < 2e-3  # Voigt-of-equivalent-lines discretization


def test_mixing_conserves_area_and_narrows_band():
    lines = o2_like_lines(3)
    band_mix = make_o2_band(lines)  # Makarov2020 coupling
    ecs0 = dict(scaling=0.0, beta=0.567, lam=0.39, collisional_distance=0.61e-10)
    band0 = make_o2_band(lines, ecs=ecs0)
    f = jnp.linspace(40e9, 80e9, 2001)
    T, P, vmr = 250.0, 8e4, 0.21
    a_mix = np.asarray(ecs_absorption(f, band_mix, PF, 0, T, P, vmr))
    a_0 = np.asarray(ecs_absorption(f, band0, PF, 0, T, P, vmr))
    assert np.all(np.isfinite(a_mix))
    # line mixing conserves the integrated band intensity (trace identity
    # sum_k eqv_str_k = sum_i pop_i dip_i^2); divide out the f-dependent
    # radiation-field factor ~ f*expm1(-hf/kT) before integrating so the
    # redistribution across the band doesn't alias into the area
    # (wide grid: the uncoupled band's Lorentz wings carry ~4% of the area
    # beyond +-20 GHz, while the mixed band's sub-Lorentzian wings don't)
    fw = jnp.linspace(1e9, 400e9, 20001)
    aw_mix = np.asarray(ecs_absorption(fw, band_mix, PF, 0, T, P, vmr))
    aw_0 = np.asarray(ecs_absorption(fw, band0, PF, 0, T, P, vmr))
    h_k = 6.62607015e-34 / 1.380649e-23
    w_rad = np.asarray(fw) * -np.expm1(-h_k * np.asarray(fw) / T)
    area_mix = np.trapezoid(aw_mix / w_rad, np.asarray(fw))
    area_0 = np.trapezoid(aw_0 / w_rad, np.asarray(fw))
    np.testing.assert_allclose(area_mix, area_0, rtol=1e-2)
    # and transfers intensity toward the band center (narrowing): the
    # far wings lose absorption relative to the uncoupled band
    wing = (np.asarray(f) < 45e9) | (np.asarray(f) > 75e9)
    assert a_mix[wing].sum() < a_0[wing].sum()
    # the mixing effect is a real, percent-level change
    assert np.abs(a_mix - a_0).max() / a_0.max() > 0.005


def test_ecs_jacobian_finite_and_matches_fd():
    """d(absorption)/dT through the whole eigen chain (the reference has no
    ECS Jacobian at all — lbl_lineshape_voigt_ecs.cpp:57 FIXME)."""
    import jax

    lines = o2_like_lines(2)
    band = make_o2_band(lines)
    f = jnp.linspace(55e9, 65e9, 41)
    P, vmr = 8e4, 0.21

    def fn(T):
        return ecs_absorption(f, band, PF, 0, T, P, vmr)

    g = np.asarray(jax.jacfwd(fn)(250.0))
    assert np.all(np.isfinite(g))
    dT = 0.05
    fd = (np.asarray(fn(250.0 + dT)) - np.asarray(fn(250.0 - dT))) / (2 * dT)
    np.testing.assert_allclose(g, fd, rtol=2e-4, atol=np.abs(fd).max() * 1e-6)


def co2_like_lines(nJ=8):
    """Synthetic CO2 nu3-like P/R branch: lines R(J): Ji=J+1<-Jf=J and
    P(J): Ji=J-1<-Jf=J around 2349 cm-1 (~70.4 THz), B=0.39 cm-1."""
    from arts_tpu.lbl.ecs import co2_erot

    nu0 = 70.4e12
    B2 = 0.39021 * 2.99792458e10  # B in Hz
    lines = []
    for J in range(0, nJ):
        # R branch: f = nu0 + 2B(J+1)
        lines.append(dict(
            f0=nu0 + 2 * B2 * (J + 1), a=1e-6 / (J + 1), e0=co2_erot(J),
            gu=2.0 * (J + 1) + 1.0, Ji=float(J + 1), Jf=float(J),
            g0=(1.6e4, 0.7), t0=296.0))
        if J >= 1:
            lines.append(dict(
                f0=nu0 - 2 * B2 * J, a=1e-6 / (J + 1), e0=co2_erot(J),
                gu=2.0 * (J - 1) + 1.0, Ji=float(J - 1), Jf=float(J),
                g0=(1.6e4, 0.7), t0=296.0))
    return lines


def test_co2_no_coupling_limit():
    from arts_tpu.lbl.ecs import make_linear_band, TRAN2011_CO2

    lines = co2_like_lines(6)
    ecs0 = dict(TRAN2011_CO2, scaling=(0.0, 0.0))
    band = make_linear_band(lines, ecs=ecs0)
    f = jnp.linspace(70.0e12, 70.9e12, 1501)
    T, P, vmr = 250.0, 5e4, 4e-4
    a_ecs = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))

    cat = build_catalog([
        dict(f0=l["f0"], a=l["a"], e0=l["e0"], gu=l["gu"], gl=1.0,
             iso_mass=43.98983, iso_ratio=1.0, spec_idx=0, iso_idx=0,
             band_idx=0, t0=296.0, cutoff=np.inf,
             ls={"bath": {"G0": (Law.T1, [l["g0"][0], l["g0"][1]])}})
        for l in lines])
    a_ref = np.asarray(absorption(f, cat, PF, T, P, jnp.asarray([vmr]),
                                  no_negative_absorption=False))
    assert np.abs(a_ecs - a_ref).max() / a_ref.max() < 2e-3


def test_co2_mixing_sub_lorentzian_wings():
    """Tran2011 CO2 self-mixing: conserved band area and reduced far-wing
    absorption (the classic CO2 sub-Lorentzian signature)."""
    from arts_tpu.lbl.ecs import make_linear_band, TRAN2011_CO2

    lines = co2_like_lines(6)
    band_m = make_linear_band(lines, ecs=TRAN2011_CO2)
    band_0 = make_linear_band(lines, ecs=dict(TRAN2011_CO2, scaling=(0.0, 0.0)))
    T, P, vmr = 250.0, 1.013e5, 1.0
    fw = jnp.linspace(69.5e12, 71.5e12, 8001)
    am = np.asarray(ecs_absorption(fw, band_m, PF, 0, T, P, vmr))
    a0 = np.asarray(ecs_absorption(fw, band_0, PF, 0, T, P, vmr))
    assert np.all(np.isfinite(am))
    h_k = 6.62607015e-34 / 1.380649e-23
    w_rad = np.asarray(fw) * -np.expm1(-h_k * np.asarray(fw) / T)
    np.testing.assert_allclose(
        np.trapezoid(am / w_rad, np.asarray(fw)),
        np.trapezoid(a0 / w_rad, np.asarray(fw)), rtol=1e-2)
    wing = (np.asarray(fw) < 70.05e12) | (np.asarray(fw) > 70.95e12)
    assert am[wing].sum() < a0[wing].sum()
    assert np.abs(am - a0).max() / a0.max() > 0.005


def test_rodrigues_coefficients_load():
    from arts_tpu.lbl.ecs import (RODRIGUES1997_N2, RODRIGUES1997_O2,
                                  make_linear_band)

    lines = co2_like_lines(4)
    for ecs in (RODRIGUES1997_N2, RODRIGUES1997_O2):
        band = make_linear_band(lines, ecs=ecs, mass_other=28.0)
        a = np.asarray(ecs_absorption(
            jnp.linspace(70.2e12, 70.7e12, 301), band, PF, 0, 220.0, 3e4, 4e-4))
        assert np.all(np.isfinite(a)) and a.max() > 0


def test_ecs_band_in_clearsky_pipeline():
    """An EcsBand attached to a ClearskyScene contributes the mixed O2
    band to the simulated spectrum (fwd.py species dispatch)."""
    import jax

    from arts_tpu.atm.field import Atmosphere1D
    from arts_tpu.fwd import ClearskyScene, simulate_clearsky_bt

    lines = o2_like_lines(3)
    band = make_o2_band(lines)
    z = jnp.linspace(0.0, 30e3, 16)
    atm = Atmosphere1D(
        z=z, t=288.0 - 6.5e-3 * jnp.clip(z, 0, 11e3),
        p=101325.0 * jnp.exp(-z / 7.5e3), vmr=jnp.full((1, 16), 0.2095),
    )
    scene = ClearskyScene(
        atm=atm, cat=None, pf=PF,
        ecs_bands=((band, 0, 0, 1.0),),
    )
    f = jnp.linspace(50e9, 70e9, 101)
    alt = jnp.linspace(30e3, 0.0, 31)
    dr = jnp.full(30, 1e3)
    bt = np.asarray(simulate_clearsky_bt(scene, f, alt, dr,
                                         background="surface"))
    assert np.all(np.isfinite(bt))
    # downlooking: the transparent window shows the warm surface; the
    # optically-thick 60-GHz complex shows the colder mid-troposphere
    i60 = np.argmin(np.abs(np.asarray(f) - 60.3e9))
    assert 200.0 < bt[i60] < 265.0
    assert bt[0] > bt[i60] and bt[0] > 280.0


def nh3_like_lines(nJ=6, Ks=(0.0, 3.0)):
    """Synthetic symmetric-top rotational band: R-branch lines per K.

    Includes the physical D_JK centrifugal K-splitting so lines in
    different K sub-bands are NOT exactly degenerate (exact degeneracy
    across decoupled sub-bands makes the complex-symmetric eigenproblem
    ill-posed and does not occur for real symmetric tops)."""
    from arts_tpu.lbl.ecs import TOP_B0_KAYCM, _rigid_erot

    erot = _rigid_erot(TOP_B0_KAYCM["NH3-4111"])
    djk = 0.03 * 1e2 * const.c * const.h  # D_JK ~ 0.03 cm^-1 (exaggerated)
    lines = []
    for K in Ks:
        for J in range(int(K) + 1, int(K) + 1 + nJ):
            # R branch: (Ji = J+1) <- (Jf = J), same K
            elow = erot(float(J)) - djk * J * (J + 1) * K * K * 1e-2
            eup = erot(J + 1.0) - djk * (J + 1) * (J + 2) * K * K * 1e-2
            f0 = (eup - elow) / const.h
            lines.append(
                dict(
                    f0=f0, a=2e-8 / (J + 1.0), e0=elow,
                    gu=2.0 * (J + 1) + 1.0, Ji=float(J + 1), Jf=float(J),
                    K=float(K), g0=(2.0e4, 0.75), t0=296.0,
                )
            )
    return lines


def test_stotop_no_coupling_limit():
    from arts_tpu.lbl.ecs import TRAN2011_CO2, make_stotop_band

    lines = nh3_like_lines()
    ecs0 = dict(TRAN2011_CO2, scaling=(0.0, 0.0))
    band = make_stotop_band(lines, ecs=ecs0)
    f0s = np.array([l["f0"] for l in lines])
    f = jnp.linspace(f0s.min() * 0.9, f0s.max() * 1.1, 2001)
    T, P, vmr = 260.0, 6e4, 1e-5
    a_ecs = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))

    cat = build_catalog([
        dict(f0=l["f0"], a=l["a"], e0=l["e0"], gu=l["gu"], gl=1.0,
             iso_mass=17.027, iso_ratio=1.0, spec_idx=0, iso_idx=0,
             band_idx=0, t0=296.0, cutoff=np.inf,
             ls={"bath": {"G0": (Law.T1, [l["g0"][0], l["g0"][1]])}})
        for l in lines])
    a_ref = np.asarray(absorption(f, cat, PF, T, P, jnp.asarray([vmr]),
                                  no_negative_absorption=False))
    assert np.abs(a_ecs - a_ref).max() / a_ref.max() < 2e-3


def test_stotop_k_subbands_are_independent():
    """delta-K = 0 coupling: the two-K band must equal the sum of the two
    single-K bands minus the overlapping Voigt baseline — i.e. computing
    the full band or each K sub-band separately gives the same result."""
    from arts_tpu.lbl.ecs import TRAN2011_CO2, make_stotop_band

    all_lines = nh3_like_lines(nJ=5, Ks=(0.0, 3.0))
    k0 = [l for l in all_lines if l["K"] == 0.0]
    k3 = [l for l in all_lines if l["K"] == 3.0]
    T, P = 260.0, 8e4
    f0s = np.array([l["f0"] for l in all_lines])
    f = jnp.linspace(f0s.min() * 0.9, f0s.max() * 1.1, 1501)

    a_full = np.asarray(ecs_absorption(
        f, make_stotop_band(all_lines, ecs=TRAN2011_CO2), PF, 0, T, P, 1e-5))
    a_k0 = np.asarray(ecs_absorption(
        f, make_stotop_band(k0, ecs=TRAN2011_CO2), PF, 0, T, P, 1e-5))
    a_k3 = np.asarray(ecs_absorption(
        f, make_stotop_band(k3, ecs=TRAN2011_CO2), PF, 0, T, P, 1e-5))
    np.testing.assert_allclose(a_full, a_k0 + a_k3, rtol=2e-5, atol=1e-30)


def test_stotop_mixing_changes_shape_conserving_area():
    from arts_tpu.lbl.ecs import TRAN2011_CO2, make_stotop_band

    lines = nh3_like_lines(nJ=8, Ks=(1.0,))
    band_m = make_stotop_band(lines, ecs=TRAN2011_CO2)
    band_0 = make_stotop_band(lines, ecs=dict(TRAN2011_CO2, scaling=(0.0, 0.0)))
    f0s = np.array([l["f0"] for l in lines])
    f = jnp.linspace(f0s.min() * 0.5, f0s.max() * 1.5, 6001)
    T, P = 250.0, 1.013e5
    am = np.asarray(ecs_absorption(f, band_m, PF, 0, T, P, 1.0))
    a0 = np.asarray(ecs_absorption(f, band_0, PF, 0, T, P, 1.0))
    assert np.all(np.isfinite(am))
    h_k = const.h / const.k
    w_rad = np.asarray(f) * -np.expm1(-h_k * np.asarray(f) / T)
    np.testing.assert_allclose(
        np.trapezoid(am / w_rad, np.asarray(f)),
        np.trapezoid(a0 / w_rad, np.asarray(f)), rtol=1e-2)
    assert np.abs(am - a0).max() / a0.max() > 0.002


def test_sphtop_no_coupling_limit():
    from arts_tpu.lbl.ecs import TRAN2011_CO2, make_sphtop_band, _rigid_erot, TOP_B0_KAYCM

    erot = _rigid_erot(TOP_B0_KAYCM["CH4-211"])
    lines = [
        dict(f0=(erot(J + 1.0) - erot(J)) / const.h, a=1e-8 / (J + 1),
             e0=erot(float(J)), gu=2.0 * (J + 1) + 1.0,
             Ji=float(J + 1), Jf=float(J), g0=(1.8e4, 0.7), t0=296.0)
        for J in range(0, 8)
    ]
    ecs0 = dict(TRAN2011_CO2, scaling=(0.0, 0.0))
    band = make_sphtop_band(lines, ecs=ecs0)
    f0s = np.array([l["f0"] for l in lines])
    f = jnp.linspace(f0s.min() * 0.9, f0s.max() * 1.1, 1501)
    T, P, vmr = 220.0, 5e4, 1.7e-6
    a_ecs = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))
    cat = build_catalog([
        dict(f0=l["f0"], a=l["a"], e0=l["e0"], gu=l["gu"], gl=1.0,
             iso_mass=16.031, iso_ratio=1.0, spec_idx=0, iso_idx=0,
             band_idx=0, t0=296.0, cutoff=np.inf,
             ls={"bath": {"G0": (Law.T1, [l["g0"][0], l["g0"][1]])}})
        for l in lines])
    a_ref = np.asarray(absorption(f, cat, PF, T, P, jnp.asarray([vmr]),
                                  no_negative_absorption=False))
    assert np.abs(a_ecs - a_ref).max() / a_ref.max() < 2e-3


def test_tpu_f64_c64_clamp_branch(monkeypatch):
    """The f64-on-TPU complex-dtype clamp (c128 is uncompilable on the
    chip; ecs builds the band matrix at c64 there) must produce the same
    absorption to c64 precision. Exercised on CPU by patching the
    backend query that selects the branch."""
    import jax as _jax

    lines = o2_like_lines(3)
    band = make_o2_band(lines)
    f = jnp.linspace(54e9, 67e9, 201)
    T, P, vmr = 250.0, 5e4, 0.21
    a_ref = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    a_c64 = np.asarray(ecs_absorption(f, band, PF, 0, T, P, vmr))
    rel = np.abs(a_c64 - a_ref) / np.abs(a_ref).max()
    assert np.all(np.isfinite(a_c64))
    assert rel.max() < 5e-4, rel.max()
