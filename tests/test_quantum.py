"""Quantum-number machinery tests: extended/classic .par state parsing,
auto Lande g's (advanced + Hund-case models), Zeeman catalogs built with
no user-supplied g's, and ECS band auto-construction from parsed quanta
(VERDICT round-1 item 7; parity quantum.h, lbl_zeeman.cpp:122-261)."""

import pathlib
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from arts_tpu.io.hitran import (
    parse_par_line,
    read_par_records,
    record_state,
    zeeman_catalog_from_par,
)
from arts_tpu.io.quantum import (
    QuantumState,
    from_hitran,
    global_quanta_diatomic,
    linear_band_lines_from_quanta,
    local_quanta_diatomic,
    parse_rational,
    zeeman_g,
)
from arts_tpu.lbl.zeeman_g import (
    lande_spin_constant,
    o2_line_g,
    simple_g_case_a,
)

REF = "/root/reference"


def _par_row(mol, iso, nu_cm, A, gair, gself, e0_cm, n_air, gu, gl,
             q_up="", q_lo="", q_loc_up="", q_loc_lo="", trailing=""):
    row = (
        f"{mol:2d}" + str(iso)
        + f"{nu_cm:12.6f}" + f"{1.0e-30:10.3E}" + f"{A:10.3E}"
        + f"{gair:5.4f}"[:5] + f"{gself:5.4f}"[:5]
        + f"{e0_cm:10.4f}" + f"{n_air:4.2f}" + f"{0.0:8.6f}"
        + q_up.ljust(15) + q_lo.ljust(15)
        + q_loc_up.ljust(15) + q_loc_lo.ljust(15)
    ).ljust(146) + f"{gu:7.1f}" + f"{gl:7.1f}"
    return row + trailing


def test_parse_rational():
    assert parse_rational("3/2") == Fraction(3, 2)
    assert parse_rational("1.5") == Fraction(3, 2)
    assert parse_rational("4") == 4
    assert parse_rational("X") == "X"


def test_from_hitran_fixture():
    """The reference's own extended-format fixture parses into the same
    state the reference builds (tests/hitran/single_line.par ->
    Quantum::from_hitran)."""
    row = open(f"{REF}/tests/hitran/single_line.par").read().rstrip("\n")
    rec = parse_par_line(row)
    st = rec.state
    assert st is not None
    assert st.upper["ElecStateLabel"] == "X"
    assert st.at("v2") == (1, 1)
    assert st.at("J") == (4, 5)
    assert st.at("Ka") == (2, 1)
    assert st.at("Kc") == (2, 5)


def test_local_quanta_groups():
    # group 2 (O2): dN N'' dJ J''
    st = local_quanta_diatomic(" " * 15, "  Q  9  R  8   ")
    assert st.at("N") == (9, 9) and st.at("J") == (9, 8)
    # group 3 (NO): dJ J'' half-integer
    st = local_quanta_diatomic(" " * 15, "  Q  3.5       ")
    assert st.at("J") == (Fraction(7, 2), Fraction(7, 2))
    st = local_quanta_diatomic(" " * 15, "  R  1.5       ")
    assert st.at("J") == (Fraction(5, 2), Fraction(3, 2))


def test_global_quanta_omega():
    st = global_quanta_diatomic("       X3/2  2 ", "       X3/2  2 ")
    assert st.upper["ElecStateLabel"] == "X"
    assert st.at("Omega") == (Fraction(3, 2), Fraction(3, 2))
    assert st.at("v") == (2, 2)


def test_zeeman_g_o2_advanced():
    """O2 state with J/N/v=0 routes to GetAdvancedModel."""
    st = QuantumState(
        upper={"J": Fraction(9), "N": Fraction(9), "v": Fraction(0)},
        lower={"J": Fraction(8), "N": Fraction(9), "v": Fraction(0)},
    )
    gu, gl = zeeman_g("O2-66", st)
    eu, el = o2_line_g(9.0, 8.0, 9.0, 9.0)
    assert gu == eu and gl == el
    # without v: falls back to the simple case-b model (Lambda=0, S=1)
    st2 = QuantumState(
        upper={"J": Fraction(9), "N": Fraction(9)},
        lower={"J": Fraction(8), "N": Fraction(9)},
    )
    gu2, gl2 = zeeman_g("O2-66", st2)
    assert abs(gu2 - gu) < 0.06 and gu2 != gu


def test_zeeman_g_no_case_a():
    """NO 2-Pi-3/2: Omega from the classic global quanta drives the Hund
    case-(a) model with the doublet defaults Lambda=1, S=1/2 (the
    reference's SimpleG passes the S quantum number as Sigma)."""
    st = QuantumState(
        upper={"Omega": Fraction(3, 2), "J": Fraction(9, 2)},
        lower={"Omega": Fraction(3, 2), "J": Fraction(7, 2)},
    )
    gu, gl = zeeman_g("NO-46", st)
    GS = lande_spin_constant("NO")
    assert gu == simple_g_case_a(1.5, 4.5, 1.0, 0.5, GS)
    assert gl == simple_g_case_a(1.5, 3.5, 1.0, 0.5, GS)
    assert gu > 0 and gl > 0


def test_zeeman_g_closed_shell():
    st = QuantumState(
        upper={"J": Fraction(4), "Ka": Fraction(2)},
        lower={"J": Fraction(5), "Ka": Fraction(1)},
    )
    gu, gl = zeeman_g("CO2-626", st)
    # gperp + (gperp + gpara) K^2/(J(J+1)) with gpara = 0
    gperp = -0.05508 / 1836.15267343
    assert abs(gu - (gperp + gperp * 4.0 / 20.0)) < 1e-12
    gco, _ = zeeman_g("CO-26", QuantumState(upper={}, lower={}))
    assert abs(gco - (-0.2689 / 1836.15267343)) < 1e-12


def test_zeeman_catalog_from_par_o2_and_no():
    """End-to-end: a mixed O2 + NO .par file becomes a ZeemanCatalog with
    auto g's — the O2 line via the advanced model, the NO line via Hund
    case (a) — and produces a polarized propmat in a magnetic field."""
    o2_row = _par_row(7, 1, 3.961085, 6.9e-10, 0.0470, 0.0470, 16.3876,
                      0.74, 19.0, 17.0,
                      q_loc_lo="  Q  9  R  8   ")
    no_row = _par_row(8, 1, 5.015520, 1.2e-8, 0.0540, 0.0600, 2.9668,
                      0.69, 10.0, 8.0,
                      q_up="       X3/2  0 ", q_lo="       X3/2  0 ",
                      q_loc_lo="  R  3.5       ")
    zcat = zeeman_catalog_from_par(
        [o2_row, no_row], ["O2", "NO"], strength_option="A"
    )
    assert zcat.cat.n_lines == 2
    # splits present for both lines in every polarization
    for pol in range(3):
        idx = np.asarray(zcat.idx[pol])
        split = np.asarray(zcat.split[pol])
        for line in (0, 1):
            assert np.any(split[idx == line] != 0.0)

    # the O2 g's must be the advanced-model values
    recs = read_par_records([o2_row, no_row])
    st = record_state(recs[0])
    gu, gl = zeeman_g("O2-66", st)
    eu, el = o2_line_g(9.0, 8.0, 9.0, 9.0)
    # no v-tag in the classic global quanta -> simple case-b fallback,
    # which must still be within the advanced-simple gap
    assert abs(gu - eu) < 0.06

    # polarized absorption responds to the field
    from arts_tpu.lbl.partfun import rigid_rotor_table
    from arts_tpu.lbl.zeeman import zeeman_propmat

    pf = rigid_rotor_table(1, 200.0, 1.0)
    f = jnp.linspace(118.74e9, 118.76e9, 41)
    pm0 = zeeman_propmat(f, zcat, pf, 230.0, 3e3, jnp.asarray([0.2, 1e-6]),
                         jnp.zeros(3), 180.0)
    pmB = zeeman_propmat(f, zcat, pf, 230.0, 3e3, jnp.asarray([0.2, 1e-6]),
                         jnp.asarray([0.0, 3e-5, 3e-5]), 180.0)
    scale = float(jnp.max(jnp.abs(pm0[:, 0])))
    # unpolarized at B=0 (roundoff-level pi/sigma cancellation only)
    assert float(jnp.max(jnp.abs(pm0[:, 1:]))) < 1e-10 * scale
    assert float(jnp.max(jnp.abs(pmB[:, 1:]))) > 1e-4 * scale


def test_ecs_band_from_quanta_matches_hand_built():
    """CO2 ECS band auto-built from extended-format .par quanta equals the
    hand-built make_linear_band on the same lines (VERDICT item 7)."""
    from arts_tpu.lbl.ecs import TRAN2011_CO2, ecs_absorption, make_linear_band
    from arts_tpu.lbl.partfun import rigid_rotor_table

    rows = []
    B_cm = 0.39021
    nu0_cm = 2349.0
    for J in range(0, 6):
        up = f"ElecStateLabel=X;v1=0;v2=0;l2=0;v3=1;J={J + 1}"
        lo = f"ElecStateLabel=X;v1=0;v2=0;l2=0;v3=0;J={J}"
        rows.append(_par_row(
            2, 1, nu0_cm + 2 * B_cm * (J + 1), 1e-6 / (J + 1), 0.0534,
            0.0534, B_cm * J * (J + 1), 0.70, 2.0 * (J + 1) + 1.0,
            2.0 * J + 1.0, trailing=f",{up},{lo}"))
    recs = read_par_records(rows)
    states = [record_state(r) for r in recs]
    assert all(s is not None and s.has("J") for s in states)

    lines_auto, li, lf = linear_band_lines_from_quanta(recs, states)
    assert (li, lf) == (0.0, 0.0)
    band_auto = make_linear_band(lines_auto, ecs=TRAN2011_CO2, li=li, lf=lf)

    # hand-built from the same records with explicit Ji/Jf
    lines_hand = [
        dict(f0=r.f0, a=r.A, e0=r.e0, gu=r.g_upp, Ji=float(J + 1),
             Jf=float(J), g0=(r.gamma_air, r.n_air),
             d0=(r.delta_air, 0.0), t0=296.0)
        for J, r in enumerate(recs)
    ]
    band_hand = make_linear_band(lines_hand, ecs=TRAN2011_CO2)

    pf = rigid_rotor_table(1, 280.0, 1.0)
    f = jnp.linspace(70.3e12, 70.6e12, 101)
    a_auto = np.asarray(ecs_absorption(f, band_auto, pf, 0, 250.0, 5e4, 4e-4))
    a_hand = np.asarray(ecs_absorption(f, band_hand, pf, 0, 250.0, 5e4, 4e-4))
    assert np.max(np.abs(a_hand)) > 0
    np.testing.assert_allclose(a_auto, a_hand, rtol=1e-12)
