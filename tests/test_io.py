"""IO layer tests against real reference data files (fixtures checked in
with the reference at /root/reference): ARTS XML ascii + binary, the
AbsorptionBand catalog text format, HITRAN .par, legacy scattering data."""

import numpy as np
import pytest

import jax.numpy as jnp

from arts_tpu.io.artsxml import load, load_abs_bands
from arts_tpu.io.hitran import parse_par_line, read_par
from arts_tpu.io.ssd import habit_from_legacy_ssd, legendre_moments
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.voigt import absorption

REF = "/root/reference"
ALLSKY = f"{REF}/examples/3-allsky-radiative-transfer/1-disort"


def test_gridded_field_ascii():
    t = load(f"{REF}/tests/core/nlte/t.xml")
    assert t["name"] == "Temperature"
    assert t["grids"][0].shape == (101,)
    assert t["data"].shape == (101, 1, 1)
    assert 80 < t["data"].mean() < 350  # (cold NLTE test atmosphere)


def test_tensor_ascii():
    tf = load(f"{ALLSKY}/1-t_field.xml")
    assert tf.shape == (49, 1, 1)
    np.testing.assert_allclose(tf[0, 0, 0], 300.27457627118645)


def test_matpack_rank4():
    pb = load(f"{ALLSKY}/1-particle_bulkprop_field.xml")
    assert pb.shape == (2, 49, 1, 1)
    np.testing.assert_allclose(pb[0, 0, 0, 0], 1e-4)


def test_abs_bands_to_catalog_and_absorption():
    lines = load_abs_bands(
        f"{REF}/tests/core/nlte/nlte_lines.xml", ["H2O", "N2", "O2"]
    )
    assert len(lines) == 9
    l0 = min(lines, key=lambda l: l["f0"])
    assert l0["f0"] == 556936000000.0  # H2O 557 GHz
    assert l0["a"] == 0.003458
    assert l0["iso_mass"] == pytest.approx(18.010565)
    # N2-broadened G0 at 296K ~ 30741 Hz/Pa scaled by (300/T)^0.77
    cat = build_catalog(lines)
    pf = rigid_rotor_table(1, 174.6, 1.5)  # H2O-161 Q(296) ~ 174.6
    f = jnp.linspace(500e9, 600e9, 64)
    vmr = jnp.asarray([0.01, 0.78, 0.21])
    a = np.asarray(absorption(f, cat, pf, 280.0, 5e4, vmr))
    assert np.all(np.isfinite(a)) and a.max() > 0
    # peak near 557 GHz
    assert abs(float(f[np.argmax(a)]) - 556.9e9) < 3e9


def test_hitran_par_fixture():
    row = open(f"{REF}/tests/hitran/single_line.par").read().rstrip("\n")
    r = parse_par_line(row)
    assert r.isotopologue == "H2O-161"
    np.testing.assert_allclose(r.f0, 0.072049 * 100 * 299792458.0)
    assert r.g_upp == 9.0 and r.g_low == 11.0
    lines = read_par([row], ["H2O"], q296={"H2O-161": 174.6})
    assert len(lines) == 1
    assert lines[0]["ls"]["bath"]["G0"][1][0] == pytest.approx(r.gamma_air)


def test_legacy_scat_data_to_habit():
    ssd = load(f"{ALLSKY}/1-scat_data.xml")
    meta = load(f"{ALLSKY}/1-scat_meta.xml")
    assert len(ssd) == 2 and len(ssd[0]) == 6
    habit = habit_from_legacy_ssd(ssd[0], meta[0], nleg=16)
    assert habit.sizes.shape == (6,)
    leg = np.asarray(habit.leg)
    np.testing.assert_allclose(leg[..., 0], 1.0, atol=1e-6)  # g_0 = 1
    assert np.all(np.abs(leg) <= 1.0 + 1e-6)
    assert np.all(np.asarray(habit.ext) > 0)
    assert np.all(np.asarray(habit.sca) <= np.asarray(habit.ext) * (1 + 1e-8))
    # mass-size fit is cubic-ish for spheres
    assert 2.5 < float(habit.b) < 3.5


def test_legendre_moments_hg():
    # HG phase function should recover g^l moments
    g = 0.6
    za = np.linspace(0, 180, 721)
    mu = np.cos(np.deg2rad(za))
    p = (1 - g**2) / (1 + g**2 - 2 * g * mu) ** 1.5 / (4 * np.pi)
    gl, sca = legendre_moments(za, p, 6)
    np.testing.assert_allclose(gl, g ** np.arange(6), atol=2e-4)
    np.testing.assert_allclose(sca, 1.0, rtol=1e-4)


def test_xml_writer_roundtrip(tmp_path):
    from arts_tpu.io.artsxml import save

    v = np.linspace(0.0, 1.0, 5)
    m = np.arange(6.0).reshape(2, 3)
    gf = dict(name="Temperature", gridnames=["alt"], grids=[v], data=v * 2)
    for i, val in enumerate([v, m, gf, [v, m], "hello", 7, 3.25]):
        p = tmp_path / f"x{i}.xml"
        save(val, p)
        back = load(p)
        if isinstance(val, np.ndarray):
            np.testing.assert_allclose(back, val)
        elif isinstance(val, dict):
            np.testing.assert_allclose(back["data"], val["data"])
            assert back["name"] == "Temperature"
        elif isinstance(val, list):
            np.testing.assert_allclose(back[0], val[0])
            np.testing.assert_allclose(back[1], val[1])
        else:
            assert back == val
