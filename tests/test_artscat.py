"""Legacy ARTSCAT-3/4 catalog reading (xml_io_old.cc parity)."""

import math

import jax.numpy as jnp
import numpy as np

import arts_tpu.constants as const
from arts_tpu.io.artscat import parse_artscat, read_artscat, read_artscat_split
from arts_tpu.lbl.catalog import BATH, build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.voigt import absorption

Q296_H2O = 174.6

# One H2O-161 line at 183 GHz.  ARTSCAT-3 layout (xml_io_old.cc:11):
# @ ARTSID f0 psf I0 T0 e0 agam sgam nair nself tgam naux
_V3_XML = """<?xml version="1.0"?>
<arts format="ascii" version="1">
<ArrayOfLineRecord version="ARTSCAT-3" nelem="2">
@ H2O-161 1.8331e+11 -1000.0 3.2e-16 296.0 2.75e-21 98000.0 490000.0 0.76 1.0 296.0 0
@ H2O-161 2.2235e+10 -500.0 1.3e-18 296.0 8.87e-21 95000.0 480000.0 0.69 0.9 250.0 0
</ArrayOfLineRecord>
</arts>
"""

# ARTSCAT-4 layout (xml_io_old.cc:215): @ ARTSID f0 I0 T0 e0 A gu gl, then
# 7 G0 x0 (self N2 O2 H2O CO2 H2 He), 7 shared exponents, 6 D0 x0.
_V4_XML = """<arts>
<ArrayOfLineRecord version="ARTSCAT-4" nelem="1">
@ O2-66 6.0e+10 1.0e-19 296.0 3.0e-21 0.0 9.0 7.0 \
450000.0 110000.0 100000.0 500000.0 120000.0 80000.0 60000.0 \
0.7 0.71 0.72 0.73 0.74 0.75 0.76 \
-900.0 -910.0 -920.0 -930.0 -940.0 -950.0
</ArrayOfLineRecord>
</arts>
"""


def test_parse_versions():
    v, recs = parse_artscat(_V3_XML)
    assert v == 3 and len(recs) == 2
    v, recs = parse_artscat(_V4_XML)
    assert v == 4 and len(recs) == 1
    try:
        parse_artscat("<ArrayOfLineRecord version=\"ARTSCAT-5\">\n</ArrayOfLineRecord>")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_artscat3_fields_and_tgam_rescale():
    lines = read_artscat(_V3_XML, ["H2O"], q_t0={"H2O-161": Q296_H2O})
    assert len(lines) == 2
    l0 = lines[0]
    assert l0["f0"] == 1.8331e11 and l0["gu"] == 1.0 and l0["gl"] == 1.0
    # self G0 = (T1, [sgam, nair]) — the reference's transcription uses
    # nair for the self exponent (xml_io_old.cc:139)
    self_g0 = l0["ls"][0]["G0"]
    assert self_g0[0] == Law.T1
    np.testing.assert_allclose(self_g0[1], [490000.0, 0.76])
    bath_d0 = l0["ls"]["bath"]["D0"]
    assert bath_d0[0] == Law.T5
    np.testing.assert_allclose(bath_d0[1], [-1000.0, 0.76])
    # second record has tgam=250 != T0=296: rescaled coefficients
    l1 = lines[1]
    r = 250.0 / 296.0
    np.testing.assert_allclose(
        l1["ls"]["bath"]["G0"][1][0], 95000.0 * r**0.69, rtol=1e-12
    )
    np.testing.assert_allclose(
        l1["ls"][0]["G0"][1][0], 480000.0 * r**0.9, rtol=1e-12
    )
    np.testing.assert_allclose(
        l1["ls"][0]["D0"][1][0], -500.0 * r ** (0.25 + 1.5 * 0.69), rtol=1e-12
    )
    # Einstein A from I0 at gu=1 (compute_a, lbl_data.cpp:156 — no
    # abundance de-weighting for ARTSCAT intensities)
    T0, f0, e0, I0 = 296.0, 1.8331e11, 2.75e-21, 3.2e-16
    expect_a = (
        -8.0 * math.pi * Q296_H2O * I0
        / (
            math.exp(-e0 / (const.k * T0))
            * math.expm1(-(const.h * f0) / (const.k * T0))
            * (const.c / f0) ** 2
        )
    )
    np.testing.assert_allclose(l0["a"], expect_a, rtol=1e-12)


def test_artscat4_perturber_mapping():
    species = ["O2", "N2", "H2O"]
    lines = read_artscat(_V4_XML, species, q_t0={"O2-66": 215.7})
    (l,) = lines
    assert l["gu"] == 9.0 and l["gl"] == 7.0
    # self is O2, which is ALSO the third perturber column: the reference's
    # species-keyed map lets the later O2 column overwrite the self entry
    # (from_artscat4 loops `for spec : species` over a map keyed by
    # SpeciesEnum, xml_io_old.cc:178-212) — transcribed exactly
    np.testing.assert_allclose(l["ls"][0]["G0"][1], [100000.0, 0.72])
    np.testing.assert_allclose(l["ls"][0]["D0"][1], [-910.0, 0.72])
    # N2 (index 1): second column
    np.testing.assert_allclose(l["ls"][1]["G0"][1], [110000.0, 0.71])
    np.testing.assert_allclose(l["ls"][1]["D0"][1], [-900.0, 0.71])
    # H2O (index 2): fourth column
    np.testing.assert_allclose(l["ls"][2]["G0"][1], [500000.0, 0.73])
    # CO2/H2/He absent from the VMR vector: dropped; no bath entry in v4
    assert "bath" not in l["ls"] and len(l["ls"]) == 3
    cat = build_catalog(lines)
    assert int(cat.n_lines) == 1
    assert not np.any(np.asarray(cat.ls_spec) == BATH)


def test_artscat3_absorption_runs():
    lines = read_artscat(_V3_XML, ["H2O"], q_t0={"H2O-161": Q296_H2O})
    cat = build_catalog(lines)
    pf = rigid_rotor_table(1, [Q296_H2O], 1.5)
    f = jnp.linspace(180e9, 186e9, 64)
    k = np.asarray(
        absorption(f, cat, pf, 250.0, 5e4, jnp.asarray([5e-3]))
    )
    assert np.all(np.isfinite(k)) and k.max() > 0
    # peak near the 183.31 GHz line center
    assert abs(float(f[k.argmax()]) - 1.8331e11) < 2e8


def test_artscat_split_dir(tmp_path):
    (tmp_path / "H2O.xml").write_text(_V3_XML)
    (tmp_path / "O2-66.xml").write_text(_V4_XML)
    lines = read_artscat_split(
        str(tmp_path) + "/", ["H2O", "O2"],
        q_t0={"H2O-161": Q296_H2O, "O2-66": 215.7},
    )
    assert len(lines) == 3
    assert [l["f0"] for l in lines] == sorted(l["f0"] for l in lines)
    isos = {l["isotopologue"]: l["iso_idx"] for l in lines}
    assert len(set(isos.values())) == 2  # distinct iso indices across files
