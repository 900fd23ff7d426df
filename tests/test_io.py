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


def test_o2_local_quanta_and_zeeman_g():
    """Local-quanta parsing + the advanced O2 Lande-g model
    (lbl_zeeman.cpp GetAdvancedModel / case_b_g_coefficient_o2)."""
    from arts_tpu.io.hitran import (HitranRecord, parse_o2_local_quanta,
                                    o2_lines_from_par, parse_par_line)
    from arts_tpu.lbl.zeeman_g import o2_advanced_g, simple_g_case_b

    # synthetic 160-char .par line with exact field widths
    line = (
        f"{7:2d}"          # mol = O2
        + "1"              # iso
        + f"{2.011594:12.6f}"   # nu [cm-1]
        + f"{1.0e-30:10.3E}"    # S
        + f"{1.0:10.3E}"        # A
        + f"{0.0500:5.4f}"[:5]  # gamma_air
        + f"{0.0500:5.4f}"[:5]  # gamma_self
        + f"{1000.0:10.4f}"     # E'' [cm-1]
        + f"{0.75:4.2f}"        # n_air
        + f"{0.0:8.6f}"         # delta_air
        + " " * 15 + " " * 15   # global quanta upper/lower
        + " " * 15              # local upper
        + "  Q  9  R  8   "     # local lower
    ).ljust(146) + f"{19.0:7.1f}" + f"{17.0:7.1f}"
    rec = parse_par_line(line.ljust(160))
    qn = parse_o2_local_quanta(rec)
    assert qn is not None
    Nu, Nl, Ju, Jl = qn
    assert (Nu, Nl, Ju, Jl) == (9.0, 9.0, 9.0, 8.0)

    # advanced g close to the case-b simple model for O2 (S=1, Lambda=0)
    for J, N in [(9.0, 9.0), (8.0, 9.0), (10.0, 9.0), (3.0, 3.0)]:
        g_adv = o2_advanced_g(J, N)
        g_simple = simple_g_case_b(N, J, 0.0, 1.0, species="O2")
        assert abs(g_adv - g_simple) < 0.06, (J, N, g_adv, g_simple)
    # J=N lines: g ~ GS/(J(J+1)) (positive, decreasing)
    assert o2_advanced_g(3, 3) > o2_advanced_g(5, 5) > 0

    # end-to-end: records -> make_o2_band inputs
    recs = [rec]
    lines_out, gus, gls = o2_lines_from_par(recs, pf_Q296=215.0)
    assert len(lines_out) == 1 and len(gus) == 1
    l = lines_out[0]
    assert l["Nu"] == 9.0 and l["Jl"] == 8.0 and l["a"] == 1.0
    assert l["gu"] == 19.0
    assert np.isfinite(gus[0]) and np.isfinite(gls[0])


def test_jpl_cat_reader():
    from arts_tpu import constants as const
    from arts_tpu.io.jpl import catalog_from_cat, parse_cat_line, read_cat

    # H2O 3(1,3)-2(2,0) at 183.31 GHz, JPL tag 18003, fixed widths
    # [F13.4,2F8.4,I2,F10.4,I3,I7,I4] (lbl_jpl.cpp:69)
    row = (
        "  183310.0870  0.0010 -3.2566 3  136.1639  7 -180031404"
        " 3 1 3          2 2 0"
    )
    r = parse_cat_line(row)
    assert r.tag == 18003 and r.g_upp == 7 and r.qnfmt == 1404
    np.testing.assert_allclose(r.f0, 183310.0870e6)
    np.testing.assert_allclose(r.s, 10.0 ** (-3.2566) * 1e-12)
    np.testing.assert_allclose(r.e0, 136.1639 * const.h * 100 * const.c)

    lines = read_cat([row], ["H2O"])
    assert len(lines) == 1
    l = lines[0]
    assert l["t0"] == 300.0 and l["spec_idx"] == 0
    assert l["ls"]["bath"]["G0"][1] == [25e3, 0.75]
    assert l["a"] > 0 and np.isfinite(l["a"])

    # integrates into the LBL pipeline with a visible 183 GHz peak
    cat = catalog_from_cat([row], ["H2O"])
    pf = rigid_rotor_table(1, 179.639, 1.5)
    f = jnp.linspace(150e9, 210e9, 121)
    a = np.asarray(absorption(f, cat, pf, 280.0, 5e4, jnp.asarray([0.01])))
    assert np.all(np.isfinite(a)) and a.max() > 0
    assert abs(float(f[np.argmax(a)]) - 183.31e9) < 1e9

    # unknown tags are skipped, not fatal
    assert read_cat([row.replace("-18003", "-99999")], ["H2O"]) == []


def test_catalog_data_layer(tmp_path, monkeypatch):
    """Cache-dir ingestion of the arts-cat-data layout, driven by the
    in-tree fixture (pyarts3.data download/to_abs_species parity)."""
    import shutil

    from arts_tpu.io.data import download, read_catalog_data, to_abs_species

    # build a minimal arts-cat-data layout from the in-tree fixture
    cat = tmp_path / "arts-cat-data-2.6"
    (cat / "lines").mkdir(parents=True)
    shutil.copy(f"{REF}/tests/core/nlte/nlte_lines.xml",
                cat / "lines" / "H2O-161.xml")
    (cat / "cia").mkdir()
    monkeypatch.setenv("ARTS_CAT_DATA_DIR", str(cat))
    monkeypatch.delenv("ARTS_DATA_PATH", raising=False)

    # download() resolves a populated cache instead of fetching
    roots = download(data=("cat",), download_dir=tmp_path)
    assert roots == [cat]
    # and errors helpfully when the cache is empty (offline)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        download(data=("xml",), download_dir=tmp_path)
    # ARTS_DATA_PATH opt-out
    monkeypatch.setenv("ARTS_DATA_PATH", str(tmp_path))
    assert download() == [tmp_path]
    monkeypatch.delenv("ARTS_DATA_PATH")

    tags = to_abs_species(["H2O", "N2"])
    assert "H2O-SelfContCKDMT400" in tags and "N2" in tags

    out = read_catalog_data(["H2O", "N2", "O2"])
    assert out["cat"] is not None and out["cat"].n_lines == 9
    # the ingested catalog produces the same absorption as the direct read
    lines = load_abs_bands(
        f"{REF}/tests/core/nlte/nlte_lines.xml", ["H2O", "N2", "O2"]
    )
    lines.sort(key=lambda l: l["f0"])
    cat_direct = build_catalog(lines)
    pf = rigid_rotor_table(1, 174.6, 1.5)
    f = jnp.linspace(500e9, 600e9, 32)
    vmr = jnp.asarray([0.01, 0.78, 0.21])
    a1 = np.asarray(absorption(f, out["cat"], pf, 280.0, 5e4, vmr))
    a2 = np.asarray(absorption(f, cat_direct, pf, 280.0, 5e4, vmr))
    np.testing.assert_allclose(a1, a2, rtol=1e-12)

    # legacy ARTSCAT files in the same lines/ dir route through io.artscat
    (cat / "lines" / "O2.xml").write_text(
        '<arts>\n<ArrayOfLineRecord version="ARTSCAT-3" nelem="1">\n'
        '@ O2-66 6.0e+10 -100.0 1.0e-19 296.0 3.0e-21 90000.0 95000.0 '
        '0.7 0.8 296.0 0\n'
        '</ArrayOfLineRecord>\n</arts>\n'
    )
    out2 = read_catalog_data(["H2O", "N2", "O2"], q_t0={"O2-66": 215.7})
    assert out2["cat"].n_lines == 10
    iso_idx = np.asarray(out2["cat"].iso_idx)
    assert iso_idx.max() == iso_idx.min() + 1  # O2-66 got a fresh iso row

    # order-independence of iso_idx assignment: an ARTSCAT file sorting
    # BEFORE the AbsorptionBand file (CO2.xml < H2O-161.xml) must not let
    # the ARTSCAT isotopologue claim the abs-band lines' row 0 (the
    # partition-function slot collision the old iso_start arithmetic hit)
    (cat / "lines" / "CO2.xml").write_text(
        '<arts>\n<ArrayOfLineRecord version="ARTSCAT-3" nelem="1">\n'
        '@ CO2-626 7.0e+10 -100.0 1.0e-19 296.0 3.0e-21 90000.0 95000.0 '
        '0.7 0.8 296.0 0\n'
        '</ArrayOfLineRecord>\n</arts>\n'
    )
    out3 = read_catalog_data(
        ["H2O", "CO2", "O2"], q_t0={"O2-66": 215.7, "CO2-626": 286.1}
    )
    idx3 = np.asarray(out3["cat"].iso_idx)
    # one distinct row per isotopologue (3 tags -> 3 rows, no sharing)
    assert len(set(idx3.tolist())) == 3


def test_partfun_from_xml(tmp_path):
    """PartitionFunctionsData XML (TIPS layout) -> PartFunTable: Interp
    rows with the reference's clamped-interval linear extrapolation, and
    Coeff polynomials (xml_io_partfun.cc, make_auto_partfuns.cc)."""
    from arts_tpu.lbl.partfun import table_from_xml

    interp = "\n".join(
        f"{t:.1f} {2.0 * t + 5.0:.6f}" for t in np.arange(100.0, 301.0, 50.0)
    )
    (tmp_path / "H2O-161.xml").write_text(
        '<arts version="1" format="ascii">\n'
        '<PartitionFunctionsData type="Interp">\n'
        f'<Matrix nrows="5" ncols="2">\n{interp}\n</Matrix>\n'
        "</PartitionFunctionsData>\n</arts>\n"
    )
    (tmp_path / "O2-66.xml").write_text(
        '<arts version="1" format="ascii">\n'
        '<PartitionFunctionsData type="Coeff">\n'
        '<Matrix nrows="3" ncols="1">\n1.0\n0.5\n0.01\n</Matrix>\n'
        "</PartitionFunctionsData>\n</arts>\n"
    )
    pf, iso_map = table_from_xml(
        {
            "H2O-161": str(tmp_path / "H2O-161.xml"),
            "O2-66": str(tmp_path / "O2-66.xml"),
        }
    )
    assert iso_map == {"H2O-161": 0, "O2-66": 1}
    # linear data reproduced exactly, including linear extrapolation at
    # the table-edge clamp (reference form) — but only within t_grid
    for T in (100.0, 137.5, 296.0, 300.0):
        np.testing.assert_allclose(
            float(pf.Q(jnp.asarray(T), 0)), 2.0 * T + 5.0, rtol=1e-12
        )
    for T in (120.0, 250.0):
        np.testing.assert_allclose(
            float(pf.Q(jnp.asarray(T), 1)), 1.0 + 0.5 * T + 0.01 * T * T,
            rtol=1e-6,
        )
    # differentiable: dQ/dT of the linear H2O table is 2
    import jax

    g = jax.grad(lambda t: pf.Q(t, 0))(jnp.asarray(200.0))
    np.testing.assert_allclose(float(g), 2.0, rtol=1e-9)


def test_partfun_data_layer(tmp_path, monkeypatch):
    """read_partfun_data resolves partition-functions/<iso>.xml from the
    cache layout and orders iso rows as requested."""
    from arts_tpu.io.data import read_partfun_data

    cat = tmp_path / "arts-cat-data-2.6"
    d = cat / "partition-functions"
    d.mkdir(parents=True)
    (d / "H2O-161.xml").write_text(
        '<arts><PartitionFunctionsData type="Interp">\n'
        '<Matrix nrows="2" ncols="2">\n100.0 100.0\n300.0 300.0\n</Matrix>\n'
        "</PartitionFunctionsData></arts>\n"
    )
    monkeypatch.setenv("ARTS_CAT_DATA_DIR", str(cat))
    monkeypatch.delenv("ARTS_DATA_PATH", raising=False)
    pf, iso_map = read_partfun_data(["H2O-161"])
    assert iso_map == {"H2O-161": 0}
    np.testing.assert_allclose(float(pf.Q(jnp.asarray(216.0), 0)), 216.0)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_partfun_data(["H2O-161", "CO2-626"])


def test_atm_field_read_dir(tmp_path):
    """atm_fieldRead-style directory ingestion: altitude-gridded t/p plus
    species profiles, missing_is_zero semantics (m_atm.cc append_data)."""
    from arts_tpu.atm.standard import atm_field_read

    z = np.linspace(0.0, 50e3, 26)

    def gf(vals, gridname="Altitude"):
        rows = "\n".join(f"{v:.14e}" for v in vals)
        zs = "\n".join(f"{x:.1f}" for x in z)
        return (
            '<arts><GriddedField N="1">\n<String>"x"</String>\n'
            f'<String>"{gridname}"</String>\n'
            f'<Vector nelem="{len(z)}">\n{zs}\n</Vector>\n'
            f'<Vector nelem="{len(vals)}">\n{rows}\n</Vector>\n'
            "</GriddedField></arts>\n"
        )

    t = 280.0 - 4e-3 * z
    p = 1e5 * np.exp(-z / 8e3)
    h2o = 1e-2 * np.exp(-z / 2e3)
    (tmp_path / "t.xml").write_text(gf(t))
    (tmp_path / "p.xml").write_text(gf(p))
    (tmp_path / "H2O.xml").write_text(gf(h2o))

    atm, kept = atm_field_read(
        str(tmp_path), ["H2O", "O3"], missing_is_zero=True
    )
    assert kept == ("H2O", "O3")
    np.testing.assert_allclose(np.asarray(atm.t), t, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(atm.p), p, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(atm.vmr[0]), h2o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(atm.vmr[1]), 0.0)
    # ignore_missing drops the row instead
    atm2, kept2 = atm_field_read(
        str(tmp_path), ["H2O", "O3"], ignore_missing=True
    )
    assert kept2 == ("H2O",) and atm2.vmr.shape[0] == 1
    # strict mode raises
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        atm_field_read(str(tmp_path), ["O3"])


def test_bench_build_scene_from_cache_dir(tmp_path, monkeypatch):
    """End-to-end real-catalog bench path (VERDICT r4 item 9): assemble a
    synthetic arts-cat-data layout (AbsorptionBand Maps + TIPS partition
    functions), point the search paths at it, and prove
    bench.build_scene's _try_real_catalog goes cache-dir mode with a
    working catalog — so the first real cache dir Just Works."""
    import importlib
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import bench

    cat = tmp_path / "arts-cat-data-x"
    (cat / "lines").mkdir(parents=True)
    (cat / "partition-functions").mkdir()

    def band(qid, f0, a, e0, gu, self_name):
        return (
            f'<QuantumIdentifier version="1"> {qid} </QuantumIdentifier>\n'
            '<AbsorptionBand lineshape="VP_LTE" cutoff_type="ByLine" '
            'cutoff_value="25000000000.0" nelem="1">\n'
            f"{f0!r} {a!r} {e0!r} {gu!r} {max(gu - 2, 1)!r} 0 0.0 0.0 "
            f"296.0 2 {self_name} 1 G0 T1 80000.0 0.75 "
            "Bath 1 G0 T1 30000.0 0.7 0\n"
            "</AbsorptionBand>\n"
        )

    rng = np.random.default_rng(5)
    h2o = []
    for i, f0 in enumerate(np.linspace(161e9, 259e9, 70)):
        h2o.append(
            band(f"H2O-161 J {i + 1} {i} Ka 1 0 Kc 0 1", float(f0),
                 float(rng.uniform(1e-7, 1e-6)),
                 float(rng.uniform(0.0, 1e-20)), 9.0, "Water")
        )
    (cat / "lines" / "H2O-161.xml").write_text(
        '<?xml version="1.0"?>\n<arts format="ascii" version="1">\n'
        f'<Map type="AbsorptionBand" key="QuantumIdentifier" '
        f'nelem="{len(h2o)}">\n' + "".join(h2o) + "</Map>\n</arts>\n"
    )
    o2 = []
    for i, f0 in enumerate(np.linspace(165e9, 255e9, 12)):
        o2.append(
            band(f"O2-66 J {i + 1} {i} N {i + 1} {i}", float(f0),
                 float(rng.uniform(1e-8, 1e-7)), 0.0, 7.0, "Oxygen")
        )
    (cat / "lines" / "O2-66.xml").write_text(
        '<?xml version="1.0"?>\n<arts format="ascii" version="1">\n'
        f'<Map type="AbsorptionBand" key="QuantumIdentifier" '
        f'nelem="{len(o2)}">\n' + "".join(o2) + "</Map>\n</arts>\n"
    )
    for iso, q0 in (("H2O-161", 174.6), ("O2-66", 215.7)):
        (cat / "partition-functions" / f"{iso}.xml").write_text(
            '<arts><PartitionFunctionsData type="Interp">\n'
            '<Matrix nrows="2" ncols="2">\n'
            f"100.0 {q0 * 100 / 296:.4f}\n300.0 {q0 * 300 / 296:.4f}\n"
            "</Matrix>\n</PartitionFunctionsData></arts>\n"
        )

    monkeypatch.setenv("ARTS_CAT_DATA_DIR", str(cat))
    monkeypatch.delenv("ARTS_DATA_PATH", raising=False)
    monkeypatch.delenv("ARTS_XML_DATA_DIR", raising=False)

    scene, f_grid = bench.build_scene(n_lev=12, n_freq=128)
    assert bench.build_scene.catalog_mode.startswith("cache-dir"), (
        bench.build_scene.catalog_mode
    )
    assert scene.cat is not None and scene.cat.n_lines == 82
    # the scene actually computes: absorption is finite and line-peaked
    from arts_tpu.lbl.voigt import absorption

    a = np.asarray(
        absorption(f_grid, scene.cat, scene.pf, 250.0, 5e4,
                   jnp.asarray([5e-3, 0.21]))
    )
    assert np.all(np.isfinite(a)) and a.max() > 0
