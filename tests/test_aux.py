"""Auxiliary subsystem tests: xsec-fit absorption, MT_CKD400 evaluation
machinery (synthetic data), profiler report, sweep checkpointing."""

import numpy as np
import pytest

import jax.numpy as jnp

import arts_tpu.constants as const
from arts_tpu.lbl.xsec_fit import XsecFitDataset, xsec_fit_absorption
from arts_tpu.predefined.mt_ckd400 import (
    MTCKD400Data,
    h2o_foreign_mtckd400,
    h2o_self_mtckd400,
)
from arts_tpu.utils.checkpoint import SweepCheckpointer
from arts_tpu.utils.profiling import clear_report, get_report, scope


def test_xsec_fit():
    g = jnp.linspace(1e13, 2e13, 11)
    coeffs = jnp.zeros((11, 4)).at[:, 0].set(1e-24).at[:, 1].set(1e-27)
    ds = XsecFitDataset(f_grid=g, coeffs=coeffs, spec_idx=0)
    f = jnp.asarray([1.5e13, 5e13])
    T, P = 250.0, 1e4
    a = np.asarray(ds.absorption(f, T, P, jnp.asarray([1e-6])))
    n = P / (const.k * T) * 1e-6
    np.testing.assert_allclose(a[0], (1e-24 + 1e-27 * T) * n, rtol=1e-10)
    assert a[1] == 0.0
    tot = xsec_fit_absorption([ds, ds], f, T, P, jnp.asarray([1e-6]))
    np.testing.assert_allclose(np.asarray(tot), 2 * a, rtol=1e-12)


def test_mt_ckd400_machinery():
    # synthetic flat tables: check scaling structure and range masking
    wn = jnp.linspace(0.0, 2000.0, 201)  # cm-1
    data = MTCKD400Data(
        wavenumbers=wn,
        self_absco_ref=jnp.full((201,), 1e-22),
        for_absco_ref=jnp.full((201,), 2e-23),
        self_texp=jnp.full((201,), 6.0),
        ref_press=jnp.asarray(1013.0),
        ref_temp=jnp.asarray(296.0),
    )
    f = jnp.asarray([500.0 * 100 * const.c, 3000.0 * 100 * const.c])
    T, P, vh2o = 280.0, 9e4, 0.01
    a_self = np.asarray(h2o_self_mtckd400(f, T, P, {"H2O": vh2o}, data))
    a_for = np.asarray(h2o_foreign_mtckd400(f, T, P, {"H2O": vh2o}, data))
    assert a_self[0] > 0 and a_for[0] > 0
    assert a_self[1] == 0.0 and a_for[1] == 0.0  # outside table
    # self scales ~ vmr^2, foreign ~ vmr (1-vmr)
    a_self2 = np.asarray(h2o_self_mtckd400(f, T, P, {"H2O": 2 * vh2o}, data))
    np.testing.assert_allclose(a_self2[0] / a_self[0], 4.0, rtol=1e-2)
    a_for2 = np.asarray(h2o_foreign_mtckd400(f, T, P, {"H2O": 2 * vh2o}, data))
    np.testing.assert_allclose(
        a_for2[0] / a_for[0], 2 * (1 - 2 * vh2o) / (1 - vh2o), rtol=1e-2
    )


def test_mt_ckd430_machinery():
    # 430 = 400's scaling laws + a separate foreign-closure table
    # (MT_CKD430.cc:103,180,270); check table selection and self parity
    from arts_tpu.predefined.mt_ckd400 import (
        MTCKD430Data,
        h2o_foreign_closure_mtckd430,
        h2o_foreign_mtckd430,
        h2o_self_mtckd430,
    )

    wn = jnp.linspace(0.0, 2000.0, 201)
    data430 = MTCKD430Data(
        wavenumbers=wn,
        self_absco_ref=jnp.full((201,), 1e-22),
        for_absco_ref=jnp.full((201,), 2e-23),
        for_closure_absco_ref=jnp.full((201,), 8e-23),
        self_texp=jnp.full((201,), 6.0),
        ref_press=jnp.asarray(1013.0),
        ref_temp=jnp.asarray(296.0),
    )
    data400 = MTCKD400Data(
        wavenumbers=wn,
        self_absco_ref=jnp.full((201,), 1e-22),
        for_absco_ref=jnp.full((201,), 2e-23),
        self_texp=jnp.full((201,), 6.0),
        ref_press=jnp.asarray(1013.0),
        ref_temp=jnp.asarray(296.0),
    )
    f = jnp.asarray([500.0 * 100 * const.c])
    T, P, vh2o = 280.0, 9e4, 0.01
    args = (f, T, P, {"H2O": vh2o})
    np.testing.assert_allclose(
        np.asarray(h2o_self_mtckd430(*args, data430)),
        np.asarray(h2o_self_mtckd400(*args, data400)),
        rtol=1e-12,
    )
    a_for = np.asarray(h2o_foreign_mtckd430(*args, data430))
    a_clo = np.asarray(h2o_foreign_closure_mtckd430(*args, data430))
    np.testing.assert_allclose(a_clo / a_for, 4.0, rtol=1e-10)


def test_profiler_report():
    clear_report()
    with scope("unit-test-scope"):
        x = jnp.ones(10).sum()
        x.block_until_ready()
    rep = get_report()
    assert "unit-test-scope" in rep
    n, tot, mean = rep["unit-test-scope"]
    assert n == 1 and tot > 0


def test_sweep_checkpoint_roundtrip(tmp_path):
    ck = SweepCheckpointer(tmp_path)
    state = {"x": jnp.arange(5.0), "meta": jnp.asarray(3)}
    ck.save(7, state)
    assert ck.latest_step() == 7
    back = ck.restore(7, state)
    np.testing.assert_allclose(np.asarray(back["x"]), np.arange(5.0))
    assert int(back["meta"]) == 3


def test_ell07_liquid_cloud():
    from arts_tpu.predefined.models import liquidcloud_ell07

    f = jnp.asarray([31.5e9, 90e9, 180e9])
    a = np.asarray(liquidcloud_ell07(f, 283.0, 9e4, {"liquidcloud": 5e-4}))
    # increasing with frequency in the microwave, positive, sane magnitude
    assert np.all(a > 0) and a[2] > a[1] > a[0]
    # LWC 0.5 g/m3 at 31 GHz: roughly 0.005-0.05 dB/km -> 1e-6..1e-5 1/m
    assert 1e-6 < a[0] < 1e-4
    # linear in LWC
    a2 = np.asarray(liquidcloud_ell07(f, 283.0, 9e4, {"liquidcloud": 1e-3}))
    np.testing.assert_allclose(a2 / a, 2.0, rtol=1e-10)


def test_checked_wrapper():
    from arts_tpu.utils.checks import checked

    def good(x):
        return x * 2

    def bad(x):
        return x / 0.0

    err, out = checked(good)(jnp.ones(3))
    err.throw()
    np.testing.assert_allclose(np.asarray(out), 2.0)
    err2, _ = checked(bad)(jnp.ones(3))
    with pytest.raises(Exception):
        err2.throw()


def test_find_data(tmp_path, monkeypatch):
    from arts_tpu.io.config import find_data

    (tmp_path / "lines").mkdir()
    (tmp_path / "lines" / "O2-66.xml").write_text("x")
    monkeypatch.setenv("ARTS_CAT_DATA_DIR", str(tmp_path))
    assert find_data("lines/O2-66.xml").exists()
    with pytest.raises(FileNotFoundError):
        find_data("nope/missing.xml")


def test_plots_headless():
    import matplotlib

    matplotlib.use("Agg", force=True)
    from arts_tpu import plots
    from tests.test_clearsky import SCENE

    f = np.linspace(1e9, 2e9, 5)
    fig, ax = plots.spectral_radiance(f, np.ones(5), unit="Tb")
    fig2, ax2 = plots.absorption_spectrum(f, np.full(5, 1e-6))
    fig3, _ = plots.flux_profile(np.linspace(0, 1e4, 5), np.ones(5), np.ones(5))
    fig4, _ = plots.atm_profiles(SCENE.atm)
    for g in (fig, fig2, fig3, fig4):
        assert g is not None


def test_checkpointed_sweep_killed_and_resumed(tmp_path):
    """A sweep killed mid-way and re-entered resumes from the last saved
    step and produces results identical to an uninterrupted run — driving
    a real radiance sweep through the checkpoint path (VERDICT round-1
    item 10)."""
    import jax.numpy as jnp

    from arts_tpu.fwd import simulate_clearsky
    from arts_tpu.utils.checkpoint import checkpointed_sweep
    from tests.test_clearsky import SCENE, toa_nadir_path

    p = toa_nadir_path()
    alt, dr = jnp.asarray(p.alt), jnp.asarray(p.dr)
    chunks = [jnp.linspace(170e9 + 10e9 * i, 180e9 + 10e9 * i, 16)
              for i in range(5)]

    def step_fn(state, step):
        I = simulate_clearsky(SCENE, chunks[step], alt, dr,
                              background="surface")
        return {"sum": state["sum"] + float(I.sum()),
                "done": jnp.asarray(state["done"]).at[step].set(1.0)}

    init = {"sum": 0.0, "done": jnp.zeros(5)}

    # uninterrupted reference run
    ref = checkpointed_sweep(step_fn, 5, SweepCheckpointer(tmp_path / "a"),
                             init)

    # interrupted run: the process "dies" after step 2's save
    class Killed(RuntimeError):
        pass

    def dying_step(state, step):
        if step == 3:
            raise Killed()
        return step_fn(state, step)

    ck = SweepCheckpointer(tmp_path / "b")
    try:
        checkpointed_sweep(dying_step, 5, ck, init)
        assert False, "should have been killed"
    except Killed:
        pass
    assert ck.latest_step() == 2

    # re-entry with a FRESH checkpointer (new process): resumes at step 3
    resumed = checkpointed_sweep(
        step_fn, 5, SweepCheckpointer(tmp_path / "b"), init
    )
    np.testing.assert_allclose(
        np.asarray(resumed["done"]), np.asarray(ref["done"]), rtol=0
    )
    np.testing.assert_allclose(resumed["sum"], ref["sum"], rtol=0)


def test_hybrid_mesh_and_distributed_helpers():
    """Single-process behavior of the multi-host helpers: make_hybrid_mesh
    falls back to the local mesh; initialize_distributed is a no-op
    without coordination env vars."""
    from arts_tpu.parallel import (
        initialize_distributed,
        make_hybrid_mesh,
        make_mesh,
    )

    assert initialize_distributed() is False
    m = make_hybrid_mesh(n_obs=2, n_freq=4)
    assert m.axis_names == ("obs", "freq")
    assert m.devices.shape == (2, 4)
    m2 = make_mesh(n_obs=2, n_freq=4)
    assert (m.devices == m2.devices).all()


def test_measured_sweep_throughput_meter():
    """measured_sweep chunks a spectrum, wires the points/s meter, and
    concatenates results identically to the unchunked run."""
    import jax.numpy as jnp
    import numpy as np

    from arts_tpu.utils.profiling import measured_sweep

    f = jnp.linspace(1.0, 10.0, 37)
    fn = lambda fc: {"a": fc * 2.0, "b": jnp.stack([fc, fc**2], -1)}
    logs = []
    out, meter = measured_sweep(fn, f, chunk=10, log=logs.append)
    assert meter.points == 37 and meter.rate > 0
    assert len(logs) == 4 and "points/s" in logs[0]
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(f) * 2.0)
    assert out["b"].shape == (37, 2)


def test_bench_lbl_roofline_accounting():
    """The bench's roofline extras (VERDICT r4 item 1) stay coherent:
    visited >= in-window pairs, flop estimate positive, and the
    achieved/peak fraction scales inversely with the stage time."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import build_scene, lbl_roofline

    scene, f_grid = build_scene(n_lev=4, n_freq=512)
    out = lbl_roofline(scene, f_grid, 1e-3)
    assert out["lbl_visited_pairs"] >= out["lbl_inwindow_pairs"] > 0
    assert out["lbl_direct_gflop_est"] > 0
    assert out["vpu_peak_tflops_analytic"] == 1.93
    out2 = lbl_roofline(scene, f_grid, 2e-3)
    assert abs(out2["lbl_roofline_frac"] * 2 - out["lbl_roofline_frac"]) < 0.02
