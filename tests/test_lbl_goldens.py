"""LBL Voigt-LTE parity vs reference-transcribed goldens.

The goldens in tests/goldens/lbl_goldens.json are produced by
native/lbl_harness/gen_lbl_goldens.cpp — a standalone transcription of the
reference's lbl hot path (lbl_lineshape_voigt_lte.cpp, lbl_lineshape_model.cpp,
lbl_temperature_model.h, lbl_data.h) that calls the reference's OWN Faddeeva
3rdparty implementation for w(z).  This anchors the framework's #1 kernel to
the reference's numbers instead of self-certification: multi-perturber
lineshape mixing across all temperature laws, ByLine cutoff subtraction, the
mirrored shape, dalpha/dT, and a full clear-sky radiance.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arts_tpu.atm import Atmosphere1D
from arts_tpu.fwd import ClearskyScene, simulate_clearsky
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import PartFunTable
from arts_tpu.lbl.tmodel import VARS
from arts_tpu.lbl.voigt import absorption

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "lbl_goldens.json"


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS) as f:
        return json.load(f)


def _catalog(sc):
    """Reconstruct a LineCatalog + PartFunTable from a golden scenario."""
    lines = []
    for ln in sc["lines"]:
        ls = {}
        for p in ln["ls"]:
            key = "bath" if p["spec"] == -2 else p["spec"]
            vars_ = {}
            for v, ent in zip(VARS, p["v"]):
                if ent["law"] != 0:
                    vars_[v] = (ent["law"], ent["x"])
            ls[key] = vars_
        lines.append(
            dict(
                f0=ln["f0"],
                a=ln["a"],
                e0=ln["e0"],
                gu=ln["gu"],
                gl=ln["gl"],
                iso_mass=ln["mass"],
                iso_ratio=ln["ratio"],
                spec_idx=ln["spec_idx"],
                iso_idx=ln["iso_idx"],
                band_idx=0,
                t0=ln["t0"],
                cutoff=float(ln["cutoff"]),
                ls=ls,
            )
        )
    cat = build_catalog(lines)
    pf = PartFunTable(coeffs=jnp.asarray(np.array(sc["q_coeffs"])))
    return cat, pf


ABS_SCENARIOS = [
    "single_line_t1",
    "multi_perturber",
    "cutoff_byline",
    "mirrored",
    "law_zoo",
]


@pytest.mark.parametrize("name", ABS_SCENARIOS)
def test_absorption_matches_reference(goldens, name):
    sc = goldens[name]
    cat, pf = _catalog(sc)
    f_grid = jnp.asarray(sc["f_grid"])
    alpha = absorption(
        f_grid,
        cat,
        pf,
        jnp.asarray(sc["T"]),
        jnp.asarray(sc["P"]),
        jnp.asarray(sc["vmr"]),
        no_negative_absorption=False,
        mirrored=sc["mirrored"],
    )
    ref = np.asarray(sc["alpha"])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(alpha), ref, rtol=1e-6, atol=1e-9 * scale
    )


def test_dalpha_dt_vs_reference_fd(goldens):
    """Autodiff dalpha/dT against the reference harness's central difference
    (mirrors tests/core/lbl/voigt_derivatives_perturbed.py methodology)."""
    sc = goldens["multi_perturber"]
    cat, pf = _catalog(sc)
    f_grid = jnp.asarray(sc["f_grid"])
    P = jnp.asarray(sc["P"])
    vmr = jnp.asarray(sc["vmr"])

    dadt = jax.jacfwd(
        lambda T: absorption(
            f_grid, cat, pf, T, P, vmr, no_negative_absorption=False
        )
    )(jnp.asarray(float(sc["T"])))

    tp = np.asarray(goldens["multi_perturber_tp"]["alpha"])
    tm = np.asarray(goldens["multi_perturber_tm"]["alpha"])
    dT = goldens["multi_perturber_tp"]["T"] - goldens["multi_perturber_tm"]["T"]
    fd = (tp - tm) / dT
    # FD truncation error is O(dT^2 * alpha'''), so a looser gate than the
    # value parity; scale-relative to the peak derivative
    scale = np.abs(fd).max()
    np.testing.assert_allclose(np.asarray(dadt), fd, rtol=2e-4, atol=1e-6 * scale)


def test_radiance_matches_reference(goldens):
    sc = goldens["radiance_clearsky"]
    cat, pf = _catalog(sc)
    f_grid = jnp.asarray(sc["f_grid"])
    z = jnp.asarray(sc["z"])
    atm = Atmosphere1D(
        z=z,
        t=jnp.asarray(sc["t_profile"]),
        p=jnp.asarray(sc["p_profile"]),
        vmr=jnp.tile(jnp.asarray(sc["vmr"])[:, None], (1, z.shape[0])),
    )
    scene = ClearskyScene(
        atm=atm,
        cat=cat,
        pf=pf,
        surface_temperature=jnp.asarray(sc["t_surf"]),
        surface_emissivity=jnp.asarray(1.0),
    )
    # observer at TOA looking down; path points TOA -> surface
    path_alt = z[::-1]
    path_dr = jnp.diff(z)[::-1]
    I = simulate_clearsky(
        scene, f_grid, path_alt, path_dr, background="surface"
    )
    ref = np.asarray(sc["radiance"])
    np.testing.assert_allclose(np.asarray(I), ref, rtol=1e-6)
