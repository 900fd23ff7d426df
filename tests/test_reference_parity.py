"""Full-scene parity against the reference's published golden values.

Reproduces examples/3-allsky-radiative-transfer/1-disort/1-disort.sht.py
offline: the example's own data files (atmosphere + scattering particles,
checked in next to the example) + the PWR98/standard gas models + our
DISORT.  The ARTS 2.6 golden brightness temperatures are hard-coded in the
example at :182 (clearsky) and :175 (cloudy; arts3 itself reports its
cloudy result as suspect, so the cloudy tolerance is loose).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arts_tpu.atm import Atmosphere1D
from arts_tpu.fwd_allsky import AllskyScene, HabitProfile, simulate_allsky
from arts_tpu.io.artsxml import load
from arts_tpu.io.ssd import habit_from_legacy_ssd
from arts_tpu.ops.planck import inv_planck
from arts_tpu.scattering import MGDSingleMoment, ScatteringHabit

ALLSKY = "/root/reference/examples/3-allsky-radiative-transfer/1-disort"
F_GRID = jnp.asarray([31.5e9, 165e9, 666e9])
GOLD_CLEAR = [298.566120236439, 283.35611518369, 251.643322551348]
GOLD_CLOUDY = [271.694859567588, 272.601957925916, 251.643215266136]


def example_atmosphere(step=100.0):
    z = load(f"{ALLSKY}/1-z_field.xml")[:, 0, 0]
    t = load(f"{ALLSKY}/1-t_field.xml")[:, 0, 0]
    p = load(f"{ALLSKY}/1-p_grid.xml")
    vmr = load(f"{ALLSKY}/1-vmr_field.xml")[:, :, 0, 0]  # [3, 49] N2 O2 H2O
    coarse = Atmosphere1D(
        z=jnp.asarray(z), t=jnp.asarray(t), p=jnp.asarray(p), vmr=jnp.asarray(vmr)
    )
    # the example integrates with max_stepsize=100 m to TOA 12 km
    zf = jnp.asarray(np.arange(0.0, 12e3 + 0.5 * step, step))
    pts = coarse.at(zf)
    fine = Atmosphere1D(
        z=zf, t=pts.t, p=pts.p, vmr=jnp.moveaxis(pts.vmr, -1, 0)
    )
    return fine, float(t[0])


def scene(wc_scale=0.0, step=100.0):
    atm, t_surf = example_atmosphere(step)
    scatterers = ()
    if wc_scale > 0:
        ssd = load(f"{ALLSKY}/1-scat_data.xml")
        meta = load(f"{ALLSKY}/1-scat_meta.xml")
        habit = habit_from_legacy_ssd(ssd[0], meta[0], nleg=40)  # rain
        psd = MGDSingleMoment.from_name("Wang16", t_min=270.0, t_max=300.0)
        pbf = load(f"{ALLSKY}/1-particle_bulkprop_field.xml")[0, :, 0, 0]  # RWC
        zc = load(f"{ALLSKY}/1-z_field.xml")[:, 0, 0]
        wc = jnp.asarray(np.interp(np.asarray(atm.z), zc, pbf)) * wc_scale
        scatterers = (
            HabitProfile(habit_psd=ScatteringHabit(habit=habit, psd=psd), wc=wc),
        )
    return AllskyScene(
        atm=atm,
        cat=None,
        pf=None,
        scatterers=scatterers,
        surface_temperature=jnp.asarray(t_surf),
        predef=("N2-SelfContStandardType", "O2-PWR98", "H2O-PWR98"),
        species_names=("N2", "O2", "H2O"),
    )


def toa_nadir_bt(out):
    return np.asarray(inv_planck(out.u0[:, 0, -1], F_GRID))


def test_clearsky_golden_brightness_temperatures():
    out = simulate_allsky(scene(0.0), F_GRID, nquad=40, nleg=40, nfourier=1)
    bt = toa_nadir_bt(out)
    # ARTS 2.6 goldens; measured max deviation 0.424 K at 165 GHz
    # (robust to discretization — physics-level per the verify notes, the
    # PWR98 H2O line list's 165-GHz wing vs the reference's full catalog);
    # asserted with ~0.08 K headroom.
    np.testing.assert_allclose(bt, GOLD_CLEAR, atol=0.5)
    assert np.abs(bt - np.asarray(GOLD_CLEAR)).max() < 0.45


def test_cloudy_golden_brightness_temperatures():
    out = simulate_allsky(scene(1.0), F_GRID, nquad=40, nleg=40, nfourier=1)
    bt = toa_nadir_bt(out)
    assert np.all(np.isfinite(bt))
    # rain darkens the two window channels relative to clearsky
    clear = toa_nadir_bt(
        simulate_allsky(scene(0.0), F_GRID, nquad=40, nleg=40, nfourier=1)
    )
    assert bt[0] < clear[0] and bt[1] < clear[1]
    # ARTS 2.6 goldens. The reference (arts3) fails to reproduce these and
    # flags its own cloudy DISORT as suspect (1-disort.sht.py:172-176); our
    # independent solver agrees with ARTS 2.6 to 0.15 K (measured max
    # deviation 0.149 K at 31.5 GHz); asserted with 0.05 K headroom.
    np.testing.assert_allclose(bt, GOLD_CLOUDY, atol=0.2)
