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
