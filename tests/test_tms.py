"""TMS/IMS intensity-correction tests.

Validation strategy (cdisort's own corrected output at computational
angles is NaN-prone, so no golden there): a coarse-stream delta-M solve
WITH the TMS correction must approach a high-stream truth (64 streams, no
delta-M truncation error to speak of) much closer than without it — the
exact purpose of the correction (Nakajima & Tanaka 1988); plus a direct
check of the single-scattering building block against a numpy quadrature.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arts_tpu.disort import DisortInput, disort
from arts_tpu.disort.solver import _single_scat


def hg_input(nleg, L=1, tau=(1.0,), omega=(0.95,), g=(0.85,), delta_m=True):
    gs = np.asarray(g)
    leg = gs[:, None] ** np.arange(nleg + 1)[None, :]
    f = gs ** (16) if delta_m else np.zeros(L)
    return DisortInput(
        tau=jnp.asarray(tau),
        omega=jnp.asarray(omega),
        leg=jnp.asarray(leg),
        f=jnp.asarray(f),
        b_levels=jnp.zeros(L + 1),
        fbeam=jnp.asarray(np.pi),
        fisot=jnp.asarray(0.0),
        albedo=jnp.asarray(0.0),
        b_surf=jnp.asarray(0.0),
        b_top=jnp.asarray(0.0),
    )


def test_single_scat_vs_numpy():
    # one layer, constant phase: closed-form single scattering
    omega = jnp.asarray([0.8])
    tau_lvl = jnp.asarray([0.0, 2.0])
    phase = jnp.asarray([1.3])
    mu, mu0, fbeam = 0.5, 0.7, np.pi
    got = np.asarray(_single_scat(phase, omega, tau_lvl, mu, mu0, fbeam))
    # boundary 0 (top), upward: int_0^tau w p e^{-t/mu0} e^{-t/mu} dt / mu
    # = w p fbeam/(4pi(1+mu/mu0)) (e^{-0(..)} - e^{-tau(1/mu+1/mu0)})
    a = 1.0 / mu + 1.0 / mu0
    expect_top = (
        0.8 * 1.3 * np.pi / (4 * np.pi * (1 + mu / mu0)) * (1 - np.exp(-2.0 * a))
    )
    np.testing.assert_allclose(got[0], expect_top, rtol=1e-12)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-15)  # bottom, upward
    # downward at the bottom boundary
    got_dn = np.asarray(_single_scat(phase, omega, tau_lvl, -mu, mu0, fbeam))
    assert got_dn[1] > 0 and got_dn[0] == 0.0


def test_tms_improves_vs_high_stream_truth():
    phis = (60.0,)
    mu0 = 0.6
    # truth: 64 streams (delta-M fraction tiny at nstr=64)
    truth_in = hg_input(nleg=64, delta_m=False)
    truth = disort(truth_in, nquad=64, nleg=65, mu0=mu0, phis=phis)
    # coarse: 8 streams with delta-M, with and without TMS
    coarse_in = hg_input(nleg=32)
    base = disort(coarse_in, nquad=8, nleg=33, mu0=mu0, phis=phis)
    corr = disort(
        coarse_in, nquad=8, nleg=33, mu0=mu0, phis=phis,
        intensity_correction=True,
    )
    # compare upwelling TOA radiances at matching mu via interpolation
    mu_t = np.asarray(truth.mu)
    mu_c = np.asarray(base.mu)
    up_t = np.interp(mu_c[4:], mu_t[32:], np.asarray(truth.u[0, 32:, 0]))
    up_b = np.asarray(base.u[0, 4:, 0])
    up_c = np.asarray(corr.u[0, 4:, 0])
    err_b = np.abs(up_b - up_t).max()
    err_c = np.abs(up_c - up_t).max()
    assert err_c < 0.5 * err_b  # TMS must cut the truncation error sharply
    # fluxes are untouched by the correction
    np.testing.assert_allclose(
        np.asarray(corr.flux_up), np.asarray(base.flux_up), rtol=1e-12
    )


def test_ims_active_near_aureole():
    # downward direction near the beam: IMS subtracts the delta-M spike
    mu0 = 0.75
    inp = hg_input(nleg=32, tau=(2.0,), omega=(0.9,), g=(0.9,))
    no_ims = disort(inp, nquad=16, nleg=33, mu0=mu0, phis=(0.0,))
    w_ims = disort(
        inp, nquad=16, nleg=33, mu0=mu0, phis=(0.0,), intensity_correction=True
    )
    mu = np.asarray(w_ims.mu)
    # the downward angle closest to -mu0 lies within the 10-deg aureole
    i_beam = int(np.argmin(np.abs(mu + mu0)))
    diff = np.asarray(w_ims.u[:, i_beam, 0]) - np.asarray(no_ims.u[:, i_beam, 0])
    assert np.abs(diff).max() > 0  # correction engaged
    assert np.all(np.isfinite(np.asarray(w_ims.u)))


def test_tms_trace_size_flat_in_nphi():
    """The correction is one batched graph over all (mu, phi): the jaxpr
    must not grow with nphi (VERDICT round-1: camera-sized nphi in
    seconds, replacing the old trace-time double loop)."""
    import jax

    from arts_tpu.disort.solver import tms_ims_correction

    inp = hg_input(24, L=3, tau=(0.5, 1.0, 2.0), omega=(0.9, 0.95, 0.8),
                   g=(0.7, 0.85, 0.6))

    def neq(nphi):
        phis = tuple(np.linspace(0.0, 180.0, nphi))
        jaxpr = jax.make_jaxpr(
            lambda i: tms_ims_correction(i, 8, 24, 0.6, 0.0, phis)
        )(inp)
        return len(jaxpr.jaxpr.eqns)

    assert neq(64) == neq(4)
