"""Magnetic-field and wind Jacobians at radiance level vs finite
differences, plus an OEM retrieval of a magnetic-field profile scale.

Parity: the reference's dedicated suites
  tests/core/zeeman/spectral_radiance_jacobian_magnetic_field.py
    (and its linear_in_tau / linear_in_tau_and_prop variants — the three
    rte_option discretizations, each FD-checked for du/dv/dw)
  tests/core/zeeman/spectral_radiance_jacobian_abs_magnetic_field.py
    (propmat-level dK/dB)
  tests/core/wind/spectral_radiance_jacobian_wind.py and
  tests/core/wind/freq_grid_derivatives.py
    (dI/d(wind component) through the Doppler-shifted frequency grid;
    the reference needed a dedicated jac_windFix in src/m_abs.cc —
    exactly the path where autodiff can silently be wrong).

Here every Jacobian is autodiff through the full forward operator; FD is
the truth.  Tolerances follow tests/test_clearsky.py's T/VMR checks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arts_tpu.atm import Atmosphere1D
from arts_tpu.atm.field import hydrostatic_pressure
from arts_tpu.fwd import ZeemanScene, simulate_clearsky, simulate_clearsky_polarized
from arts_tpu.lbl.zeeman import zeeman_propmat
from test_clearsky import SCENE
from test_zeeman import PF, ZCAT


def zeeman_atm(n_lev=9):
    # mesosphere/lower thermosphere: pressure low enough that the Zeeman
    # splitting (~0.4 MHz at 30 uT) rivals the Doppler + pressure widths
    # (the regime the reference's zeeman jacobian tests probe); at
    # tropospheric pressures the 118.75 GHz line saturates the +-4 MHz
    # window and dI/dB vanishes identically
    z = jnp.linspace(50e3, 100e3, n_lev)
    t = 260.0 - 1.0e-3 * (z - 50e3)
    p = hydrostatic_pressure(z, t, 80.0)
    vmr = jnp.stack([jnp.full_like(z, 0.2095)])
    # a gently sheared field so levels are distinguishable
    mag = jnp.stack(
        [
            10e-6 * (1.0 + z / 200e3),
            5e-6 * (1.0 - z / 300e3),
            30e-6 * (1.0 + z / 400e3),
        ]
    )
    return Atmosphere1D(z=z, t=t, p=p, vmr=vmr, mag=mag)


ZATM = zeeman_atm()

# a weaker copy of test_zeeman's 118.75 GHz line for the RADIANCE-level
# tests: at the original strength the path saturates within one layer
# (tau ~ 1e3, T underflows to exactly 0) and dI/dB vanishes identically;
# the propmat-level test keeps the original ZCAT
import copy as _copy

from arts_tpu.lbl.catalog import build_catalog as _build_catalog
from arts_tpu.lbl.zeeman import expand_zeeman as _expand_zeeman
from test_zeeman import LINES as _LINES

_LW = _copy.deepcopy(_LINES)
_LW[0]["a"] = 3e-9
ZCATW = _expand_zeeman(
    _build_catalog(_LW), ju=[1.0], jl=[1.0], gu_z=[-2.8], gl_z=[-2.77]
)
ZSCENE = ZeemanScene(atm=ZATM, zcat=ZCATW, pf=PF)
FZ = jnp.linspace(118.75e9 - 4e6, 118.75e9 + 4e6, 41)


@pytest.mark.parametrize("rte_option", ["constant", "lintau", "linprop"])
def test_radiance_jacobian_magnetic_field(rte_option):
    """dI/d(mag_{c, lev}) by autodiff equals central differences for all
    three layer discretizations and all three field components."""
    alt = ZATM.z
    dr = jnp.diff(ZATM.z)
    za = jnp.full_like(alt, 45.0)

    def fwd(mag):
        scene = dataclasses.replace(
            ZSCENE, atm=dataclasses.replace(ZATM, mag=mag)
        )
        return simulate_clearsky_polarized(
            scene, FZ, alt, za, dr, background="space",
            rte_option=rte_option,
        )  # [F, 4]

    mag0 = ZATM.mag
    jac = jax.jacrev(fwd)(mag0)  # [F, 4, 3, N]
    assert np.isfinite(np.asarray(jac)).all()

    h = 1e-9  # [T]; B ~ 3e-5 T
    scale = np.abs(np.asarray(jac)).max()
    assert scale > 0.0
    for comp, lev in ((0, 2), (1, 4), (2, 6)):
        e = jnp.zeros_like(mag0).at[comp, lev].set(h)
        fd = (np.asarray(fwd(mag0 + e)) - np.asarray(fwd(mag0 - e))) / (
            2.0 * h
        )
        np.testing.assert_allclose(
            np.asarray(jac[:, :, comp, lev]), fd,
            rtol=5e-4, atol=1e-6 * scale,
            err_msg=f"{rte_option} dI/d(mag[{comp},{lev}])",
        )


def test_propmat_jacobian_magnetic_field():
    """Propmat-level dK/d(u,v,w) vs FD (abs_magnetic_field parity): the
    hand-written dnorm_view_du/dv/dw chain of the reference is autodiff
    through magnetic_angles + the pseudo-line contraction here."""
    f = FZ
    T, P = 230.0, 3e3
    vmr = jnp.asarray([0.2095])
    mag0 = jnp.asarray([10e-6, 5e-6, 30e-6])

    def propmat(mag):
        return zeeman_propmat(f, ZCAT, PF, T, P, vmr, mag, 65.0, 30.0)

    jac = jax.jacrev(propmat)(mag0)  # [F, 7, 3]
    scale = np.abs(np.asarray(jac)).max()
    h = 1e-9
    for c in range(3):
        e = jnp.zeros(3).at[c].set(h)
        fd = (np.asarray(propmat(mag0 + e)) - np.asarray(propmat(mag0 - e))) / (
            2.0 * h
        )
        np.testing.assert_allclose(
            np.asarray(jac[..., c]), fd, rtol=1e-5, atol=1e-7 * scale,
            err_msg=f"dK/d(mag[{c}])",
        )


def test_oem_retrieves_magnetic_field_scale():
    """A Gauss-Newton OEM retrieves a perturbed magnetic-field profile
    scale through the polarized Zeeman forward operator (the reference's
    flagship Zeeman retrieval artifact, here as the log-scale state)."""
    from arts_tpu.retrieval.oem import oem

    alt = ZATM.z
    dr = jnp.diff(ZATM.z)
    za = jnp.full_like(alt, 45.0)

    def forward(x):
        scene = dataclasses.replace(
            ZSCENE,
            atm=dataclasses.replace(ZATM, mag=ZATM.mag * jnp.exp(x[0])),
        )
        I = simulate_clearsky_polarized(
            scene, FZ, alt, za, dr, background="space"
        )
        # V Stokes component carries the field-strength signature
        return jnp.concatenate([I[:, 0], I[:, 3]])

    truth = jnp.asarray([np.log(1.23)])
    y_obs = forward(truth)
    res = oem(
        forward,
        x_a=jnp.asarray([0.0]),
        y_obs=y_obs,
        S_a=jnp.asarray([1.0]),
        S_e=jnp.full(y_obs.shape, (1e-4 * float(jnp.abs(y_obs).max())) ** 2),
        method="gn",
        max_iter=15,
    )
    assert res.converged
    # mirror the reference's 1% gate (full_optimal_estimation.py ATOL)
    np.testing.assert_allclose(
        float(jnp.exp(res.x[0])), 1.23, rtol=0.01
    )


def test_radiance_jacobian_wind():
    """dI/d(wind component) through the Doppler-shifted frequency grid vs
    central differences, uplooking and slant (jacobian_wind parity; the
    grid-derivative chain the reference patched with jac_windFix)."""
    from arts_tpu.path import geometric_path_1d

    # +-20 GHz: the intermediate-opacity wings carry the signal — inside
    # the ~2.5 GHz pressure-broadened saturated core the radiance is
    # exactly the first layer's Planck value and dI/d(anything) == 0
    f = jnp.linspace(183.31e9 - 2e10, 183.31e9 + 2e10, 41)

    for za_obs in (0.0, 60.0):  # uplooking + slant
        p = geometric_path_1d(0.0, za_obs, 0.0, 80e3, 4000.0)
        alt, dr = jnp.asarray(p.alt), jnp.asarray(p.dr)
        za = jnp.asarray(p.za)

        def fwd(wind):
            scene = dataclasses.replace(
                SCENE, atm=dataclasses.replace(SCENE.atm, wind=wind)
            )
            return simulate_clearsky(
                scene, f, alt, dr, background="space", path_za=za
            )

        wind0 = jnp.stack(
            [
                jnp.zeros_like(SCENE.atm.z),
                jnp.full_like(SCENE.atm.z, 10.0),
                jnp.full_like(SCENE.atm.z, 120.0),
            ]
        )
        jac = jax.jacrev(fwd)(wind0)  # [F, 3, N]
        assert np.isfinite(np.asarray(jac)).all()
        scale = np.abs(np.asarray(jac)).max()
        assert scale > 0.0

        h = 0.5  # [m/s]
        # vertical component everywhere; horizontal (N) only on the slant
        comps = (2,) if za_obs == 0.0 else (1, 2)
        for c in comps:
            lev = 8
            e = jnp.zeros_like(wind0).at[c, lev].set(h)
            fd = (np.asarray(fwd(wind0 + e)) - np.asarray(fwd(wind0 - e))) / (
                2.0 * h
            )
            np.testing.assert_allclose(
                np.asarray(jac[:, c, lev]), fd,
                rtol=5e-4, atol=1e-6 * scale,
                err_msg=f"za={za_obs} dI/d(wind[{c},{lev}])",
            )
