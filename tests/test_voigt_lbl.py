"""LBL Voigt absorption vs an independent numpy/scipy reimplementation of
the reference formulas (lbl_lineshape_voigt_lte.cpp), plus autodiff vs
finite differences (mirrors tests/core/lbl/voigt_derivatives_perturbed.py
methodology in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special

import arts_tpu.constants as const
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.voigt import absorption, lineshape_params

# --- synthetic 2-species catalog: species 0 = "H2O"-like, 1 = "N2" bath ---
T0 = 296.0
LINES = [
    dict(
        f0=183.31e9,
        a=3e-6,
        e0=2.2e-21,
        gu=9.0,
        gl=7.0,
        iso_mass=18.0,
        iso_ratio=0.997,
        spec_idx=0,
        iso_idx=0,
        band_idx=0,
        t0=T0,
        cutoff=np.inf,
        ls={
            0: {
                "G0": (Law.T1, [2.8e4, 0.76]),
                "D0": (Law.T0, [150.0]),
            },
            "bath": {
                "G0": (Law.T1, [1.2e4, 0.70]),
                "D0": (Law.T1, [-96.0, 1.0]),
                "Y": (Law.T1, [1e-7, 0.8]),
            },
        },
    ),
    dict(
        f0=325.15e9,
        a=7e-6,
        e0=3.0e-21,
        gu=11.0,
        gl=9.0,
        iso_mass=18.0,
        iso_ratio=0.997,
        spec_idx=0,
        iso_idx=0,
        band_idx=0,
        t0=T0,
        cutoff=750e9,
        ls={
            "bath": {
                "G0": (Law.T1, [2.0e4, 0.75]),
                "G": (Law.T1, [1e-12, 0.5]),
            }
        },
    ),
]
CAT = build_catalog(LINES)
PF = rigid_rotor_table(1, 180.0, 1.5)
T, P = 275.0, 80000.0
VMR = np.array([0.01, 0.99])


def numpy_reference(f_grid, T, P, vmr):
    """Independent reimplementation of the ARTS Voigt-LTE formulas."""
    alpha = np.zeros_like(f_grid)
    shape = np.zeros_like(f_grid, dtype=complex)
    Q = 180.0 * (T / 296.0) ** 1.5
    for ln in LINES:
        # line shape parameter mixing
        vals = {}
        for var in ("G0", "D0", "Y", "G", "DV"):
            num = 0.0
            wsum = 0.0
            bath = None
            for pert, vars_ in ln["ls"].items():
                if var not in vars_:
                    v = 0.0
                else:
                    law, x = vars_[var]
                    if law == Law.T0:
                        v = x[0]
                    elif law == Law.T1:
                        v = x[0] * (ln["t0"] / T) ** x[1]
                    else:
                        raise NotImplementedError
                pfac = P * P if var in ("G", "DV") else P
                v = v * pfac
                if pert == "bath":
                    bath = v
                else:
                    num += vmr[pert] * v
                    wsum += vmr[pert]
            if bath is not None:
                vals[var] = num + (1.0 - wsum) * bath
            else:
                vals[var] = num / wsum if wsum > 0 else 0.0
        s_lte = (
            ln["a"]
            * ln["gu"]
            * np.exp(-ln["e0"] / (const.k * T))
            / (ln["f0"] ** 3 * Q)
        )
        f0s = ln["f0"] + vals["D0"] + vals["DV"]
        gd = np.sqrt(const.doppler_broadening_const_squared * T / ln["iso_mass"]) * f0s
        inv_gd = 1.0 / gd
        lm = (1.0 + vals["G"]) - 1j * vals["Y"]
        s = const.inv_sqrt_pi * inv_gd * ln["iso_ratio"] * vmr[ln["spec_idx"]] * lm * s_lte
        z = inv_gd * (f_grid - f0s) + 1j * vals["G0"] * inv_gd
        w = special.wofz(z)
        if np.isfinite(ln["cutoff"]):
            zc = inv_gd * ln["cutoff"] + 1j * vals["G0"] * inv_gd
            wc = special.wofz(zc)
            inside = np.abs(f_grid - f0s) <= ln["cutoff"]
            shape += np.where(inside, s * (w - wc), 0.0)
        else:
            shape += s * w
    N = P / (const.k * T)
    scl = -N * f_grid * np.expm1(-const.h * f_grid / (const.k * T)) * (
        const.c**2 / (8 * np.pi)
    )
    alpha = scl * shape.real
    return np.maximum(alpha, 0.0)


F_GRID = np.linspace(150e9, 400e9, 501)


def test_absorption_matches_reference_formulas():
    got = np.asarray(absorption(jnp.asarray(F_GRID), CAT, PF, T, P, jnp.asarray(VMR)))
    ref = numpy_reference(F_GRID, T, P, VMR)
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_absorption_blocks_equal():
    a1 = absorption(jnp.asarray(F_GRID), CAT, PF, T, P, jnp.asarray(VMR), block=1)
    a2 = absorption(jnp.asarray(F_GRID), CAT, PF, T, P, jnp.asarray(VMR), block=256)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-12)


def test_lineshape_params_bath_mixing():
    ls = np.asarray(lineshape_params(CAT, T, P, jnp.asarray(VMR)))
    # line 0 G0: vmr0*self + (1-vmr0)*bath
    g0_self = 2.8e4 * (T0 / T) ** 0.76 * P
    g0_bath = 1.2e4 * (T0 / T) ** 0.70 * P
    expect = VMR[0] * g0_self + (1 - VMR[0]) * g0_bath
    np.testing.assert_allclose(ls[0, 0], expect, rtol=1e-12)


def test_jacobian_vs_finite_difference():
    f = jnp.asarray(F_GRID[::50])
    # T strictly inside a partition-table cell (at a knot the piecewise-linear
    # Q has a slope jump and FD straddles it)
    T = 275.37

    def fT(t):
        return absorption(f, CAT, PF, t, P, jnp.asarray(VMR))

    jac = jax.jacfwd(fT)(jnp.asarray(T))
    # FD of the same function (checks autodiff against the numerics, like
    # the reference's voigt_derivatives_perturbed.py); h centered inside one
    # partition-table cell so the interpolated Q stays smooth
    h = 1e-4
    fd = (np.asarray(fT(jnp.asarray(T + h))) - np.asarray(fT(jnp.asarray(T - h)))) / (
        2 * h
    )
    np.testing.assert_allclose(np.asarray(jac), fd, rtol=2e-5, atol=1e-22)

    def fv(v):
        return absorption(f, CAT, PF, T, P, v)

    jv = jax.jacfwd(fv)(jnp.asarray(VMR))
    hv = 1e-7
    dv = jnp.asarray([hv, 0.0])
    fd0 = (np.asarray(fv(jnp.asarray(VMR) + dv)) - np.asarray(fv(jnp.asarray(VMR) - dv))) / (
        2 * hv
    )
    np.testing.assert_allclose(np.asarray(jv[:, 0]), fd0, rtol=2e-5, atol=1e-22)


def test_mirrored_lineshape():
    """VP_LTE_MIRROR parity (lbl_lineshape_voigt_lte_mirrored.h:44):
    F = w(z) + w(zm). The mirror term matters at f << f0."""
    from scipy import special

    f = jnp.asarray([1e9, 50e9, 183e9])
    a_plain = np.asarray(absorption(f, CAT, PF, T, P, jnp.asarray(VMR),
                                    no_negative_absorption=False))
    a_mirr = np.asarray(absorption(f, CAT, PF, T, P, jnp.asarray(VMR),
                                   no_negative_absorption=False, mirrored=True))
    # mirror term adds absorption at low frequency
    assert a_mirr[0] > a_plain[0]
    # near line center the mirror is negligible relative to the direct term
    np.testing.assert_allclose(a_mirr[2], a_plain[2], rtol=1e-3)


def test_absorption_realpair_matches_complex_path():
    """The complex-free formulation (required for f64-on-TPU: the x64
    rewriter cannot compile c128 graphs) is the same math."""
    a_c = np.asarray(
        absorption(jnp.asarray(F_GRID), CAT, PF, T, P, jnp.asarray(VMR))
    )
    a_r = np.asarray(
        absorption(
            jnp.asarray(F_GRID), CAT, PF, T, P, jnp.asarray(VMR), realpair=True
        )
    )
    scale = a_c.max()
    np.testing.assert_allclose(a_r, a_c, rtol=1e-9, atol=1e-12 * scale)


def test_species_absorption_auto_realpair_on_accelerators():
    """fwd.species_absorption must preserve absorption()'s realpair=None
    auto-dispatch: an f64 trace on a non-CPU backend selects the
    complex-free formulation (the TPU x64 rewriter cannot compile c128 —
    forcing realpair=False there SIGABRTs the tunnel compile helper,
    caught as a round-5 regression in the driver's entry() check)."""
    import unittest.mock as mock

    import jax

    import arts_tpu.lbl.voigt as voigt_mod
    from arts_tpu.fwd import ClearskyScene, species_absorption

    scene = ClearskyScene(atm=None, cat=CAT, pf=PF)
    f = jnp.linspace(99e9, 101e9, 64, dtype=jnp.float64)
    with mock.patch.object(voigt_mod.jax, "default_backend", lambda: "tpu"):
        jaxpr = jax.make_jaxpr(
            lambda fg: species_absorption(scene, fg, 250.0, 5e3,
                                          jnp.asarray([0.01]))
        )(f)
    assert "complex" not in repr(jaxpr), (
        "f64 species_absorption traced complex dtypes for a non-CPU "
        "backend — realpair auto-dispatch lost"
    )
