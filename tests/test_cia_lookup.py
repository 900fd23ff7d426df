"""CIA and absorption-lookup-table tests (train with the LBL kernel,
evaluate vs direct computation — the reference's lookup accuracy model,
tests/core/lookup)."""

import jax
import jax.numpy as jnp
import numpy as np

import arts_tpu.constants as const
from arts_tpu.lbl.cia import CIADataset, cia_absorption
from arts_tpu.lbl.lookup import train_lookup
from arts_tpu.lbl.voigt import absorption
from tests.test_voigt_lbl import CAT, PF, VMR


def test_cia_bilinear():
    f0 = jnp.linspace(1e10, 1e12, 21)
    t0 = jnp.asarray([200.0, 250.0, 300.0])
    # xsec = f * t (bilinear exactly representable)
    xs = t0[:, None] * f0[None, :] * 1e-70
    ds = CIADataset(f_grid=f0, t_grid=t0, xsec=xs, spec1=0, spec2=1)
    f = jnp.asarray([5e11, 2e12])  # second outside table
    T, P = 225.0, 1e5
    vmr = jnp.asarray([0.2, 0.8])
    a = np.asarray(ds.absorption(f, T, P, vmr))
    n = P / (const.k * T)
    expect0 = 225.0 * 5e11 * 1e-70 * (n * 0.2) * (n * 0.8)
    np.testing.assert_allclose(a[0], expect0, rtol=1e-10)
    assert a[1] == 0.0  # outside the table
    total = cia_absorption([ds, ds], f, T, P, vmr)
    np.testing.assert_allclose(np.asarray(total), 2 * a, rtol=1e-12)


def test_lookup_matches_direct_lbl():
    f = jnp.linspace(150e9, 400e9, 64)
    npl = 12
    p_grid = jnp.asarray(np.logspace(5, 3, npl))  # descending
    t_ref = jnp.linspace(290.0, 220.0, npl)
    w_ref = jnp.asarray(0.01 * (np.asarray(p_grid) / 1e5))
    vmr_ref = jnp.asarray(VMR)
    t_pert = jnp.asarray([-20.0, -10.0, 0.0, 10.0, 20.0])
    w_pert = jnp.asarray([0.25, 0.5, 1.0, 2.0, 4.0])

    tbl = train_lookup(
        f, CAT, PF, p_grid, t_ref, w_ref, vmr_ref, 0, t_pert, w_pert
    )

    # evaluate at an off-grid point and compare with direct LBL
    P = 3.1e4
    lp = float(jnp.log(P))
    # local reference values
    tr = float(np.interp(lp, np.log(np.sort(np.asarray(p_grid))), np.asarray(t_ref)[::-1]))
    T = tr + 4.7  # inside t_pert range
    wr = float(np.interp(lp, np.log(np.sort(np.asarray(p_grid))), np.asarray(w_ref)[::-1]))
    vmr = vmr_ref.at[0].set(wr * 1.3)
    a_tab = np.asarray(tbl.absorption(T, P, vmr))
    a_dir = np.asarray(absorption(f, CAT, PF, T, P, vmr, no_negative_absorption=False))
    rel = np.abs(a_tab - a_dir) / np.maximum(np.abs(a_dir), np.abs(a_dir).max() * 1e-4)
    # multilinear interp on a coarse grid: percent-level (ARTS quotes similar)
    assert rel.max() < 0.05


def test_lookup_differentiable():
    f = jnp.linspace(150e9, 400e9, 8)
    npl = 6
    p_grid = jnp.asarray(np.logspace(5, 4, npl))
    t_ref = jnp.linspace(290.0, 240.0, npl)
    w_ref = jnp.full((npl,), 0.005)
    tbl = train_lookup(
        f, CAT, PF, p_grid, t_ref, w_ref, jnp.asarray(VMR), 0,
        jnp.asarray([-10.0, 0.0, 10.0]), jnp.asarray([0.5, 1.0, 2.0]),
    )
    g = jax.grad(lambda T: tbl.absorption(T, 5e4, jnp.asarray(VMR)).sum())(273.3)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_lookup_lagrange_orders():
    """Higher interpolation orders reduce mid-grid error vs direct LBL
    (lookup_map.h per-axis Lagrange order parity)."""
    f = jnp.linspace(150e9, 400e9, 64)
    npl = 12
    p_grid = jnp.asarray(np.logspace(5, 3, npl))
    t_ref = jnp.linspace(290.0, 220.0, npl)
    w_ref = jnp.asarray(0.01 * (np.asarray(p_grid) / 1e5))
    vmr_ref = jnp.asarray(VMR)
    t_pert = jnp.asarray([-20.0, -10.0, 0.0, 10.0, 20.0])
    w_pert = jnp.asarray([0.25, 0.5, 1.0, 2.0, 4.0])
    tbl = train_lookup(
        f, CAT, PF, p_grid, t_ref, w_ref, vmr_ref, 0, t_pert, w_pert
    )

    P = 3.1e4
    lp = float(jnp.log(P))
    logs = np.log(np.sort(np.asarray(p_grid)))
    tr = float(np.interp(lp, logs, np.asarray(t_ref)[::-1]))
    wr = float(np.interp(lp, logs, np.asarray(w_ref)[::-1]))
    T = tr + 4.7
    vmr = vmr_ref.at[0].set(wr * 1.3)
    truth = np.asarray(
        absorption(f, CAT, PF, T, P, vmr, no_negative_absorption=False)
    )
    scale = np.abs(truth).max()
    e1 = np.abs(np.asarray(tbl.absorption(T, P, vmr)) - truth).max()
    e3 = np.abs(
        np.asarray(tbl.absorption(T, P, vmr, t_order=3, w_order=2, p_order=3))
        - truth
    ).max()
    assert e3 < e1 * 0.8 or e3 < 1e-3 * scale
