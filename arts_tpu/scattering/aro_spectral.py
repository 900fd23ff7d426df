"""ARO single-scattering data in SPECTRAL (spherical-harmonic) form.

Parity reference: /root/reference/src/core/scattering/ —
  - scattering_species.h:31-68 (Representation::Spectral for Format::ARO,
    get_bulk_scattering_properties_aro_spectral(degree, order))
  - single_scattering_data.h:43 + phase_matrix.h (to_spectral: the phase
    matrix over the scattering angles (za_scat, delta_aa) per incidence
    angle expands in spherical harmonics of degree l <= L, order m <= M)

TPU-native design: the SH ANALYSIS is a host-side least-squares against
the real SH basis at load time (numpy; the reference links shtns for the
same job, SURVEY.md L0) — each Mueller element keeps its delta_aa parity
(the azimuthally-random symmetry: the [0:2, 0:2] and [2:4, 2:4] blocks
are even in delta_aa, the off-diagonal blocks odd; Mishchenko 2003).
The traced SYNTHESIS is a dense [n_coeff] contraction per evaluation —
batched, differentiable, and far smaller than the gridded tables for
smooth habits (the point of the spectral form).

Fidelity: Z11 (and any frame-invariant scalar) converges spectrally.
The POLARIZED elements carry the meridional-frame rotation, which has
spin-weight-2 structure a scalar per-element SH basis cannot represent
exactly (their m >= 2 azimuthal components do not vanish at the
za_scat poles the way P_l^m does) — truncation error of order 10% is
inherent at moderate degree.  The reference's to_spectral
(phase_matrix.h:1399) applies scalar shtns per element and shares
exactly this limitation; a lossless treatment needs spin-weighted
harmonics (future work, noted here deliberately).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# delta_aa parity of the 16 Mueller elements (row-major), ARO symmetry:
# True = even (cos series), False = odd (sin series)
_EVEN = np.array(
    [
        True, True, False, False,
        True, True, False, False,
        False, False, True, True,
        False, False, True, True,
    ]
)


def _sh_basis(degree, order, za_deg, daa_deg):
    """Real SH design matrix [n_angles, n_coeff] over flattened
    (za_scat x delta_aa) angles, split by azimuth parity.

    Returns (B_even, B_odd, idx_even, idx_odd) where idx_* are the
    (l, m) pairs per column; normalization is orthonormal on the sphere.
    """
    from scipy.special import lpmv
    from scipy.special import gammaln

    th = np.deg2rad(np.asarray(za_deg))
    ph = np.deg2rad(np.asarray(daa_deg))
    x = np.cos(th)

    cols_e, cols_o, idx_e, idx_o = [], [], [], []
    for m in range(0, order + 1):
        for l in range(m, degree + 1):
            nrm = np.sqrt(
                (2 * l + 1)
                / (4 * np.pi)
                * np.exp(gammaln(l - m + 1) - gammaln(l + m + 1))
            )
            if m > 0:
                nrm *= np.sqrt(2.0)
            P = nrm * lpmv(m, l, x)  # [NS]
            ce = (P[:, None] * np.cos(m * ph)[None, :]).ravel()
            cols_e.append(ce)
            idx_e.append((l, m))
            if m > 0:
                co = (P[:, None] * np.sin(m * ph)[None, :]).ravel()
                cols_o.append(co)
                idx_o.append((l, m))
    B_e = np.stack(cols_e, -1)
    B_o = np.stack(cols_o, -1) if cols_o else np.zeros((B_e.shape[0], 0))
    return B_e, B_o, idx_e, idx_o


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SingleScatteringDataAROSpectral:
    """ARO data with the phase matrix in real-SH coefficients.

    coeffs_even/[.._odd]: [NT, NF, NI, nC, n_even/odd-elements] — the
    even-parity Mueller elements' cos-series and the odd elements'
    sin-series coefficients; extinction/absorption stay gridded in
    (T, F, za_inc) (they are directional, not angular, quantities).
    """

    t_grid: jax.Array
    f_grid: jax.Array
    za_inc_grid: jax.Array
    coeffs_even: jax.Array  # [NT, NF, NI, nCe, 8]
    coeffs_odd: jax.Array  # [NT, NF, NI, nCo, 8]
    extinction: jax.Array  # [NT, NF, NI, 3]
    absorption: jax.Array  # [NT, NF, NI, 2]
    degree: int = dataclasses.field(metadata=dict(static=True), default=4)
    order: int = dataclasses.field(metadata=dict(static=True), default=4)

    def _tfz(self, data, f, T, za_inc):
        from .aro import _interp1_weights

        it0, it1, wt = _interp1_weights(self.t_grid, T)
        iz0, iz1, wz = _interp1_weights(self.za_inc_grid, za_inc)
        if0, if1, wf = _interp1_weights(self.f_grid, f)

        def at(it, iz):
            d = data[it, :, iz]
            wfx = wf.reshape(wf.shape + (1,) * (d.ndim - 1))
            return d[if0] * (1.0 - wfx) + d[if1] * wfx

        lo = at(it0, iz0) * (1.0 - wz) + at(it0, iz1) * wz
        hi = at(it1, iz0) * (1.0 - wz) + at(it1, iz1) * wz
        return lo * (1.0 - wt) + hi * wt

    def extinction_propmat(self, f, T, za_inc):
        k3 = self._tfz(self.extinction, f, T, za_inc)
        out = jnp.zeros(k3.shape[:-1] + (7,), k3.dtype)
        out = out.at[..., 0].set(k3[..., 0])
        out = out.at[..., 1].set(k3[..., 1])
        out = out.at[..., 6].set(k3[..., 2])
        return out

    def absorption_stokvec(self, f, T, za_inc):
        a2v = self._tfz(self.absorption, f, T, za_inc)
        out = jnp.zeros(a2v.shape[:-1] + (4,), a2v.dtype)
        return out.at[..., :2].set(a2v)

    def phase_matrix(self, f, T, za_inc, delta_aa, za_scat):
        """Synthesize the lab-frame 4x4 phase matrix [F, 4, 4] at one
        scattering geometry from the SH coefficients."""
        ce = self._tfz(self.coeffs_even, f, T, za_inc)  # [F, nCe, 8]
        co = self._tfz(self.coeffs_odd, f, T, za_inc)  # [F, nCo, 8]
        be, bo = _sh_eval_single(
            self.degree, self.order, za_scat, delta_aa, ce.dtype
        )
        even = jnp.einsum("c,fce->fe", be, ce)
        odd = jnp.einsum("c,fce->fe", bo, co)
        out = jnp.zeros(even.shape[:-1] + (16,), even.dtype)
        out = out.at[..., jnp.asarray(np.where(_EVEN)[0])].set(even)
        out = out.at[..., jnp.asarray(np.where(~_EVEN)[0])].set(odd)
        return out.reshape(out.shape[:-1] + (4, 4))

    def scattering_xsec(self, f, T, za_inc):
        """C_sca from the (l=0, m=0) coefficient of Z11: the spherical
        mean is c00 Y00 with Y00 = 1/sqrt(4 pi), so the integral is
        c00 sqrt(4 pi) (the spectral form's free lunch)."""
        ce = self._tfz(self.coeffs_even, f, T, za_inc)
        return ce[..., 0, 0] * jnp.sqrt(4.0 * jnp.pi)


def _sh_eval_single(degree, order, za_scat_deg, delta_aa_deg, dtype):
    """(basis_even [nCe], basis_odd [nCo]) at ONE (za_scat, delta_aa)
    in degrees (host-side numpy: angles are scene geometry)."""
    B_e, B_o, _, _ = _sh_basis(
        degree, order, np.atleast_1d(za_scat_deg), np.atleast_1d(delta_aa_deg)
    )
    return jnp.asarray(B_e[0], dtype), jnp.asarray(B_o[0], dtype)


def aro_to_spectral(ssd, degree: int = 8, order: int = 8):
    """Host-side SH analysis of a gridded ARO dataset (to_spectral
    parity).  Least-squares fit of each Mueller element's angular
    dependence per (T, F, za_inc); exact when the data is band-limited
    at (degree, order) and the grid resolves it."""
    B_e, B_o, _, _ = _sh_basis(
        degree, order, np.asarray(ssd.za_scat_grid),
        np.asarray(ssd.delta_aa_grid),
    )
    ph = np.asarray(ssd.phase)  # [NT, NF, NI, NA, NS, 16]
    NT, NF, NI, NA, NS, _ = ph.shape
    # flatten angles in the same (za_scat x delta_aa) order as _sh_basis:
    # basis ravel is (NS, NA) with za outer — transpose phase to match
    flat = np.transpose(ph, (0, 1, 2, 4, 3, 5)).reshape(
        NT * NF * NI, NS * NA, 16
    )
    B = NT * NF * NI

    def fit(Bmat, elem_idx):
        nC = Bmat.shape[1]
        if nC == 0:
            return np.zeros((NT, NF, NI, 0, 8))
        rhs = flat[..., elem_idx]  # [B, NSNA, 8]
        rhs = rhs.transpose(1, 0, 2).reshape(NS * NA, B * 8)
        c = np.linalg.lstsq(Bmat, rhs, rcond=None)[0]  # [nC, B*8]
        return (
            c.reshape(nC, B, 8).transpose(1, 0, 2)
            .reshape(NT, NF, NI, nC, 8)
        )

    ce = fit(B_e, np.where(_EVEN)[0])
    co = fit(B_o, np.where(~_EVEN)[0])
    return SingleScatteringDataAROSpectral(
        t_grid=ssd.t_grid,
        f_grid=ssd.f_grid,
        za_inc_grid=ssd.za_inc_grid,
        coeffs_even=jnp.asarray(ce),
        coeffs_odd=jnp.asarray(co),
        extinction=ssd.extinction,
        absorption=ssd.absorption,
        degree=degree,
        order=order,
    )


def bulk_aro_spectral_properties(ssds, weights, f, T, za_inc):
    """Number-density-weighted bulk (propmat [F, 7], absorption [F, 4])
    in the spectral representation
    (get_bulk_scattering_properties_aro_spectral analogue)."""
    K = 0.0
    a = 0.0
    for ssd, w in zip(ssds, weights):
        K = K + w * ssd.extinction_propmat(f, T, za_inc)
        a = a + w * ssd.absorption_stokvec(f, T, za_inc)
    return K, a


# ---------------------------------------------------------------------------
# Spin-weighted spectral representation (lossless polarized elements)
#
# The Q/U rows of the phase matrix are measured in the outgoing meridional
# frame, which is coordinate-singular at the za_scat poles: as functions on
# the outgoing-direction sphere they carry spin weight +-2, so a scalar
# per-element SH basis (the reference's shtns to_spectral,
# phase_matrix.h:1399) converges only algebraically (~10% at moderate
# degree).  Expanding the complex combinations eta_c = Z[Q,c] + i Z[U,c]
# in spin-weighted spherical harmonics restores spectral convergence —
# this representation EXCEEDS the reference.  Host-side analysis
# (Wigner-d via log-factorial sums, numpy); synthesis stays one dense
# contraction.


def _wigner_d(l, mp, m, beta):
    """d^l_{mp,m}(beta), vectorized over beta (Wikipedia convention,
    log-factorial stabilized; exact for the moderate l used here)."""
    from scipy.special import gammaln

    beta = np.asarray(beta, dtype=np.float64)
    c = np.cos(beta / 2.0)
    s = np.sin(beta / 2.0)
    pref = 0.5 * (
        gammaln(l + mp + 1) + gammaln(l - mp + 1)
        + gammaln(l + m + 1) + gammaln(l - m + 1)
    )
    out = np.zeros_like(beta)
    for k in range(max(0, m - mp), min(l + m, l - mp) + 1):
        logden = (
            gammaln(l + m - k + 1) + gammaln(k + 1)
            + gammaln(mp - m + k + 1) + gammaln(l - mp - k + 1)
        )
        # powers of possibly-zero sines/cosines: 0^0 = 1 handled by power
        out = out + (-1.0) ** (mp - m + k) * np.exp(pref - logden) * (
            c ** (2 * l + m - mp - 2 * k)
        ) * (s ** (mp - m + 2 * k))
    return out


def _spin_basis(degree, za_deg, daa_deg):
    """Complex spin-(+2) + spin-(-2) SH design matrix over flattened
    (za_scat x delta_aa) angles: [NS*NA, nC] with columns
    sqrt((2l+1)/4pi) d^l_{m,s0}(theta) e^{i m phi}, s0 in {+2, -2},
    l in 2..degree, m in -l..l.  The doubled (overcomplete) span makes
    the representation convention-proof: whichever spin sign the data's
    frame handedness implies is inside the span, and the least-norm fit
    reproduces grid values exactly for band-limited data."""
    th = np.deg2rad(np.asarray(za_deg))
    ph = np.deg2rad(np.asarray(daa_deg))
    cols = []
    for s0 in (2, -2):
        for l in range(2, degree + 1):
            nrm = np.sqrt((2 * l + 1) / (4.0 * np.pi))
            for m in range(-l, l + 1):
                dd = nrm * _wigner_d(l, m, s0, th)  # [NS]
                cols.append(
                    (dd[:, None] * np.exp(1j * m * ph)[None, :]).ravel()
                )
    return np.stack(cols, -1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SingleScatteringDataAROSpinSpectral:
    """ARO data with scalar rows (I, V) in real SH and the spin-2 rows
    (Q, U) as complex spin-weighted SH coefficients — lossless where the
    scalar representation truncates."""

    t_grid: jax.Array
    f_grid: jax.Array
    za_inc_grid: jax.Array
    coeffs_even: jax.Array  # [NT, NF, NI, nCe, 4] scalar rows, even elems
    coeffs_odd: jax.Array  # [NT, NF, NI, nCo, 4] scalar rows, odd elems
    spin_re: jax.Array  # [NT, NF, NI, nC2, 4] Re of eta_c coefficients
    spin_im: jax.Array  # [NT, NF, NI, nC2, 4]
    extinction: jax.Array
    absorption: jax.Array
    degree: int = dataclasses.field(metadata=dict(static=True), default=8)
    order: int = dataclasses.field(metadata=dict(static=True), default=8)

    _tfz = SingleScatteringDataAROSpectral._tfz
    extinction_propmat = SingleScatteringDataAROSpectral.extinction_propmat
    absorption_stokvec = SingleScatteringDataAROSpectral.absorption_stokvec

    def scattering_xsec(self, f, T, za_inc):
        ce = self._tfz(self.coeffs_even, f, T, za_inc)
        return ce[..., 0, 0] * jnp.sqrt(4.0 * jnp.pi)

    def phase_matrix(self, f, T, za_inc, delta_aa, za_scat):
        """Lab-frame 4x4 phase matrix [F, 4, 4] at one geometry."""
        ce = self._tfz(self.coeffs_even, f, T, za_inc)  # [F, nCe, 4]
        co = self._tfz(self.coeffs_odd, f, T, za_inc)
        sre = self._tfz(self.spin_re, f, T, za_inc)  # [F, nC2, 4]
        sim = self._tfz(self.spin_im, f, T, za_inc)
        be, bo, _, _ = _sh_basis(
            self.degree, self.order, np.atleast_1d(za_scat),
            np.atleast_1d(delta_aa),
        )
        Bsp = _spin_basis(
            self.degree, np.atleast_1d(za_scat), np.atleast_1d(delta_aa)
        )[0]
        be = jnp.asarray(be[0], ce.dtype)
        bo = jnp.asarray(bo[0], ce.dtype)
        br = jnp.asarray(Bsp.real, ce.dtype)
        bi = jnp.asarray(Bsp.imag, ce.dtype)
        even = jnp.einsum("c,fce->fe", be, ce)  # [F, 4]
        odd = jnp.einsum("c,fce->fe", bo, co)
        eta_re = jnp.einsum("c,fce->fe", br, sre) - jnp.einsum(
            "c,fce->fe", bi, sim
        )
        eta_im = jnp.einsum("c,fce->fe", br, sim) + jnp.einsum(
            "c,fce->fe", bi, sre
        )
        out = jnp.zeros(even.shape[:-1] + (16,), even.dtype)
        # scalar rows: I row (0..3) parity [T,T,F,F]; V row (12..15)
        # parity [F,F,T,T]
        out = out.at[..., jnp.asarray([0, 1, 14, 15])].set(even)
        out = out.at[..., jnp.asarray([2, 3, 12, 13])].set(odd)
        # spin rows: Q row = Re(eta), U row = Im(eta)
        out = out.at[..., 4:8].set(eta_re)
        out = out.at[..., 8:12].set(eta_im)
        return out.reshape(out.shape[:-1] + (4, 4))


def aro_to_spectral_spin(ssd, degree: int = 8):
    """Host-side spin-weighted SH analysis of a gridded ARO dataset.

    Scalar rows (I, V) fit as in aro_to_spectral; the (Q, U) rows fit as
    complex eta_c = Z[Q,c] + i Z[U,c] against the spin-weighted basis."""
    B_e, B_o, _, _ = _sh_basis(
        degree, degree, np.asarray(ssd.za_scat_grid),
        np.asarray(ssd.delta_aa_grid),
    )
    Bsp = _spin_basis(
        degree, np.asarray(ssd.za_scat_grid), np.asarray(ssd.delta_aa_grid)
    )
    ph = np.asarray(ssd.phase)  # [NT, NF, NI, NA, NS, 16]
    NT, NF, NI, NA, NS, _ = ph.shape
    flat = np.transpose(ph, (0, 1, 2, 4, 3, 5)).reshape(
        NT * NF * NI, NS * NA, 16
    )
    B = NT * NF * NI

    def fit(Bmat, rhs):  # rhs [B, NSNA, 4]
        nC = Bmat.shape[1]
        r = rhs.transpose(1, 0, 2).reshape(NS * NA, B * 4)
        c = np.linalg.lstsq(Bmat, r, rcond=None)[0]
        return c.reshape(nC, B, 4).transpose(1, 0, 2).reshape(
            NT, NF, NI, nC, 4
        )

    ce = fit(B_e, flat[..., [0, 1, 14, 15]])
    co = fit(B_o, flat[..., [2, 3, 12, 13]])
    eta = flat[..., 4:8] + 1j * flat[..., 8:12]
    csp = fit(Bsp, eta)
    return SingleScatteringDataAROSpinSpectral(
        t_grid=ssd.t_grid,
        f_grid=ssd.f_grid,
        za_inc_grid=ssd.za_inc_grid,
        coeffs_even=jnp.asarray(ce.real),
        coeffs_odd=jnp.asarray(co.real),
        spin_re=jnp.asarray(csp.real),
        spin_im=jnp.asarray(csp.imag),
        extinction=ssd.extinction,
        absorption=ssd.absorption,
        degree=degree,
        order=degree,
    )
