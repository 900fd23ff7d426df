"""Azimuthally-random-orientation (ARO) single scattering data.

Parity reference: /root/reference/src/core/scattering/ —
  - single_scattering_data.h:43 (SingleScatteringData<Format::ARO,
    Representation::Gridded>)
  - phase_matrix.h:1301 (ARO gridded phase matrix
    [T, F, za_inc, delta_aa, za_scat, 16], all 16 Mueller elements)
  - extinction_matrix.h:195 (ARO extinction [T, F, za_inc, 3]: the three
    independent elements (K11, K12, K34) of the azimuthally-symmetric
    extinction matrix [[a,b,0,0],[b,a,0,0],[0,0,a,c],[0,0,-c,a]])
  - absorption_vector.h (ARO absorption [T, F, za_inc, 2]: (a1, a2))

TPU-native design: one frozen pytree of stacked arrays; all evaluations
are differentiable multilinear interpolations batched over frequency,
and the extinction loads straight into the packed-7 propmat layout
(rtepack_propagation_matrix.h) the polarized pencil-beam pipeline
consumes — oriented hydrometeors give nonzero B (=K12) and W (=K34),
producing polarization through rtepack.emission without any new RT code.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const


def _interp1_weights(grid, x):
    """(i0, i1, w) linear interp indices/weight with clamp-extrapolation.
    A single-node grid degenerates to nearest (w = 0)."""
    x = jnp.asarray(x)
    if grid.shape[0] == 1:
        z = jnp.zeros(x.shape, dtype=jnp.int32)
        return z, z, jnp.zeros_like(x)
    i1 = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
    i0 = i1 - 1
    w = jnp.clip((x - grid[i0]) / (grid[i1] - grid[i0]), 0.0, 1.0)
    return i0, i1, w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SingleScatteringDataARO:
    """ARO gridded single scattering data for one particle (size bin).

    Angles in degrees; phase/extinction/absorption per particle
    (cross-section units m^2 / m^2 sr^-1), multiplied by number density
    at bulk integration.
    """

    t_grid: jax.Array  # [NT]
    f_grid: jax.Array  # [NF]
    za_inc_grid: jax.Array  # [NI] incidence zenith angles
    delta_aa_grid: jax.Array  # [NA] azimuth differences (0..180)
    za_scat_grid: jax.Array  # [NS] scattering zenith angles
    phase: jax.Array  # [NT, NF, NI, NA, NS, 16]
    extinction: jax.Array  # [NT, NF, NI, 3] (K11, K12, K34)
    absorption: jax.Array  # [NT, NF, NI, 2] (a1, a2)

    def _tfz(self, data, f, T, za_inc):
        """Interpolate leading (T, F, za_inc) axes; f batched [F]."""
        it0, it1, wt = _interp1_weights(self.t_grid, T)
        iz0, iz1, wz = _interp1_weights(self.za_inc_grid, za_inc)
        if0, if1, wf = _interp1_weights(self.f_grid, f)  # [F]

        def at(it, iz):
            d = data[it, :, iz]  # [NF, ...]
            wfx = wf.reshape(wf.shape + (1,) * (d.ndim - 1))
            return d[if0] * (1.0 - wfx) + d[if1] * wfx  # [F, ...]

        lo = at(it0, iz0) * (1.0 - wz) + at(it0, iz1) * wz
        hi = at(it1, iz0) * (1.0 - wz) + at(it1, iz1) * wz
        return lo * (1.0 - wt) + hi * wt

    def extinction_propmat(self, f, T, za_inc):
        """Packed-7 propagation matrix per frequency [F, 7] for a pencil
        beam at incidence zenith za_inc [deg]: A = K11, B = K12, W = K34
        (the azimuthally-symmetric extinction structure; to_matrix in
        rtepack.propmat places W at [2,3]/-[3,2])."""
        k3 = self._tfz(self.extinction, f, T, za_inc)  # [F, 3]
        out = jnp.zeros(k3.shape[:-1] + (7,), k3.dtype)
        out = out.at[..., 0].set(k3[..., 0])  # A
        out = out.at[..., 1].set(k3[..., 1])  # B
        out = out.at[..., 6].set(k3[..., 2])  # W
        return out

    def absorption_stokvec(self, f, T, za_inc):
        """Stokes absorption vector [F, 4]: (a1, a2, 0, 0)."""
        a2v = self._tfz(self.absorption, f, T, za_inc)  # [F, 2]
        out = jnp.zeros(a2v.shape[:-1] + (4,), a2v.dtype)
        return out.at[..., :2].set(a2v)

    def phase_matrix(self, f, T, za_inc, delta_aa, za_scat):
        """Lab-frame 4x4 phase matrix [F, 4, 4] at one geometry
        (za_inc, delta_aa, za_scat in degrees)."""
        p = self._tfz(self.phase, f, T, za_inc)  # [F, NA, NS, 16]
        ia0, ia1, wa = _interp1_weights(self.delta_aa_grid, delta_aa)
        is0, is1, ws = _interp1_weights(self.za_scat_grid, za_scat)
        pa = p[:, ia0] * (1.0 - wa) + p[:, ia1] * wa  # [F, NS, 16]
        ps = pa[:, is0] * (1.0 - ws) + pa[:, is1] * ws  # [F, 16]
        return ps.reshape(ps.shape[:-1] + (4, 4))

    def scattering_xsec(self, f, T, za_inc):
        """Brute-force angular integral of Z11 over the data grids:
        C_sca per incidence direction [F] (trapezoid in delta_aa and
        za_scat; delta_aa covers 0..180 so the integral doubles)."""
        p = self._tfz(self.phase, f, T, za_inc)  # [F, NA, NS, 16]
        z11 = p[..., 0]
        aa = jnp.deg2rad(self.delta_aa_grid)
        zs = jnp.deg2rad(self.za_scat_grid)
        inner = jnp.trapezoid(z11 * jnp.sin(zs), zs, axis=-1)  # [F, NA]
        return 2.0 * jnp.trapezoid(inner, aa, axis=-1)  # [F]


def bulk_aro_properties(ssds, weights, f, T, za_inc):
    """Number-density-weighted bulk (propmat [F, 7], absorption [F, 4])
    over particle size bins (get_bulk_scattering_properties ARO analogue,
    bulk_scattering_properties.cc; weights [n_bins] from the PSD in
    particles/m^3)."""
    K = 0.0
    a = 0.0
    for ssd, w in zip(ssds, weights):
        K = K + w * ssd.extinction_propmat(f, T, za_inc)
        a = a + w * ssd.absorption_stokvec(f, T, za_inc)
    return K, a


# ---------------------------------------------------------------------------
# Analytic oriented-particle source: Rayleigh spheroid with vertical axis
# ---------------------------------------------------------------------------
def _basis(za, aa):
    """(khat, theta_hat, phi_hat) for zenith za / azimuth aa [rad]
    (Mishchenko meridional-plane basis)."""
    sz, cz = np.sin(za), np.cos(za)
    sa, ca = np.sin(aa), np.cos(aa)
    khat = np.stack([sz * ca, sz * sa, cz], -1)
    that = np.stack([cz * ca, cz * sa, -sz], -1)
    phat = np.stack([-sa, ca, np.zeros_like(sa)], -1)
    return khat, that, phat


def rayleigh_spheroid_aro(
    f_grid,
    alpha_h,
    alpha_v,
    t_grid=(250.0,),
    za_inc_grid=None,
    delta_aa_grid=None,
    za_scat_grid=None,
):
    """ARO data for a small spheroid with a VERTICAL symmetry axis and
    (complex) polarizability tensor diag(alpha_h, alpha_h, alpha_v) [m^3].

    The dipole scattering amplitude f_pq = k^2 e_p(s).alpha.e_q(i) gives
    the full Mueller phase matrix (Mishchenko amplitude->Z transform),
    and the optical theorem the extinction elements
        K11 = (2 pi / k) Im(f_vv + f_hh),  K12 = (2 pi / k) Im(f_vv - f_hh),
        K34 = (2 pi / k) Re(f_hh - f_vv)
    at the forward direction; absorption a = k Im(alpha_eff) per
    polarization.  Fills the reference's ARO gridded layout exactly —
    the in-repo analogue of the reference's Mie point source (mie.h) for
    oriented particles, and the fixture for the brute-force closure test.
    """
    f_grid = np.asarray(f_grid, dtype=np.float64)
    t_grid = np.asarray(t_grid, dtype=np.float64)
    za_inc_grid = np.asarray(
        np.linspace(0.0, 180.0, 19) if za_inc_grid is None else za_inc_grid
    )
    delta_aa_grid = np.asarray(
        np.linspace(0.0, 180.0, 19) if delta_aa_grid is None else delta_aa_grid
    )
    za_scat_grid = np.asarray(
        np.linspace(0.0, 180.0, 37) if za_scat_grid is None else za_scat_grid
    )
    NT, NF = t_grid.size, f_grid.size
    NI, NA, NS = za_inc_grid.size, delta_aa_grid.size, za_scat_grid.size
    alpha = np.array([alpha_h, alpha_h, alpha_v], dtype=complex)

    k = 2.0 * np.pi * f_grid / const.c  # [NF]

    zi = np.deg2rad(za_inc_grid)[:, None, None]  # [NI,1,1]
    da = np.deg2rad(delta_aa_grid)[None, :, None]
    zs = np.deg2rad(za_scat_grid)[None, None, :]
    zi_b, da_b, zs_b = np.broadcast_arrays(zi, da, zs)
    _, ti, pi_ = _basis(zi_b, np.zeros_like(zi_b))
    _, ts, ps = _basis(zs_b, da_b)

    def amp(e_s, e_q):  # e_s . alpha . e_q, complex [NI,NA,NS]
        return np.einsum("...i,i,...i->...", e_s, alpha, e_q)

    S11 = amp(ts, ti)  # vv
    S12 = amp(ts, pi_)  # vh
    S21 = amp(ps, ti)  # hv
    S22 = amp(ps, pi_)  # hh

    # Mishchenko (2002) eqs. 2.106-2.121, Z from the amplitude matrix
    def herm(x):
        return np.conj(x)

    A = 0.5 * (np.abs(S11) ** 2 + np.abs(S12) ** 2 + np.abs(S21) ** 2
               + np.abs(S22) ** 2)
    Z = np.empty((NI, NA, NS, 4, 4))
    Z[..., 0, 0] = A
    Z[..., 0, 1] = 0.5 * (np.abs(S11) ** 2 - np.abs(S12) ** 2
                          + np.abs(S21) ** 2 - np.abs(S22) ** 2)
    Z[..., 0, 2] = -np.real(S11 * herm(S12) + S22 * herm(S21))
    Z[..., 0, 3] = -np.imag(S11 * herm(S12) - S22 * herm(S21))
    Z[..., 1, 0] = 0.5 * (np.abs(S11) ** 2 + np.abs(S12) ** 2
                          - np.abs(S21) ** 2 - np.abs(S22) ** 2)
    Z[..., 1, 1] = 0.5 * (np.abs(S11) ** 2 - np.abs(S12) ** 2
                          - np.abs(S21) ** 2 + np.abs(S22) ** 2)
    Z[..., 1, 2] = -np.real(S11 * herm(S12) - S22 * herm(S21))
    Z[..., 1, 3] = -np.imag(S11 * herm(S12) + S22 * herm(S21))
    Z[..., 2, 0] = -np.real(S11 * herm(S21) + S22 * herm(S12))
    Z[..., 2, 1] = -np.real(S11 * herm(S21) - S22 * herm(S12))
    Z[..., 2, 2] = np.real(S11 * herm(S22) + S12 * herm(S21))
    Z[..., 2, 3] = np.imag(S11 * herm(S22) + S21 * herm(S12))
    Z[..., 3, 0] = -np.imag(S21 * herm(S11) + S22 * herm(S12))
    Z[..., 3, 1] = -np.imag(S21 * herm(S11) - S22 * herm(S12))
    Z[..., 3, 2] = np.imag(S22 * herm(S11) - S12 * herm(S21))
    Z[..., 3, 3] = np.real(S22 * herm(S11) - S12 * herm(S21))

    # per-frequency scale k^4 (amplitude f = k^2 alpha-contraction)
    phase = (k[:, None, None, None] ** 4)[None, ..., None] * Z.reshape(
        1, 1, NI, NA, NS, 16
    )
    phase = np.broadcast_to(phase, (NT, NF, NI, NA, NS, 16)).copy()

    # forward amplitudes (za_scat = za_inc, delta_aa = 0)
    zi1 = np.deg2rad(za_inc_grid)
    _, ti1, pi1 = _basis(zi1, np.zeros_like(zi1))
    fvv = np.einsum("ni,i,ni->n", ti1, alpha, ti1)  # [NI]
    fhh = np.einsum("ni,i,ni->n", pi1, alpha, pi1)
    ext = np.empty((NI, 3), dtype=complex)
    # C_ext,q = 4 pi k Im(f_qq)/k^2 * k^2 = 4 pi k Im(alpha_qq,eff)
    ext[:, 0] = 0.5 * (4.0 * np.pi * np.imag(fvv) + 4.0 * np.pi * np.imag(fhh))
    ext[:, 1] = 0.5 * (4.0 * np.pi * np.imag(fvv) - 4.0 * np.pi * np.imag(fhh))
    ext[:, 2] = 2.0 * np.pi * np.real(fhh - fvv)
    ext = np.real(ext)

    # absorption = extinction(Im alpha) part; scattering added below
    ca_v = 4.0 * np.pi * np.imag(fvv)  # [NI] (per k)
    ca_h = 4.0 * np.pi * np.imag(fhh)
    # dipole scattering cross sections: (8 pi / 3) k^4 |alpha e_q|^2
    cs_v = (8.0 * np.pi / 3.0) * np.einsum(
        "ni,i->n", np.abs(ti1) ** 2, np.abs(alpha) ** 2
    )
    cs_h = (8.0 * np.pi / 3.0) * np.einsum(
        "ni,i->n", np.abs(pi1) ** 2, np.abs(alpha) ** 2
    )

    extinction = np.empty((NT, NF, NI, 3))
    absorption = np.empty((NT, NF, NI, 2))
    for i_f, kk in enumerate(k):
        cev = kk * ca_v + kk**4 * cs_v
        ceh = kk * ca_h + kk**4 * cs_h
        extinction[:, i_f, :, 0] = 0.5 * (cev + ceh)
        extinction[:, i_f, :, 1] = 0.5 * (cev - ceh)
        extinction[:, i_f, :, 2] = kk * ext[:, 2]
        absorption[:, i_f, :, 0] = 0.5 * kk * (ca_v + ca_h)
        absorption[:, i_f, :, 1] = 0.5 * kk * (ca_v - ca_h)

    return SingleScatteringDataARO(
        t_grid=jnp.asarray(t_grid),
        f_grid=jnp.asarray(f_grid),
        za_inc_grid=jnp.asarray(za_inc_grid),
        delta_aa_grid=jnp.asarray(delta_aa_grid),
        za_scat_grid=jnp.asarray(za_scat_grid),
        phase=jnp.asarray(phase),
        extinction=jnp.asarray(extinction),
        absorption=jnp.asarray(absorption),
    )


def load_legacy_aro(ssd_dict):
    """SingleScatteringDataARO from legacy ARTS SingleScatteringData XML
    (ptype azimuthally_random: pha_mat_data
    [NF, NT, NS, NA, NI, 1, 16], ext_mat_data [NF, NT, NI, 1, 3],
    abs_vec_data [NF, NT, NI, 1, 2]; io/ssd.py reads the XML)."""
    pha = np.asarray(ssd_dict["pha_mat_data"])
    ext = np.asarray(ssd_dict["ext_mat_data"])
    absv = np.asarray(ssd_dict["abs_vec_data"])
    if pha.ndim == 7:
        pha = pha[:, :, :, :, :, 0, :]
    if ext.ndim == 5:
        ext = ext[:, :, :, 0, :]
    if absv.ndim == 5:
        absv = absv[:, :, :, 0, :]
    # legacy [F, T, za_scat, aa, za_inc, s] -> [T, F, za_inc, aa, za_scat, s]
    pha = np.transpose(pha, (1, 0, 4, 3, 2, 5))
    ext = np.transpose(ext, (1, 0, 2, 3))
    absv = np.transpose(absv, (1, 0, 2, 3))
    return SingleScatteringDataARO(
        t_grid=jnp.asarray(ssd_dict["T_grid"]),
        f_grid=jnp.asarray(ssd_dict["f_grid"]),
        za_inc_grid=jnp.asarray(ssd_dict["za_inc_grid"]),
        delta_aa_grid=jnp.asarray(ssd_dict["aa_grid"]),
        za_scat_grid=jnp.asarray(ssd_dict["za_grid"]),
        phase=jnp.asarray(pha),
        extinction=jnp.asarray(ext),
        absorption=jnp.asarray(absv),
    )
