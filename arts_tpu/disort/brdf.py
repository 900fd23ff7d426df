"""Non-Lambertian surfaces for DISORT: BRDF Fourier modes.

Parity reference: the reference feeds per-Fourier-mode surface
reflectances into its solver (src/core/disort-cpp/disort.cpp:196-205 and
the BDRF struct in disort.h:39; Lambertian is the constant mode-0 special
case, m_disort_settings.cc:590).  Its classic cdisort engine derives
those modes from a full bidirectional reflectivity by azimuth quadrature
(c_surface_bidir, 3rdparty/cdisort):

    BDR_m(mu_i, mu_j) = (2 - delta_m0)/2 * sum_k gwt_k
                        * brdf(mu_i, mu_j, pi * gmu_k) * cos(m pi gmu_k)

with (gmu, gwt) a Gauss-Legendre rule on (0, 1) mirrored to (-1, 0), the
beam column evaluated at mu_j = mu0, and the directional emissivity
1 - hemispheric reflectance.  The solver applies 2 * sum_j w_j mu_j
BDR_m(i, j) to the downward field and BDR_m(i, beam) mu0 fbeam / pi to
the attenuated direct beam (no factor 2).

TPU-native: the modes are dense [nfourier, N, N] arrays built by one
vectorized evaluation of the (traceable) BRDF function over a static
(out, in, azimuth) grid — differentiable wrt any BRDF parameters closed
over by the function.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .quadrature import double_gauss


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceBrdf:
    """Fourier-mode surface reflection operators at quadrature angles."""

    bdr: jax.Array  # [nfourier, N, N] mode m, outgoing i, incoming j
    bdr_beam: jax.Array  # [nfourier, N] incoming = mu0
    bem: jax.Array  # [N] directional emissivity 1 - hemispheric refl


def hapke_brdf(mu_out, mu_in, dphi, b0=1.0, hh=0.06, w=0.6):
    """Hapke (1993) BRDF, cdisort c_bidir_reflectivity_hapke parity
    (defaults are cdisort's hard-coded values)."""
    ctheta = mu_out * mu_in + jnp.sqrt(
        jnp.clip((1.0 - mu_out**2) * (1.0 - mu_in**2), 0.0)
    ) * jnp.cos(dphi)
    ctheta = jnp.clip(ctheta, -1.0, 1.0)
    thetah = jnp.arccos(ctheta)
    p = 1.0 + 0.5 * ctheta
    b = b0 * hh / (hh + jnp.tan(0.5 * thetah))
    gam = jnp.sqrt(1.0 - w)
    h0 = (1.0 + 2.0 * mu_in) / (1.0 + 2.0 * gam * mu_in)
    h = (1.0 + 2.0 * mu_out) / (1.0 + 2.0 * gam * mu_out)
    return 0.25 * w * ((1.0 + b) * p + h0 * h - 1.0) / (mu_out + mu_in)


def rpv_brdf(mu_out, mu_in, dphi, rho0=0.027, k=0.647, theta=-0.169,
             scale=1.0):
    """Rahman-Pinty-Verstraete BRDF (cdisort c_bidir_reflectivity_rpv
    core form, without the hotspot sigma/t1/t2 extensions)."""
    ci, co = mu_in, mu_out
    si = jnp.sqrt(jnp.clip(1.0 - ci**2, 0.0))
    so = jnp.sqrt(jnp.clip(1.0 - co**2, 0.0))
    cphi = jnp.cos(dphi)
    cosg = ci * co + si * so * cphi
    cosg = jnp.clip(cosg, -1.0, 1.0)
    ti, to = si / ci, so / co
    G = jnp.sqrt(jnp.clip(ti**2 + to**2 - 2.0 * ti * to * cphi, 1e-12))
    F = (1.0 - theta**2) / (1.0 + 2.0 * theta * cosg + theta**2) ** 1.5
    hot = 1.0 + (1.0 - rho0) / (1.0 + G)
    return scale * rho0 * (ci * co * (ci + co)) ** (k - 1.0) * F * hot


def surface_brdf_modes(brdf_fn, nquad: int, nfourier: int, mu0=None,
                       nmug: int = 50):
    """Build SurfaceBrdf Fourier modes from a bidirectional reflectivity.

    brdf_fn(mu_out, mu_in, dphi) must broadcast over jnp arrays; nquad is
    the solver's NQuad (2N streams).  The azimuth rule and normalization
    replicate cdisort's c_surface_bidir (NMUG-point mirrored Gauss rule),
    so results validate against cdisort goldens bit-for-bit in the
    quadrature limit.
    """
    n = nquad // 2
    mu, _ = double_gauss(n)
    gmu_h, gwt_h = double_gauss(nmug // 2)  # (0, 1) half rule
    # mirrored azimuth rule on (-1, 1): dphi = pi * u
    gmu = np.concatenate([gmu_h, -gmu_h])
    gwt = np.concatenate([gwt_h, gwt_h])
    mu_j = jnp.asarray(mu)
    u = jnp.asarray(gmu)
    wu = jnp.asarray(gwt)
    m_arr = jnp.arange(nfourier)

    # bdr[m, i, j]: outgoing mu_i, incoming mu_j, azimuth-projected
    vals = brdf_fn(
        mu_j[:, None, None], mu_j[None, :, None], jnp.pi * u[None, None, :]
    )  # [N, N, K]
    cosm = jnp.cos(m_arr[:, None] * jnp.pi * u[None, :])  # [M, K]
    pref = 0.5 * (2.0 - (m_arr == 0).astype(vals.dtype))
    bdr = pref[:, None, None] * jnp.einsum(
        "ijk,k,mk->mij", vals, wu, cosm
    )

    if mu0 is not None:
        vb = brdf_fn(mu_j[:, None], mu0, jnp.pi * u[None, :])  # [N, K]
        bdr_beam = pref[:, None] * jnp.einsum("ik,k,mk->mi", vb, wu, cosm)
    else:
        bdr_beam = jnp.zeros((nfourier, n), bdr.dtype)

    # directional emissivity: 1 - int brdf mu' dmu' dphi (cdisort dref)
    ve = brdf_fn(
        mu_j[:, None, None], jnp.asarray(gmu_h)[None, :, None],
        jnp.pi * u[None, None, :],
    )  # [N, Kh, K]
    dref = jnp.einsum(
        "ijk,j,j,k->i", ve, jnp.asarray(gwt_h), jnp.asarray(gmu_h), wu
    )
    bem = 1.0 - dref
    return SurfaceBrdf(bdr=bdr, bdr_beam=bdr_beam, bem=bem)
