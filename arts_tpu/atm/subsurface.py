"""Subsurface fields and subsurface thermal emission.

Parity reference: /root/reference/src/core/subsurface/subsurf.h —
`SubsurfaceField` (depth profiles of temperature and dielectric/optical
properties below the surface) and the DISORT subsurface emission mode
(spectral_radSubsurfaceDisortEmissionWithJacobian, src/m_subsurface.cc:36).

The emerging radiance from an absorbing half-space with a temperature
profile is computed with the same layer recursion used in the
atmosphere (rtepack emission), fed by a per-layer absorption profile.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.planck import planck
from ..rtepack.emission import emission_unpolarized


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubsurfaceField:
    """1D depth profiles below the surface (depth ascending from 0)."""

    depth: jax.Array  # [ND] positive depths [m], ascending from 0
    t: jax.Array  # [ND]
    absorption: jax.Array  # [ND] or [ND, F] volume absorption [1/m]
    # optional volume scattering (snow/firn/regolith): single-scattering
    # albedo and Henyey-Greenstein asymmetry per depth level
    ssa: jax.Array | None = None  # [ND]
    g: jax.Array | None = None  # [ND]

    def emerging_radiance(self, f_grid, mu=1.0):
        """Upwelling radiance at the surface from below, per frequency.

        mu: cosine of the propagation angle below the surface (refraction
        handled by the caller's surface model).  Bottom boundary: the
        deepest layer is treated as semi-infinite (blackbody at t[-1]).
        """
        k = self.absorption
        if k.ndim == 1:
            k = k[:, None] * jnp.ones_like(f_grid)[None, :]
        J = planck(f_grid[None, :], self.t[:, None])
        dr = jnp.diff(self.depth) / mu
        I0 = J[-1]  # semi-infinite: deep radiance = local Planck
        return emission_unpolarized(k, J, dr, I0)

    def emerging_radiance_disort(
        self, f_grid, I_down=None, nquad: int = 16, min_optical_depth=1e-11
    ):
        """Emerging radiance by a DISORT solve over the depth profile.

        Parity: spectral_radSubsurfaceDisortEmission /
        disort_spectral_rad_fieldDepthProfile (src/m_subsurface.cc:36,
        workspace_meta_methods.cpp:118-129) — the depth grid becomes the
        DISORT layer stack ("TOA" = the surface at depth 0), thermal
        emission linear in tau, the deepest layer's blackbody as the
        bottom boundary, and the downwelling atmospheric radiance
        illuminating the top as isotropic intensity (the reference's
        disort_settings_downwelling_wrapper_agenda).  Volume scattering
        uses the optional (ssa, g) Henyey-Greenstein profiles.

        I_down: [F] downwelling radiance at the surface (None = 0).
        Returns a DisortOutput vmapped over f_grid: u0[:, lev, :] has the
        upwelling intensities at positive quadrature mu; the emerging
        radiance is out.u0[:, 0, nquad//2:].
        """
        from ..disort.solver import DisortInput, disort

        F = f_grid.shape[0]
        nd = self.depth.shape[0]
        k = self.absorption
        if k.ndim == 1:
            k = k[:, None] * jnp.ones((1, F), k.dtype)
        k_lay = 0.5 * (k[:-1] + k[1:])  # [ND-1, F]
        dz = jnp.diff(self.depth)[:, None]
        ssa = jnp.zeros((nd,)) if self.ssa is None else self.ssa
        gg = jnp.zeros((nd,)) if self.g is None else self.g
        omega_lay = 0.5 * (ssa[:-1] + ssa[1:])
        g_lay = 0.5 * (gg[:-1] + gg[1:])
        # tau from the absorption midpoint alone — the reference's
        # convention (disort_settingsSubsurfaceScalarAbsorption,
        # m_disort_settings.cc:568-573: tau_i = r_i * midpoint(k), ssa
        # applied separately), with the same per-layer floor so DISORT
        # stays numerically stable on zero-absorption layers.
        tau = jnp.maximum(k_lay * dz, min_optical_depth)  # [ND-1, F]
        nleg = nquad
        leg = g_lay[:, None] ** jnp.arange(nleg)[None, :]  # HG moments g^l
        b_levels = planck(f_grid[None, :], self.t[:, None])  # [ND, F]

        if I_down is None:
            I_down = jnp.zeros_like(f_grid)

        def one(tau_f, leg_f, b_f, idn):
            inp = DisortInput(
                tau=tau_f,
                omega=jnp.broadcast_to(omega_lay, tau_f.shape),
                leg=leg_f,
                f=jnp.zeros_like(tau_f),
                b_levels=b_f,
                fbeam=jnp.asarray(0.0),
                fisot=idn,
                albedo=jnp.asarray(0.0),
                b_surf=b_f[-1],
                b_top=jnp.asarray(0.0),
            )
            return disort(inp, nquad=nquad, nleg=nleg, nfourier=1)

        leg_b = jnp.broadcast_to(leg[None], (F,) + leg.shape)
        return jax.vmap(one)(tau.T, leg_b, b_levels.T, I_down)
