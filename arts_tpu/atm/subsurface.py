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
