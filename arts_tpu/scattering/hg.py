"""Henyey-Greenstein scatterer.

Parity reference: /root/reference/src/core/scattering/henyey_greenstein.h:27
(`HenyeyGreensteinScatterer`: analytic phase function from an extinction /
ssa / asymmetry triple stored as atmospheric scattering-species properties).
Legendre moments of the HG phase function are exactly g^l.
"""

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HenyeyGreenstein:
    """Bulk HG scattering properties on the atmosphere's altitude grid.

    ext: [..., Z] volume extinction coefficient [1/m]
    ssa: [..., Z] single-scattering albedo
    g:   [..., Z] asymmetry parameter
    Leading axes may carry frequency dependence.
    """

    ext: jax.Array
    ssa: jax.Array
    g: jax.Array

    def bulk_properties(self, nleg: int):
        """(k_ext [.., Z], k_sca [.., Z], leg [.., Z, nleg]) with leg the
        scattering-coefficient-weighted phase moments (unnormalized by ssa)."""
        k_ext = self.ext
        k_sca = self.ext * self.ssa
        ls = jnp.arange(nleg)
        leg = k_sca[..., None] * self.g[..., None] ** ls
        return k_ext, k_sca, leg
