"""Partition functions Q(T) per isotopologue.

Parity reference: /root/reference/src/partfun/ (coefficient- or
interpolation-form data compiled in from arts-cat-data XML).  Here the data
is a runtime pytree: either a polynomial-coefficient table or a sampled
T-grid table evaluated with differentiable interpolation — both batched
over isotopologues so Q(T) for every line is one gather + fused math.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartFunTable:
    """Q(T) for a set of isotopologues.

    Either polynomial coefficients ``coeffs`` [n_iso, n_coef] meaning
    Q(T) = sum_k coeffs[i, k] * T^k, or a sampled table ``t_grid`` [n_t] /
    ``q_grid`` [n_iso, n_t] interpolated linearly (ARTS interpolates its
    gridded form too).  If both are present the table wins.
    """

    coeffs: Optional[jax.Array] = None
    t_grid: Optional[jax.Array] = None
    q_grid: Optional[jax.Array] = None

    def Q(self, T, iso_idx):
        """Q(T) for isotopologue indices iso_idx (any shape)."""
        if self.t_grid is not None:
            t = self.t_grid
            i1 = jnp.clip(jnp.searchsorted(t, T), 1, t.shape[0] - 1)
            i0 = i1 - 1
            w = (T - t[i0]) / (t[i1] - t[i0])
            q = self.q_grid[iso_idx]  # [..., n_t]
            return q[..., i0] * (1.0 - w) + q[..., i1] * w
        c = self.coeffs[iso_idx]  # [..., n_coef]
        # Horner in T
        out = c[..., -1]
        for k in range(c.shape[-1] - 2, -1, -1):
            out = out * T + c[..., k]
        return out


def rigid_rotor_table(n_iso: int, q296, exponent=1.0):
    """Test helper: Q(T) = Q296 * (T/296)^exponent sampled on a T grid."""
    t = np.linspace(50.0, 500.0, 451)
    q296 = np.broadcast_to(np.asarray(q296, dtype=np.float64), (n_iso,))
    q = q296[:, None] * (t[None, :] / 296.0) ** exponent
    return PartFunTable(t_grid=jnp.asarray(t), q_grid=jnp.asarray(q))
