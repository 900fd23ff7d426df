"""HITRAN cross-section fit absorption (O3 XFIT etc.).

Parity reference: /root/reference/src/core/absorption/xsec_fit.{h,cc} —
`XsecRecord`: per dataset a frequency grid + 4 fit coefficients per
frequency, xsec = P00 + P10 T + P01 p + P20 T^2 (CalcXsec :175-184),
clipped nonnegative, linearly interpolated to the requested grid and
zero outside the measured band (Extract :75-173).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as const


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class XsecFitDataset:
    """One fitted band of one species."""

    f_grid: jax.Array  # [N] data frequency grid [Hz]
    coeffs: jax.Array  # [N, 4] (P00, P10, P01, P20)
    spec_idx: int = dataclasses.field(metadata=dict(static=True), default=0)

    def xsec(self, f_grid, T, P):
        """Cross section [m^2] on f_grid (0 outside the band)."""
        c = self.coeffs
        x = c[:, 0] + c[:, 1] * T + c[:, 2] * P + c[:, 3] * T * T
        x = jnp.maximum(x, 0.0)
        g = self.f_grid
        i1 = jnp.clip(jnp.searchsorted(g, f_grid), 1, g.shape[0] - 1)
        i0 = i1 - 1
        w = (f_grid - g[i0]) / (g[i1] - g[i0])
        out = (1.0 - w) * x[i0] + w * x[i1]
        inside = (f_grid >= g[0]) & (f_grid <= g[-1])
        return jnp.where(inside, out, 0.0)

    def absorption(self, f_grid, T, P, vmr):
        """alpha [1/m] = xsec * n_species."""
        n = P / (const.k * T) * vmr[self.spec_idx]
        return self.xsec(f_grid, T, P) * n


def xsec_fit_absorption(datasets, f_grid, T, P, vmr):
    alpha = jnp.zeros_like(f_grid)
    for ds in datasets:
        alpha = alpha + ds.absorption(f_grid, T, P, vmr)
    return alpha
