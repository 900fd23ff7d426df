"""Collision-induced absorption (CIA).

Parity reference: /root/reference/src/core/absorption/cia.h — `CIARecord`:
per species pair, a set of GriddedField2 datasets (T x f binary absorption
cross sections [m^5]) interpolated in frequency and temperature with
extrapolation controls; absorption = sum over datasets of
xsec(f, T) * n1 * n2 (number densities of the two species),
m_cia.cc propmatAddCIA.

TPU-native: each dataset is a dense [T, F] table; evaluation is one
bilinear gather, batched over frequency; datasets vmap/stack.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as const


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CIADataset:
    """One CIA table for a species pair."""

    f_grid: jax.Array  # [F0]
    t_grid: jax.Array  # [T0]
    xsec: jax.Array  # [T0, F0] binary cross section [m^5]
    spec1: int = dataclasses.field(metadata=dict(static=True), default=0)
    spec2: int = dataclasses.field(metadata=dict(static=True), default=0)

    def absorption(self, f_grid, T, P, vmr):
        """alpha [1/m] at one atmospheric point (f outside the table -> 0)."""

        def locate(grid, x):
            i1 = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
            i0 = i1 - 1
            w = (x - grid[i0]) / (grid[i1] - grid[i0])
            return i0, i1, w

        ti0, ti1, tw = locate(self.t_grid, T)
        tw = jnp.clip(tw, 0.0, 1.0)  # clamp T extrapolation
        fi0, fi1, fw = locate(self.f_grid, f_grid)
        row = (1.0 - tw) * self.xsec[ti0] + tw * self.xsec[ti1]  # [F0]
        x = (1.0 - fw) * row[fi0] + fw * row[fi1]
        inside = (f_grid >= self.f_grid[0]) & (f_grid <= self.f_grid[-1])
        x = jnp.where(inside, x, 0.0)
        n = P / (const.k * T)
        return x * (n * vmr[self.spec1]) * (n * vmr[self.spec2])


def cia_absorption(datasets, f_grid, T, P, vmr):
    alpha = jnp.zeros_like(f_grid)
    for ds in datasets:
        alpha = alpha + ds.absorption(f_grid, T, P, vmr)
    return alpha
