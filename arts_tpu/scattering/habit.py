"""Particle habits and bulk scattering properties (TRO representation).

Parity reference: /root/reference/src/core/scattering/ —
`ParticleHabit` (collection of per-size single-scattering data,
particle_habit.h:119), `ScatteringHabit` (habit + PSD, scattering_habit.h:18),
and `get_bulk_scattering_properties_tro_spectral`
(bulk_scattering_properties.cc): PSD-weighted size integration of
extinction/scattering cross-sections and spectral (Legendre) phase
coefficients for totally-random-orientation particles.

TPU-native: the habit is a dense pytree of arrays on (size, freq, temp)
grids; bulk integration is one differentiable contraction, batched over
(freq, atmospheric point).  SH analysis of gridded legacy data happens at
ingestion (host side, scipy), as the ARTS data is static.
"""

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleHabit:
    """Single-scattering data per particle size (TRO, spectral form).

    sizes: [S] volume-equivalent diameters [m]
    f_grid: [F] frequencies of the data
    t_grid: [T] temperatures of the data
    ext: [S, F, T] extinction cross-section [m^2]
    sca: [S, F, T] scattering cross-section [m^2]
    leg: [S, F, T, NLeg] normalized phase-function Legendre coefficients
         (leg[..., 0] = 1)
    a, b: mass-size relation m = a D^b
    """

    sizes: jax.Array
    f_grid: jax.Array
    t_grid: jax.Array
    ext: jax.Array
    sca: jax.Array
    leg: jax.Array
    a: jax.Array
    b: jax.Array

    def interp(self, f, t):
        """Linear interp of ext/sca/leg to scalar (f, t): [S], [S], [S, NLeg]."""

        def locate(grid, x):
            i1 = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
            i0 = i1 - 1
            wgt = jnp.clip((x - grid[i0]) / (grid[i1] - grid[i0]), 0.0, 1.0)
            return i0, i1, wgt

        fi0, fi1, fw = locate(self.f_grid, f)
        ti0, ti1, tw = locate(self.t_grid, t)

        def bil(arr):
            a00 = arr[:, fi0, ti0]
            a01 = arr[:, fi0, ti1]
            a10 = arr[:, fi1, ti0]
            a11 = arr[:, fi1, ti1]
            return (
                (1 - fw) * ((1 - tw) * a00 + tw * a01)
                + fw * ((1 - tw) * a10 + tw * a11)
            )

        return bil(self.ext), bil(self.sca), bil(self.leg)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatteringHabit:
    """Habit + PSD: bulk properties at an atmospheric point.

    Parity: scattering_habit.h:18 + bulk_scattering_properties.cc (TRO
    spectral pipeline, trapezoidal size integration).
    """

    habit: ParticleHabit
    psd: object  # MGDSingleMoment | BinnedPSD

    def bulk_properties(self, f, water_content, t, nleg: int):
        """(k_ext, k_sca, leg[nleg]) at one point and frequency.

        leg is scattering-coefficient weighted (sum over sizes of
        psd * sca * leg_normalized), NOT normalized by k_sca; k's in [1/m].
        """
        ext_s, sca_s, leg_s = self.habit.interp(f, t)  # [S], [S], [S, NL]
        pnd = self.psd.evaluate(
            water_content, t, self.habit.sizes, self.habit.a, self.habit.b
        )  # [S] number density per size [1/m^4]
        # trapezoidal integration over the size grid
        d = self.habit.sizes
        wtrap = jnp.concatenate(
            [
                (d[1:2] - d[0:1]) / 2,
                (d[2:] - d[:-2]) / 2,
                (d[-1:] - d[-2:-1]) / 2,
            ]
        )
        k_ext = jnp.sum(wtrap * pnd * ext_s)
        k_sca = jnp.sum(wtrap * pnd * sca_s)
        nl = min(nleg, leg_s.shape[-1])
        leg = jnp.zeros((nleg,)).at[:nl].set(
            jnp.sum((wtrap * pnd * sca_s)[:, None] * leg_s[:, :nl], axis=0)
        )
        return k_ext, k_sca, leg
