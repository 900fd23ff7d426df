"""High-level recipe operators.

Parity reference: python/src/pyarts3/recipe/ — `AtmosphericFlux`
(AtmosphericFlux.py:21: spectral + profile up/down flux from a 1D
atmosphere via DISORT), `SpectralAtmosphericFlux`, and
`SingleSpeciesAbsorption`.  Each reference recipe wraps a workspace; here
each is a thin frozen-config callable over the pure operators.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fwd_allsky import AllskyScene, simulate_allsky
from .lbl.voigt import absorption


@dataclasses.dataclass(frozen=True)
class AtmosphericFlux:
    """Upwelling/downwelling flux profiles for a scene.

    Parity: pyarts3.recipe.AtmosphericFlux — returns per-level up/down
    (diffuse + direct) fluxes, here both spectral and band-integrated.
    """

    scene: AllskyScene
    nquad: int = 16
    mu0: float = 0.0
    fbeam: float = 0.0

    def __call__(self, f_grid):
        out = simulate_allsky(
            self.scene,
            jnp.asarray(f_grid),
            nquad=self.nquad,
            nfourier=1,
            mu0=self.mu0,
            fbeam=self.fbeam,
        )
        up = out.flux_up  # [F, L+1]
        down = out.flux_down_diffuse + out.flux_direct
        return dict(
            spectral_up=up,
            spectral_down=down,
            up=jnp.trapezoid(up, jnp.asarray(f_grid), axis=0),
            down=jnp.trapezoid(down, jnp.asarray(f_grid), axis=0),
            altitude=self.scene.atm.z[::-1],
        )


@dataclasses.dataclass(frozen=True)
class SingleSpeciesAbsorption:
    """Absorption coefficient of one species on demand.

    Parity: pyarts3.recipe.SingleSpeciesAbsorption.
    """

    cat: object
    pf: object

    def __call__(self, f_grid, t, p, vmr):
        return absorption(
            jnp.asarray(f_grid), self.cat, self.pf, t, p, jnp.asarray(vmr)
        )
