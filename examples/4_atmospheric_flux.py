"""Atmospheric up/down flux profiles (AtmosphericFlux recipe parity)."""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from arts_tpu.atm.standard import standard_atmosphere
from arts_tpu.fwd_allsky import AllskyScene
from arts_tpu.recipe import AtmosphericFlux


def main():
    atm = standard_atmosphere(n_levels=41, z_top=40e3, species=("N2", "O2", "H2O"))
    scene = AllskyScene(
        atm=atm, cat=None, pf=None, scatterers=(),
        surface_temperature=jnp.asarray(288.15),
        predef=("N2-SelfContStandardType", "O2-PWR98", "H2O-PWR98"),
        species_names=("N2", "O2", "H2O"),
    )
    f = jnp.asarray(np.linspace(20e9, 200e9, 61))
    out = AtmosphericFlux(scene=scene, nquad=8)(f)
    up, down = np.asarray(out["up"]), np.asarray(out["down"])
    print("surface up-flux:", up[-1], "W/m2 (band)")
    print("TOA net:", up[0] - down[0])
    assert up[-1] > 0 and np.all(np.isfinite(down))
    return out


if __name__ == "__main__":
    main()
