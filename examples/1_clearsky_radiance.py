"""Clear-sky upwelling microwave radiance at TOA.

Mirror of the reference's examples/2-clearsky-radiative-transfer/
1-simple-outgoing-radiance, fully offline: US-Standard-like atmosphere +
the PWR98/standard predefined gas models.
"""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax
import jax.numpy as jnp

from arts_tpu.atm.standard import standard_atmosphere
from arts_tpu.fwd import ClearskyScene, simulate_clearsky_bt
from arts_tpu.path import geometric_path_1d


def main():
    atm = standard_atmosphere(n_levels=81, z_top=80e3, species=("N2", "O2", "H2O"))
    scene = ClearskyScene(
        atm=atm,
        cat=None,
        pf=None,
        surface_temperature=jnp.asarray(288.15),
        predef=("N2-SelfContStandardType", "O2-PWR98", "H2O-PWR98"),
        species_names=("N2", "O2", "H2O"),
    )
    f_grid = jnp.asarray(np.linspace(10e9, 200e9, 381))
    path = geometric_path_1d(850e3, 180.0, 0.0, 80e3, 1000.0)
    bt = simulate_clearsky_bt(
        scene, f_grid, jnp.asarray(path.alt), jnp.asarray(path.dr),
        background="surface",
    )
    bt = np.asarray(bt)
    print("TB @ 23.8/50.3/89/183 GHz:",
          [round(float(np.interp(f, np.asarray(f_grid), bt)), 2)
           for f in (23.8e9, 50.3e9, 89e9, 183.31e9)])
    assert np.all((bt > 2.0) & (bt < 320.0))
    return np.asarray(f_grid), bt


if __name__ == "__main__":
    main()
