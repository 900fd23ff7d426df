"""All-sky DISORT brightness temperatures with a rain cloud.

Mirror of examples/3-allsky-radiative-transfer/1-disort using the
reference's own example data when present (reproduces the ARTS 2.6
goldens; see tests/test_reference_parity.py), else a synthetic cloud.
"""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import os

import numpy as np

import jax.numpy as jnp

from arts_tpu.fwd_allsky import AllskyScene, simulate_allsky
from arts_tpu.ops.planck import inv_planck
from arts_tpu.scattering import HenyeyGreenstein

REF = "/root/reference/examples/3-allsky-radiative-transfer/1-disort"


def main():
    if os.path.isdir(REF):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_reference_parity import F_GRID, scene, toa_nadir_bt

        bt_clear = toa_nadir_bt(
            simulate_allsky(scene(0.0), F_GRID, nquad=40, nleg=40, nfourier=1)
        )
        bt_cloudy = toa_nadir_bt(
            simulate_allsky(scene(1.0), F_GRID, nquad=40, nleg=40, nfourier=1)
        )
        print("clear :", bt_clear, "(ARTS 2.6: 298.57 283.36 251.64)")
        print("cloudy:", bt_cloudy, "(ARTS 2.6: 271.69 272.60 251.64)")
        return bt_clear, bt_cloudy
    else:
        from arts_tpu.atm.standard import standard_atmosphere

        atm = standard_atmosphere(n_levels=49, z_top=12e3, species=("N2", "O2", "H2O"))
        cloud = HenyeyGreenstein(
            ext=jnp.where((atm.z > 1e3) & (atm.z < 4e3), 1e-3, 0.0),
            ssa=jnp.full(atm.z.shape, 0.9),
            g=jnp.full(atm.z.shape, 0.7),
        )
        sky = AllskyScene(
            atm=atm, cat=None, pf=None, scatterers=(cloud,),
            surface_temperature=jnp.asarray(288.15),
            predef=("N2-SelfContStandardType", "O2-PWR98", "H2O-PWR98"),
            species_names=("N2", "O2", "H2O"),
        )
        f = jnp.asarray([31.5e9, 165e9])
        out = simulate_allsky(sky, f, nquad=16, nfourier=1)
        bt = np.asarray(inv_planck(out.u0[:, 0, -1], f))
        print("synthetic cloudy TB:", bt)
        return bt


if __name__ == "__main__":
    main()
