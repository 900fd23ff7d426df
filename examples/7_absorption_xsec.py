"""Absorption cross sections: lines, CIA, and the single-species recipe.

Mirrors /root/reference/examples/5-absorption/ — 1-arts-catalogue-data/
1-line-strength.py (line strength vs temperature), 2-absorption-cross-
sections/{1-lines.py, 2-cia.py, 3-single-species-recipe.py}.
"""

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.cia import CIADataset, cia_absorption
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.voigt import absorption
from arts_tpu.recipe import SingleSpeciesAbsorption


def water_line_catalog():
    """The H2O 183 GHz line with self + air broadening."""
    lines = [
        dict(
            f0=183.31e9, a=0.1009, e0=2.7e-21, gu=7.0, gl=5.0,
            iso_mass=18.0, iso_ratio=1.0, spec_idx=0, iso_idx=0, band_idx=0,
            t0=296.0, cutoff=np.inf,
            ls={
                0: {"G0": (Law.T1, [13.5e4, 0.85])},
                "bath": {"G0": (Law.T1, [2.7e4, 0.74])},
            },
        )
    ]
    return build_catalog(lines)


def main():
    cat = water_line_catalog()
    pf = rigid_rotor_table(1, 179.6, 1.5)
    f = jnp.asarray(np.linspace(150e9, 220e9, 281))
    vmr = jnp.asarray([0.01])

    # 1. cross sections vs pressure: Lorentz width scales with P,
    #    peak absorption per molecule drops
    for P in (1e5, 1e4, 1e3):
        a = np.asarray(absorption(f, cat, pf, 270.0, P, vmr))
        print(f"P={P:8.0f} Pa  peak {a.max():.3e} 1/m")
        assert np.isfinite(a).all() and a.max() > 0

    # 2. line strength vs temperature (Boltzmann + stimulated emission):
    #    integrated absorption is monotone for this low-E0 line
    ints = []
    for T in (220.0, 260.0, 300.0):
        a = np.asarray(absorption(f, cat, pf, T, 1e4, vmr))
        ints.append(np.trapezoid(a, np.asarray(f)))
    print("integrated absorption vs T:", [f"{x:.3e}" for x in ints])
    assert ints[0] > ints[-1]  # number density at fixed P falls with T

    # 3. CIA: synthetic N2-N2 table, alpha ~ (n vmr)^2
    fg = jnp.asarray(np.linspace(0.0, 1e12, 32))
    tg = jnp.asarray([200.0, 300.0])
    table = 1e-60 * (fg / 1e12)[None, :] * jnp.asarray([1.0, 0.8])[:, None]
    ds = CIADataset(f_grid=fg, t_grid=tg, xsec=table, spec1=0, spec2=0)
    a1 = np.asarray(cia_absorption([ds], f, 250.0, 1e5, jnp.asarray([0.78])))
    a2 = np.asarray(cia_absorption([ds], f, 250.0, 1e5, jnp.asarray([0.39])))
    np.testing.assert_allclose(a1, 4 * a2, rtol=1e-12)
    print("CIA quadratic density scaling OK; peak", a1.max())

    # 4. the SingleSpeciesAbsorption recipe (reference recipe parity)
    recipe = SingleSpeciesAbsorption(cat=cat, pf=pf)
    a = np.asarray(recipe(f, 250.0, 5e4, [0.005]))
    assert np.isfinite(a).all() and a.max() > 0
    print("recipe peak:", a.max())
    return a


if __name__ == "__main__":
    main()
