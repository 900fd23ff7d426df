"""Non-LTE radiance: fit level populations against the radiation field,
then simulate TOA radiance with the NLTE source (reference workflow:
tests/core/nlte/nlte-fit.py + spectral-radiance-nlte-vs-lte.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import arts_tpu.constants as const
from arts_tpu.atm import Atmosphere1D
from arts_tpu.fwd import ClearskyScene, simulate_clearsky
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.nlte import NlteField, boltzmann_ratios, nlte_fit_profile
from arts_tpu.lbl.tmodel import Law


def main():
    # --- a CO-like two-level rotational band in a cooling atmosphere -------
    f0 = 115.27e9
    line = dict(
        f0=f0, a=7.2e-8, e0=0.0, gu=3.0, gl=1.0, iso_mass=28.0, iso_ratio=1.0,
        spec_idx=0, iso_idx=0, band_idx=0, t0=296.0, cutoff=1e30,
        ls={"bath": {"G0": (Law.T1, [2.4e4, 0.75])}},
    )
    cat = build_catalog([line])
    nz = 16
    z = jnp.linspace(0.0, 60e3, nz)
    t = 270.0 - 55.0 * z / 60e3
    p = 1e5 * jnp.exp(-z / 8e3)
    vmr = jnp.full((1, nz), 1e-6)
    atm = Atmosphere1D(z=z, t=t, p=p, vmr=vmr)

    E = jnp.asarray([0.0, const.h * f0])
    g = jnp.asarray([1.0, 3.0])
    Q = jnp.sum(g * jnp.exp(-E / (const.k * t[..., None])), -1)
    r_lte = boltzmann_ratios(t, g, E, Q)

    # --- statistical-equilibrium fit: weak collisions high up -> departure --
    f_fit = jnp.linspace(f0 - 8e9, f0 + 8e9, 256)
    hf_kt = const.h * f0 / (const.k * t)
    c_scale = (p / p[0])[:, None]  # collisions ~ density
    # collision rates comparable to A (7.2e-8 1/s) at the surface, so the
    # upper atmosphere is radiation-dominated and departs from LTE
    Cul = 3e-7 * c_scale
    Clu = Cul * (g[1] / g[0]) * jnp.exp(-hf_kt)[:, None]
    r_fit, n_iter, change = nlte_fit_profile(
        f_fit, z, t, p, vmr.T, cat, 2, jnp.asarray([1]), jnp.asarray([0]),
        Cul, Clu, r_sum=jnp.sum(r_lte, -1), r_init=r_lte,
        surf_t=jnp.asarray(270.0), convergence_limit=1e-8,
    )
    print(f"SE fit: {n_iter} iterations, max change {change:.2e}")
    dep = np.asarray(r_fit[:, 1] / r_lte[:, 1])
    print(f"upper-level departure coefficient at TOA: {dep[-1]:.4f}")

    # --- TOA radiance: LTE vs NLTE populations ------------------------------
    nlte = NlteField(z=z, r=r_fit, cat=cat,
                     up_idx=jnp.asarray([1]), lo_idx=jnp.asarray([0]))
    f_grid = jnp.linspace(f0 - 5e7, f0 + 5e7, 101)
    alt = z[::-1]
    dr = -jnp.diff(alt)
    scene_n = ClearskyScene(atm=atm, cat=None, pf=None, nlte=nlte,
                            surface_temperature=jnp.asarray(270.0))
    nlte_l = NlteField(z=z, r=r_lte, cat=cat,
                       up_idx=jnp.asarray([1]), lo_idx=jnp.asarray([0]))
    scene_l = ClearskyScene(atm=atm, cat=None, pf=None, nlte=nlte_l,
                            surface_temperature=jnp.asarray(270.0))
    I_n = simulate_clearsky(scene_n, f_grid, alt, dr, background="surface")
    I_l = simulate_clearsky(scene_l, f_grid, alt, dr, background="surface")
    dI = float(jnp.max(jnp.abs(I_n - I_l)) / jnp.max(I_l))
    print(f"max NLTE-LTE radiance difference: {dI:.3e} (relative)")
    assert np.all(np.isfinite(np.asarray(I_n)))



if __name__ == "__main__":
    main()
