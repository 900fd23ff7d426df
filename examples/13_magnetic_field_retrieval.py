"""Retrieve a magnetic-field profile scale from polarized Zeeman spectra.

The reference's flagship Zeeman correctness artifact is dI/dB
(tests/core/zeeman/spectral_radiance_jacobian_magnetic_field*.py); this
example closes the loop as a retrieval: a Gauss-Newton OEM recovers a
perturbed B-field scale (and the surface temperature) from Stokes I+V
spectra of the O2 118.75 GHz line, with the Jacobian by autodiff through
the polarized forward operator — no hand-written dnorm_view_du/dv/dw
chain.
"""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import dataclasses

import numpy as np

import jax.numpy as jnp

from arts_tpu.atm import Atmosphere1D
from arts_tpu.atm.field import hydrostatic_pressure
from arts_tpu.atm.igrf import magnetic_profile
from arts_tpu.fwd import ZeemanScene, simulate_clearsky_polarized
from arts_tpu.lbl.catalog import build_catalog
from arts_tpu.lbl.partfun import rigid_rotor_table
from arts_tpu.lbl.tmodel import Law
from arts_tpu.lbl.zeeman import expand_zeeman
from arts_tpu.retrieval.oem import oem


def main():
    # mesospheric scene: the regime where the ~0.4 MHz Zeeman splitting
    # rivals the Doppler + pressure widths and dI/dB is visible
    z = jnp.linspace(50e3, 100e3, 11)
    t = 260.0 - 1.0e-3 * (z - 50e3)
    p = hydrostatic_pressure(z, t, 80.0)
    mag = jnp.asarray(magnetic_profile(np.asarray(z), lat_deg=60.0))
    atm = Atmosphere1D(z=z, t=t, p=p, vmr=jnp.full((1, 11), 0.2095),
                       mag=mag)
    lines = [dict(
        f0=118.7503e9, a=3e-9, e0=0.0, gu=5.0, gl=3.0, iso_mass=32.0,
        iso_ratio=0.995, spec_idx=0, iso_idx=0, band_idx=0, t0=296.0,
        cutoff=np.inf, ls={"bath": {"G0": (Law.T1, [22000.0, 0.8])}},
    )]
    cat = build_catalog(lines)
    zcat = expand_zeeman(cat, ju=[1.0], jl=[1.0], gu_z=[-2.8],
                         gl_z=[-2.77])
    pf = rigid_rotor_table(1, 43.1, 1.0)
    scene = ZeemanScene(atm=atm, zcat=zcat, pf=pf)

    f = jnp.linspace(118.7503e9 - 4e6, 118.7503e9 + 4e6, 61)
    alt = atm.z
    dr = jnp.diff(atm.z)
    za = jnp.full_like(alt, 45.0)

    def forward(x):
        # state: [log B-scale, T-profile offset] — B enters every level
        # through the profile scale, exactly the reference's RetrievalAdd
        # magnetic-field target in log space
        sc = dataclasses.replace(
            scene,
            atm=dataclasses.replace(
                atm, mag=atm.mag * jnp.exp(x[0]), t=atm.t + x[1]
            ),
        )
        I = simulate_clearsky_polarized(sc, f, alt, za, dr,
                                        background="space")
        return jnp.concatenate([I[:, 0], I[:, 3]])  # Stokes I + V

    truth = jnp.asarray([np.log(1.3), 2.0])
    y_obs = forward(truth)
    res = oem(
        forward,
        x_a=jnp.asarray([0.0, 0.0]),
        y_obs=y_obs,
        S_a=jnp.asarray([1.0, 25.0]),
        S_e=jnp.full(y_obs.shape,
                     (1e-4 * float(jnp.abs(y_obs).max())) ** 2),
        method="gn",
        max_iter=15,
    )
    b_scale = float(jnp.exp(res.x[0]))
    print(f"converged={res.converged} after {res.n_iter} iterations")
    print(f"retrieved B scale: {b_scale:.4f} (truth 1.3000)")
    print(f"retrieved dT_atm: {float(res.x[1]):.3f} K (truth 2.000)")
    assert res.converged
    assert abs(b_scale - 1.3) < 0.013  # the reference's 1% OEM gate
    assert abs(float(res.x[1]) - 2.0) < 0.1
    return res


if __name__ == "__main__":
    main()
