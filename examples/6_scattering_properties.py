"""Particle size distributions and bulk scattering properties.

Mirrors /root/reference/examples/4-scattering-properties/
1-particle-size-distributions/1-psds.py (named MGD single-moment configs
evaluated over a mass-density sweep) and
2-scattering-calculations/1-scattering_species.sht.py (habit + PSD ->
bulk extinction / scattering / phase-function expansion).
"""

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from arts_tpu.scattering import HenyeyGreenstein
from arts_tpu.scattering.habit import ParticleHabit, ScatteringHabit
from arts_tpu.scattering.psd import MGDSingleMoment


def synthetic_drop_habit(n_sizes=24, n_f=6, n_t=4):
    """A smooth Mie-like droplet habit table (ext ~ geometric x Q(x))."""
    d = jnp.asarray(np.geomspace(20e-6, 2e-3, n_sizes))
    f = jnp.asarray(np.linspace(80e9, 400e9, n_f))
    t = jnp.asarray(np.linspace(190.0, 280.0, n_t))
    x = 2 * jnp.pi * d[:, None, None] * f[None, :, None] / 3e8  # size param
    geo = jnp.pi * (d / 2) ** 2
    qext = 2.0 - 2.0 * jnp.sinc(x / jnp.pi) * 0.5
    ext = geo[:, None, None] * qext * jnp.ones_like(t)[None, None, :]
    ssa = 0.4 + 0.5 * (1 - jnp.exp(-x))
    sca = ext * ssa
    g = 0.8 * (1 - jnp.exp(-x / 2))
    nleg = 8
    ks = jnp.arange(nleg)
    leg = (2 * ks + 1) * g[..., None] ** ks  # HG-style moments
    a, b = np.pi / 6 * 1000.0, 3.0  # liquid spheres
    return ParticleHabit(
        sizes=d, f_grid=f, t_grid=t, ext=ext, sca=sca, leg=leg,
        a=jnp.asarray(a), b=jnp.asarray(b),
    )


def main():
    # 1. named single-moment MGD configs over a water-content sweep.
    #    Abel12/Wang16 are rain PSDs: mass-size = liquid spheres.
    sizes = jnp.asarray(np.geomspace(1e-6, 2e-2, 400))
    wcs = jnp.asarray([1e-5, 1e-4, 1e-3])  # kg/m^3
    a_rain, b_rain = np.pi / 6 * 1000.0, 3.0
    for name in ("Abel12", "Wang16"):
        psd = MGDSingleMoment.from_name(name)
        n = jax.vmap(
            lambda w: psd.evaluate(w, 280.0, sizes, a_rain, b_rain)
        )(wcs)
        # mass closure: integral a D^b N(D) dD recovers the water content
        mass = jnp.trapezoid(a_rain * sizes**b_rain * n, sizes, axis=1)
        err = np.abs(np.asarray(mass) / np.asarray(wcs) - 1.0)
        print(f"{name:8s} mass closure err {err.max():.2e}")
        assert err.max() < 0.01, name
    # Field19 (snow aggregates): positive and finite over the sweep
    psd = MGDSingleMoment.from_name("Field19")
    n = jax.vmap(lambda w: psd.evaluate(w, 260.0, sizes, 0.02, 1.9))(wcs)
    assert np.isfinite(np.asarray(n)).all() and float(n.max()) > 0

    # 2. habit + PSD -> bulk properties, differentiable wrt water content
    habit = synthetic_drop_habit()
    sp = ScatteringHabit(habit=habit, psd=MGDSingleMoment.from_name("Wang16"))

    def kext(wc):
        ke, ks_, leg = sp.bulk_properties(183e9, wc, 250.0, nleg=8)
        return ke

    wc0 = 2e-4
    ke = float(kext(wc0))
    dke = float(jax.grad(kext)(wc0))
    print(f"bulk k_ext @183 GHz, wc={wc0}: {ke:.3e} 1/m, d/dwc {dke:.3e}")
    assert ke > 0 and dke > 0

    # 3. analytic Henyey-Greenstein species for comparison
    hg = HenyeyGreenstein(
        ext=jnp.asarray([ke]), ssa=jnp.asarray([0.6]), g=jnp.asarray([0.7])
    )
    ke_hg, ks_hg, leg_hg = hg.bulk_properties(nleg=8)
    np.testing.assert_allclose(np.asarray(leg_hg)[0, 0], ks_hg[0], rtol=1e-12)
    print("HG legendre l=1 moment / k_sca:", float(leg_hg[0, 1] / ks_hg[0]))
    return ke


if __name__ == "__main__":
    main()
