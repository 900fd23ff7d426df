"""Oriented hydrometeors (ARO): polarization from dichroic extinction.

An oblate Rayleigh spheroid layer (vertical symmetry axis) seen at slant
incidence extinguishes H- and V-polarized radiation differently — the
packed propagation matrix gains B (= K12) and W (= K34) components and
an unpolarized background acquires Q (reference: ARO format in
src/core/scattering/single_scattering_data.h:43, rtepack_scattering).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from arts_tpu.ops.planck import planck
from arts_tpu.rtepack.emission import emission_polarized
from arts_tpu.rtepack.propmat import inv as pm_inv, matvec
from arts_tpu.scattering import bulk_aro_properties, rayleigh_spheroid_aro


def main():
    F = jnp.asarray([36.5e9, 89e9, 166e9])  # GMI-like channels

    # oblate raindrop-ish polarizabilities (horizontal stronger)
    ssd = rayleigh_spheroid_aro(F, alpha_h=5e-17 + 8e-19j, alpha_v=2e-17 + 3e-19j)

    for za in (0.0, 52.8, 90.0):
        K, a = bulk_aro_properties([ssd], [2e8], F, 260.0, za)
        print(f"za={za:5.1f}  K11={float(K[0, 0]):.3e}  "
              f"K12={float(K[0, 1]):+.3e}  K34={float(K[0, 6]):+.3e}")

    # pencil beam through a 3-km oriented layer at the GMI Earth-incidence angle
    K, a = bulk_aro_properties([ssd], [2e8], F, 260.0, 52.8)
    npts = 7
    k = jnp.broadcast_to(K, (npts,) + K.shape)
    B = planck(F, 260.0)
    J1 = matvec(pm_inv(K), a * B[:, None])
    J = jnp.broadcast_to(J1, (npts,) + J1.shape)
    r = jnp.full((npts - 1,), 500.0)
    I0 = jnp.zeros(F.shape + (4,)).at[..., 0].set(planck(F, 285.0))
    I = emission_polarized(k, J, r, I0)

    pd = np.asarray(-I[:, 1] / I[:, 0])  # polarization difference fraction
    for i, f in enumerate(np.asarray(F)):
        print(f"{f/1e9:6.1f} GHz: I={float(I[i,0]):.3e}  Q/I={pd[i]:+.4f}")
    assert np.all(np.isfinite(np.asarray(I)))
    assert np.all(np.abs(pd) > 0)



if __name__ == "__main__":
    main()
