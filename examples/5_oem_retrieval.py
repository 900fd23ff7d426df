"""Gauss-Newton water-vapor retrieval from synthetic radiometer channels
(full_optimal_estimation.py parity, offline)."""

# runnable standalone: enforce the framework precision/platform
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from arts_tpu.retrieval import StateMapping, oem

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    from test_oem import SENSOR, measurement, vmr_targets
    from test_clearsky import SCENE

    mapping = StateMapping(targets=[vmr_targets()], ref_scene=SCENE)
    z = np.asarray(SCENE.atm.z)
    truth = 1.0 + 0.2 * np.exp(-0.5 * ((z - 3e3) / 2.5e3) ** 2)
    y_obs = measurement(mapping.to_scene(jnp.asarray(truth)))
    S_e = jnp.eye(y_obs.size) * (1e-4 * float(jnp.abs(y_obs).mean())) ** 2
    d = np.abs(z[:, None] - z[None, :])
    S_a = jnp.asarray(0.3**2 * np.exp(-d / 10e3))

    res = oem(
        lambda x: measurement(mapping.to_scene(x)),
        jnp.ones_like(jnp.asarray(truth)), y_obs, S_a, S_e,
        method="gn", max_iter=8, verbose=True,
    )
    err = np.abs(np.asarray(res.x)[z < 12e3] - truth[z < 12e3]).max()
    print("converged:", res.converged, " max error below 12 km:", err)
    print("averaging-kernel trace (DOF):", float(np.trace(np.asarray(res.averaging_kernel))))
    assert res.converged and err < 0.02
    return res


if __name__ == "__main__":
    main()
