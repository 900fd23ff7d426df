"""Distributed-execution tests on the 8-device CPU mesh: sharded results
must equal single-device results bit-for-bit-ish (the shard-vs-single-chip
equality strategy SURVEY.md section 4 calls for — something the reference
never had), and the OEM normal-equation contraction must ride the mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from arts_tpu.fwd import simulate_clearsky
from arts_tpu.fwd_allsky import simulate_allsky
from arts_tpu.parallel import make_mesh
from arts_tpu.retrieval import oem
from tests.test_allsky import allsky_scene
from tests.test_clearsky import SCENE, toa_nadir_path
from tests.test_oem import SENSOR, measurement, vmr_targets
from arts_tpu.retrieval import StateMapping


def test_freq_sharded_clearsky_equals_single():
    mesh = make_mesh(n_obs=1, n_freq=8)
    p = toa_nadir_path()
    alt, dr = jnp.asarray(p.alt), jnp.asarray(p.dr)
    f = jnp.linspace(170e9, 240e9, 64)
    I_single = simulate_clearsky(SCENE, f, alt, dr, background="surface")
    f_sh = jax.device_put(f, NamedSharding(mesh, P("freq")))
    with mesh:
        I_sh = simulate_clearsky(SCENE, f_sh, alt, dr, background="surface")
    np.testing.assert_allclose(
        np.asarray(I_sh), np.asarray(I_single), rtol=1e-12
    )


def test_freq_sharded_disort_equals_single():
    mesh = make_mesh(n_obs=1, n_freq=8)
    scene = allsky_scene()
    f = jnp.linspace(170e9, 240e9, 16)
    out1 = simulate_allsky(scene, f, nquad=8)
    f_sh = jax.device_put(f, NamedSharding(mesh, P("freq")))
    with mesh:
        out2 = simulate_allsky(scene, f_sh, nquad=8)
    np.testing.assert_allclose(
        np.asarray(out2.flux_up), np.asarray(out1.flux_up), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out2.u0), np.asarray(out1.u0), rtol=1e-9,
        atol=1e-10 * float(jnp.abs(out1.u0).max()),
    )


def test_sharded_oem_normal_equations():
    """J^T Se^-1 J and the GN step with the measurement axis sharded over
    the mesh equal the replicated computation (the XLA-collective analogue
    of invlib's MPI row distribution, oem_mpi.h)."""
    mesh = make_mesh(n_obs=1, n_freq=8)
    rng = np.random.default_rng(0)
    m, n = 64, 7
    J = jnp.asarray(rng.normal(size=(m, n)))
    dy = jnp.asarray(rng.normal(size=(m,)))
    se_inv_diag = jnp.asarray(1.0 / rng.uniform(0.5, 2.0, m))

    def normal_eq(J, dy, w):
        H = (J * w[:, None]).T @ J
        g = (J * w[:, None]).T @ dy
        return H, g

    H0, g0 = jax.jit(normal_eq)(J, dy, se_inv_diag)
    sh = NamedSharding(mesh, P("freq"))
    with mesh:
        H1, g1 = jax.jit(normal_eq)(
            jax.device_put(J, NamedSharding(mesh, P("freq", None))),
            jax.device_put(dy, sh),
            jax.device_put(se_inv_diag, sh),
        )
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-12)
