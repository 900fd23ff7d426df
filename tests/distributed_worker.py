"""Worker for the 2-process jax.distributed CPU test (test_sharding.py).

Run as: python distributed_worker.py <coordinator> <num_procs> <pid> <outdir>

Each process exposes 4 virtual CPU devices; the pair forms a DCN x local
hybrid mesh via parallel.mesh.make_hybrid_mesh — exercising
jax.distributed bring-up + mesh_utils.create_hybrid_device_mesh (the code
real multi-host TPU hits first) with a cross-process psum reduction.
"""

import os
import sys


def main():
    coordinator, num_procs, pid, outdir = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # load parallel/mesh.py directly by path: importing the arts_tpu
    # package initialises the XLA backend (scene registrations), which
    # must not happen before jax.distributed.initialize
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mesh_mod", os.path.join(root, "arts_tpu", "parallel", "mesh.py")
    )
    mesh_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mesh_mod)
    initialize_distributed = mesh_mod.initialize_distributed
    make_hybrid_mesh = mesh_mod.make_hybrid_mesh

    assert initialize_distributed(coordinator, int(num_procs), int(pid))
    assert jax.process_count() == int(num_procs)
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_hybrid_mesh(n_obs=int(num_procs), n_freq=4)
    assert mesh.devices.shape == (int(num_procs), 4)

    # deterministic global data: J [m, n], w [m], dy [m] sharded over the
    # combined (obs x freq) extent; the normal-equation contraction
    # H = J^T diag(w) J needs a global psum across processes
    m, n = 32, 5
    rng = np.random.default_rng(7)
    J_h = rng.normal(size=(m, n))
    dy_h = rng.normal(size=(m,))
    w_h = 1.0 / rng.uniform(0.5, 2.0, m)

    sh2 = NamedSharding(mesh, P(("obs", "freq"), None))
    sh1 = NamedSharding(mesh, P(("obs", "freq")))
    J = jax.make_array_from_callback(
        (m, n), sh2, lambda idx: J_h[idx]
    )
    dy = jax.make_array_from_callback((m,), sh1, lambda idx: dy_h[idx])
    w = jax.make_array_from_callback((m,), sh1, lambda idx: w_h[idx])

    @jax.jit
    def normal_eq(J, dy, w):
        H = (J * w[:, None]).T @ J
        g = (J * w[:, None]).T @ dy
        return H, g

    with mesh:
        H, g = normal_eq(J, dy, w)
    # H/g are replicated outputs (contraction over the sharded axis with
    # an XLA-inserted cross-process psum); fetch the addressable shard
    H_l = np.asarray(H.addressable_data(0))
    g_l = np.asarray(g.addressable_data(0))

    H_ref = (J_h * w_h[:, None]).T @ J_h
    g_ref = (J_h * w_h[:, None]).T @ dy_h
    np.testing.assert_allclose(H_l, H_ref, rtol=1e-5)
    np.testing.assert_allclose(g_l, g_ref, rtol=1e-5)
    if int(pid) == 0:
        with open(os.path.join(outdir, "ok"), "w") as fh:
            fh.write("ok")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
