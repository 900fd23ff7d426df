"""Device-mesh helpers: the distributed backbone of the framework.

Parity reference: the reference's concurrency surfaces (SURVEY.md 2.7) —
OpenMP over frequency chunks (m_lbl.cc:256-293), sensor geometries
(m_rad.cc:406) and DISORT frequencies (m_disort.cc:37-47), plus optional
MPI-distributed retrieval algebra (oem_mpi.h).  TPU-native replacement:
a 2D ("obs", "freq") jax.sharding.Mesh; frequency chunks and observation
geometries are sharded array axes, collectives ride ICI via XLA (psum for
measurement/normal-equation reductions), no NCCL/MPI.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_obs: int | None = None, n_freq: int | None = None, devices=None):
    """Build an ("obs", "freq") mesh over the available devices.

    Default splits: all devices on "freq" (the embarrassingly parallel axis
    in the reference); pass n_obs to fold geometries across hosts.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_obs is None and n_freq is None:
        n_obs, n_freq = 1, n
    elif n_obs is None:
        n_obs = n // n_freq
    elif n_freq is None:
        n_freq = n // n_obs
    assert n_obs * n_freq == n, f"mesh {n_obs}x{n_freq} != {n} devices"
    return Mesh(devices.reshape(n_obs, n_freq), ("obs", "freq"))


def shard_spec(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """NamedSharding for the given logical axes (None = replicated axis)."""
    return NamedSharding(mesh, P(*axes))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bring-up: the framework's replacement for the reference's
    optional MPI layer (src/oem_mpi.h:24-38, 3rdparty/invlib/src/invlib/mpi
    — OFF by default there; first-class here).

    Calls jax.distributed.initialize.  With no arguments it reads the
    standard coordination env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a managed-cluster
    auto-detection) and is a no-op returning False in a plain
    single-process run — safe to call unconditionally at program start.
    Returns True when a multi-process runtime was brought up.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid else None
    if coordinator_address is None and num_processes is None:
        return False  # plain single-process run
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
    return True


def make_hybrid_mesh(
    n_obs: int | None = None, n_freq: int | None = None
) -> Mesh:
    """("obs", "freq") mesh spanning hosts x local devices.

    Multi-process (after initialize_distributed): "obs" strides across
    hosts — observation geometries are independent, so the only DCN
    traffic is the final measurement gather — while "freq" packs each
    host's local chips so the per-spectrum reductions and the OEM
    normal-equation psums ride ICI (SURVEY.md 2.7's MPI->collectives
    mapping).  Explicit n_obs/n_freq override the host/local split
    (n_obs must then be a multiple of the process count).
    Single-process: delegates to make_mesh over the local devices.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(n_obs=n_obs, n_freq=n_freq)
    from jax.experimental import mesh_utils

    n_local = jax.local_device_count()
    if n_obs is None:
        n_obs = n_proc
    if n_freq is None:
        n_freq = (n_proc * n_local) // n_obs
    assert n_obs % n_proc == 0 or n_proc % n_obs == 0, (
        f"obs axis {n_obs} must align with {n_proc} hosts"
    )
    # granule = ICI slice when the platform reports slice indices (real
    # multi-host TPU); otherwise fall back to process granules (CPU
    # multi-process runs, where devices carry no slice_index — found by
    # tests/test_sharding.py::test_two_process_distributed)
    has_slices = (
        len({getattr(d, "slice_index", None) for d in jax.devices()}) > 1
    )
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(max(1, n_obs // n_proc), n_freq),
        dcn_mesh_shape=(min(n_obs, n_proc), 1),
        process_is_granule=not has_slices,
    )
    return Mesh(devices.reshape(n_obs, n_freq), ("obs", "freq"))
