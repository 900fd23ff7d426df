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
