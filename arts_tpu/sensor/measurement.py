"""Measurement-vector pipeline: batched geometries -> sensor contraction.

Parity reference: /root/reference/src/m_rad.cc:469
(`measurement_vecFromSensor`, "HighPerf" kernel): dedup shared
(f_grid, poslos) simulations, run the observer agenda per simulation under
OpenMP, then contract the sparse sensor weights into y and dy/dx.

TPU-native: the deduped simulation batch is a stacked-path vmap of the
clearsky operator (geometries padded to a common length; zero-length
segments are exact no-ops), the contraction is the SensorArray
gather+segment-sum, and dy/dx is autodiff of the whole pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..fwd import simulate_clearsky
from .obsel import SensorArray


def stack_paths(paths):
    """Pad a list of PathGeometry to a common length -> (alt [G, NP],
    dr [G, NP-1], background list). Padding repeats the last point with
    zero-length segments (exact no-ops in the emission recursion)."""
    npmax = max(p.n_points for p in paths)
    alts = np.zeros((len(paths), npmax))
    drs = np.zeros((len(paths), npmax - 1))
    for i, p in enumerate(paths):
        n = p.n_points
        alts[i, :n] = p.alt
        alts[i, n:] = p.alt[-1]
        drs[i, : n - 1] = p.dr
    return jnp.asarray(alts), jnp.asarray(drs), [p.background for p in paths]


def measurement_vector(
    scene, sensor: SensorArray, f_grid, paths, background: str = "surface"
):
    """y [n_elements] for a batch of geometries sharing one f_grid.

    All paths must share the same background type (split the batch
    otherwise, as the reference splits simulations by agenda)."""
    alts, drs, bgs = stack_paths(paths)
    assert all(b == bgs[0] for b in bgs), "mixed backgrounds: split the batch"
    sim = jax.vmap(
        lambda a, d: simulate_clearsky(
            scene, f_grid, a, d, background=background
        )
    )
    I = sim(alts, drs)  # [G, F]
    return sensor.apply(I)


def measurement_jacobian(scene, sensor, f_grid, paths, mapping, background="surface"):
    """(y, K) with K = dy/dx via autodiff through the state mapping
    (replaces the reference's update_jac chain, jacobian.h:77)."""
    alts, drs, bgs = stack_paths(paths)

    def fwd(x):
        sc = mapping.to_scene(x)
        sim = jax.vmap(
            lambda a, d: simulate_clearsky(
                sc, f_grid, a, d, background=background
            )
        )
        return sensor.apply(sim(alts, drs))

    x0 = mapping.to_vector(scene)
    y = fwd(x0)
    K = jax.jacrev(fwd)(x0)
    return y, K
