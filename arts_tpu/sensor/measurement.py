"""Measurement-vector pipeline: batched geometries -> sensor contraction.

Parity reference: /root/reference/src/m_rad.cc:469
(`measurement_vecFromSensor`, "HighPerf" kernel): dedup shared
(f_grid, poslos) simulations, run the observer agenda per simulation under
OpenMP, then contract the sparse sensor weights into y and dy/dx.

TPU-native: the deduped simulation batch is a stacked-path vmap of the
observer operator (geometries padded to a common length; zero-length
segments are exact no-ops), the contraction is the SensorArray
gather+segment-sum, and dy/dx is autodiff of the whole pipeline.  The
observer is pluggable (sensor/observers.py: scalar clearsky, polarized
Zeeman, DISORT-background) — the reference's
`spectral_rad_observer_agenda` (workspace_agendas.cpp:165) as a plain
callable over the stacked batch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .obsel import SensorArray
from .observers import clearsky_observer


def stack_paths(paths):
    """Pad a list of PathGeometry to a common length -> (alt [G, NP],
    dr [G, NP-1], za [G, NP], background list).  Padding repeats the last
    point with zero-length segments (exact no-ops in the emission
    recursion)."""
    npmax = max(p.n_points for p in paths)
    alts = np.zeros((len(paths), npmax))
    drs = np.zeros((len(paths), npmax - 1))
    zas = np.zeros((len(paths), npmax))
    for i, p in enumerate(paths):
        n = p.n_points
        alts[i, :n] = p.alt
        alts[i, n:] = p.alt[-1]
        za = getattr(p, "za", None)
        if za is not None:
            zas[i, :n] = za
            zas[i, n:] = za[-1]
        drs[i, : n - 1] = p.dr
    return (
        jnp.asarray(alts),
        jnp.asarray(drs),
        jnp.asarray(zas),
        [p.background for p in paths],
    )


def stack_azimuths(paths):
    """First-path-point line-of-sight azimuth per geometry [G] (degrees);
    geometries without an `aa` attribute count as azimuth 0."""
    out = np.zeros(len(paths))
    for i, p in enumerate(paths):
        aa = getattr(p, "aa", None)
        if aa is not None:
            out[i] = float(np.ravel(np.asarray(aa))[0])
    return jnp.asarray(out)


def _simulate_batch(scene, f_grid, alts, drs, zas, backgrounds,
                    observer=None, aas=None):
    """Radiances [G, F] for stacked geometries; mixed background types are
    split into per-background sub-batches (the reference splits
    simulations by observer agenda) and scattered back in order.

    Observers carrying ``wants_azimuth = True`` (the azimuth-resolved
    DISORT observer) additionally receive the per-geometry line-of-sight
    azimuths."""
    observer = observer or clearsky_observer()
    groups = {}
    for i, b in enumerate(backgrounds):
        groups.setdefault(b, []).append(i)
    I = None
    for bg, idx in groups.items():
        sel = jnp.asarray(idx)
        if getattr(observer, "wants_azimuth", False):
            a = jnp.zeros(len(idx)) if aas is None else aas[sel]
            Ib = observer(scene, f_grid, alts[sel], drs[sel], zas[sel], bg,
                          aas=a)
        else:
            Ib = observer(scene, f_grid, alts[sel], drs[sel], zas[sel], bg)
        if I is None:
            I = jnp.zeros((len(backgrounds),) + Ib.shape[1:], Ib.dtype)
        I = I.at[sel].set(Ib)
    return I


def measurement_vector(
    scene, sensor: SensorArray, f_grid, paths, background: str = "surface",
    observer=None,
):
    """y [n_elements] for a batch of geometries sharing one f_grid."""
    alts, drs, zas, bgs = stack_paths(paths)
    I = _simulate_batch(
        scene, f_grid, alts, drs, zas, [b or background for b in bgs],
        observer=observer, aas=stack_azimuths(paths),
    )
    return sensor.apply(I)


@dataclasses.dataclass(frozen=True)
class Obsel:
    """One observation element group: a sensor weight set over a SHARED
    (f_grid, paths) simulation grid (obsel.h:105-155 — the sharing is
    what the dedup below exploits, as the reference's pointer-keyed
    cache does).  observer: optional forward operator from
    sensor/observers.py (None = scalar clearsky)."""

    sensor: SensorArray
    f_grid: object
    paths: tuple
    background: str = "surface"
    observer: object = None


def collect_simulations(obsels):
    """Dedup shared (f_grid, paths, background, observer) across obsels.

    Parity: m_rad.cc:385-400 — the reference keys its cache on the
    f_grid/poslos POINTERS; here identity of the Python objects first,
    then value equality (array bytes) as a fallback, so independently
    constructed but equal grids still dedup.  Returns (groups,
    obsel_to_group): groups = list of (f_grid, paths, background,
    observer)."""
    groups = []
    keymap = {}
    obsel_to_group = []

    def value_key(ob):
        fg = np.asarray(ob.f_grid)
        pk = tuple(
            (
                np.asarray(p.alt).tobytes(),
                np.asarray(p.dr).tobytes(),
            )
            for p in ob.paths
        )
        return (fg.tobytes(), pk, ob.background, id(ob.observer))

    for ob in obsels:
        ident = (id(ob.f_grid), id(ob.paths), ob.background, id(ob.observer))
        if ident in keymap:
            obsel_to_group.append(keymap[ident])
            continue
        vk = value_key(ob)
        if vk in keymap:
            keymap[ident] = keymap[vk]
            obsel_to_group.append(keymap[vk])
            continue
        gi = len(groups)
        groups.append((ob.f_grid, ob.paths, ob.background, ob.observer))
        keymap[ident] = gi
        keymap[vk] = gi
        obsel_to_group.append(gi)
    return groups, obsel_to_group


def measurement_vector_from_obsels(scene, obsels):
    """y for a heterogeneous obsel list: each unique (f_grid, paths,
    observer) simulation batch runs ONCE (the HighPerf dedup), then every
    obsel contracts its weights from the cached radiances; results
    concatenate in obsel order (measurement_vecFromSensor parity,
    m_rad.cc:469).  Obsels may carry different observer operators
    (scalar/polarized/DISORT) and different scenes are per-call."""
    groups, o2g = collect_simulations(obsels)
    cache = []
    for f_grid, paths, bg, observer in groups:
        alts, drs, zas, bgs = stack_paths(paths)
        cache.append(
            _simulate_batch(
                scene, f_grid, alts, drs, zas, [b or bg for b in bgs],
                observer=observer, aas=stack_azimuths(paths),
            )
        )
    return jnp.concatenate(
        [ob.sensor.apply(cache[g]) for ob, g in zip(obsels, o2g)]
    ), len(groups)


def measurement_jacobian(scene, sensor, f_grid, paths, mapping,
                         background="surface", observer=None):
    """(y, K) with K = dy/dx via autodiff through the state mapping
    (replaces the reference's update_jac chain, jacobian.h:77)."""
    alts, drs, zas, bgs = stack_paths(paths)
    observer = observer or clearsky_observer()

    def fwd(x):
        sc = mapping.to_scene(x)
        I = observer(
            sc, f_grid, alts, drs, zas,
            background,
        )
        return sensor.apply(I)

    x0 = mapping.to_vector(scene)
    y = fwd(x0)
    K = jax.jacrev(fwd)(x0)
    return y, K
