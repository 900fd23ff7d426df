"""Line catalog as a padded struct-of-arrays pytree.

Parity reference: /root/reference/src/core/lbl/lbl_data.h — `lbl::line`
(Einstein A, f0, e0, gu, gl, lineshape model, Zeeman model) grouped into
`band_data` (sorted line list + cutoff + lineshape type).  The reference
keeps ragged per-band vectors of lines with per-line hash maps of
per-perturber lineshape models; on TPU everything is flattened at ingestion
into fixed-shape arrays (pad perturbers to a common count) so the whole
catalog evaluates as one fused lines x freqs computation.
"""

import dataclasses
from enum import IntEnum
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .tmodel import NV, Law, VARS


class Cutoff(IntEnum):
    NONE = 0
    BY_LINE = 1  # subtract shape value at f0 +/- cutoff, zero outside


# sentinel perturber indices in ls_spec
BATH = -2
PAD = -1


@dataclasses.dataclass(frozen=True)
class SpeciesMeta:
    """Host-side static description of the species/isotopologue tables."""

    species: tuple  # species tag names, index = vmr vector position
    isotopologues: tuple  # (species_idx, name, mass_gmol, abundance) rows

    @property
    def n_species(self):
        return len(self.species)

    @property
    def n_iso(self):
        return len(self.isotopologues)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineCatalog:
    """Flattened line catalog. L lines, P perturber slots, NV=9 variables.

    All frequency-like quantities in Hz, energies in J, SI throughout
    (same unit conventions as the reference's lbl_data.h).
    """

    f0: jax.Array  # [L] line center
    a: jax.Array  # [L] Einstein A
    e0: jax.Array  # [L] lower state energy [J]
    gu: jax.Array  # [L] upper state degeneracy
    gl: jax.Array  # [L] lower state degeneracy
    iso_mass: jax.Array  # [L] molecular mass [g/mol]
    iso_ratio: jax.Array  # [L] isotopologue abundance ratio
    spec_idx: jax.Array  # [L] int32 index into the VMR vector
    iso_idx: jax.Array  # [L] int32 index into the partition function table
    band_idx: jax.Array  # [L] int32 band id (for per-band clipping semantics)
    t0: jax.Array  # [L] lineshape reference temperature
    cutoff: jax.Array  # [L] cutoff frequency (np.inf = no cutoff)
    ls_spec: jax.Array  # [L, P] int32 perturber vmr index, BATH or PAD
    ls_law: jax.Array  # [L, P, NV] int32 temperature-law ids
    ls_x: jax.Array  # [L, P, NV, 4] law coefficients

    @property
    def n_lines(self):
        return self.f0.shape[0]

    @property
    def n_perturbers(self):
        return self.ls_spec.shape[1]


def build_catalog(lines: Sequence[dict], n_perturbers: int | None = None):
    """Build a LineCatalog from a list of per-line dicts (host side).

    Each dict: f0, a, e0, gu, gl, iso_mass, iso_ratio, spec_idx, iso_idx,
    band_idx, t0, cutoff, and ``ls``: {perturber_idx_or_'bath':
    {var_name: (law, [x0..])}}.
    """
    L = len(lines)
    P = n_perturbers or max(1, max(len(ln.get("ls", {})) for ln in lines))

    def arr(key, default=0.0):
        return np.array([ln.get(key, default) for ln in lines], dtype=np.float64)

    ls_spec = np.full((L, P), PAD, dtype=np.int32)
    ls_law = np.zeros((L, P, NV), dtype=np.int32)
    ls_x = np.zeros((L, P, NV, 4), dtype=np.float64)
    for i, ln in enumerate(lines):
        for j, (pert, vars_) in enumerate(ln.get("ls", {}).items()):
            ls_spec[i, j] = BATH if pert == "bath" else int(pert)
            for vname, (law, x) in vars_.items():
                v = VARS.index(vname)
                ls_law[i, j, v] = int(law)
                ls_x[i, j, v, : len(x)] = x

    j = jnp.asarray
    return LineCatalog(
        f0=j(arr("f0")),
        a=j(arr("a")),
        e0=j(arr("e0")),
        gu=j(arr("gu")),
        gl=j(arr("gl", 1.0)),
        iso_mass=j(arr("iso_mass")),
        iso_ratio=j(arr("iso_ratio", 1.0)),
        spec_idx=j(arr("spec_idx").astype(np.int32)),
        iso_idx=j(arr("iso_idx").astype(np.int32)),
        band_idx=j(arr("band_idx").astype(np.int32)),
        t0=j(arr("t0", 296.0)),
        cutoff=j(arr("cutoff", np.inf)),
        ls_spec=j(ls_spec),
        ls_law=j(ls_law),
        ls_x=j(ls_x),
    )


def concat_catalogs(cats: Sequence[LineCatalog]) -> LineCatalog:
    """Concatenate catalogs along the line axis (pads perturber slots)."""
    P = max(c.n_perturbers for c in cats)

    def padp(c):
        dp = P - c.n_perturbers
        if dp == 0:
            return c
        return dataclasses.replace(
            c,
            ls_spec=jnp.pad(c.ls_spec, ((0, 0), (0, dp)), constant_values=PAD),
            ls_law=jnp.pad(c.ls_law, ((0, 0), (0, dp), (0, 0))),
            ls_x=jnp.pad(c.ls_x, ((0, 0), (0, dp), (0, 0), (0, 0))),
        )

    cats = [padp(c) for c in cats]
    fields = {
        f.name: jnp.concatenate([getattr(c, f.name) for c in cats], axis=0)
        for f in dataclasses.fields(LineCatalog)
    }
    return LineCatalog(**fields)


def hitran_s(cat: LineCatalog, q296_per_line, T0: float = 296.0):
    """HITRAN-convention line intensities S(296 K) for every line.

    Parity: lbl_data.cpp:171 line::hitran_s — the inverse of the
    einstein-A conversion, weighted by the isotopologue abundance.
    q296_per_line: Q(296 K) per line (array or scalar).
    """
    import numpy as np

    from .. import constants as const

    f0 = np.asarray(cat.f0)
    a = np.asarray(cat.a)
    gu = np.asarray(cat.gu)
    e0 = np.asarray(cat.e0)
    ratio = np.asarray(cat.iso_ratio)
    q = np.broadcast_to(np.asarray(q296_per_line, dtype=np.float64), f0.shape)
    s_lte = a * gu * np.exp(-e0 / (const.k * T0)) / (f0**3 * q)
    scl = -f0 * np.expm1(-const.h * f0 / (const.k * T0)) * (
        const.c**2 / (8.0 * np.pi)
    )
    return ratio * s_lte * scl


def keep_strongest(cat: LineCatalog, q296_per_line, percentile: float):
    """Drop the weakest `percentile` % of lines by HITRAN intensity.

    Parity: lbl_data.cpp:208 keep_hitran_s / percentile_hitran_s (the
    example's abs_bands.keep_hitran_s(approximate_percentile=90)).
    """
    import numpy as np

    s = hitran_s(cat, q296_per_line)
    thresh = np.percentile(s, percentile)
    keep = np.nonzero(s >= thresh)[0]
    idx = jnp.asarray(keep.astype(np.int32))
    return dataclasses.replace(
        cat,
        **{
            f.name: getattr(cat, f.name)[idx]
            for f in dataclasses.fields(LineCatalog)
        },
    )
