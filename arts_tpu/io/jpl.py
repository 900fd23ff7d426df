"""JPL spectral line catalog (.cat) reader.

Parity reference: /root/reference/src/core/lbl/lbl_jpl.cpp —
read_jpl_entry (:69, fixed-width fields [F13.4,2F8.4,I2,F10.4,I3,I7,I4]
with MHz->Hz, log10(nm^2 MHz)->SI, cm^-1->J conversions) and
jpl_record::from (:115, Einstein-A via einstein_a at the species T0 with
Q(T0), default air broadening G0 = T1 law [25e3 Hz/Pa, 0.75]).

The reference resolves the 7-digit JPL species TAG through a generated
table (src/core/quantum/jpl_species.cc data_lookup, auto_jpl_species_map).
Here a builtin registry covers the common microwave species; additional
tags register via `JPL_TAGS[tag] = (isotopologue_name, Q300)` or the
`tag_map=` argument.
"""

import dataclasses
import math

import numpy as np

from .. import constants as const
from ..lbl.tmodel import Law
from .species import ISOTOPOLOGUES

_KAYCM2J = const.h * 100.0 * const.c  # cm^-1 -> J
T0_JPL = 300.0

# JPL tag -> (ARTS isotopologue name, Q at 300 K).
# Q(300) values from the JPL catalog documentation (partition function at
# 300 K); tag = nominal_mass * 1000 + species counter.
JPL_TAGS = {
    18003: ("H2O-161", 179.639),
    18005: ("H2O-181", 180.332),
    19003: ("H2O-171", 1078.18),
    20003: ("H2O-162", 859.4),
    17004: ("NH3-4111", 1725.23),
    18004: ("NH3-5111", 1153.30),
    28001: ("CO-26", 107.42),
    29001: ("CO-36", 224.69),
    30001: ("CO-28", 112.77),
    32001: ("O2-66", 215.77),
    33002: ("O2-67", 894.18),
    34001: ("O2-68", 455.23),
    44004: ("N2O-446", 5001.07),
    45007: ("N2O-456", 3343.98),
    45008: ("N2O-546", 3449.17),
    46007: ("N2O-448", 5314.74),
    48004: ("O3-666", 3473.04),
    49002: ("O3-668", 7440.66),
    50004: ("O3-686", 3648.72),
    64002: ("SO2-626", 6322.57),
    17001: ("OH-61", 80.362),
    19002: ("OH-81", 80.882),
    27001: ("HCN-124", 891.58),
    28002: ("HCN-134", 1830.99),
    51002: ("ClO-56", 3274.61),
    53002: ("ClO-76", 3332.29),
    36001: ("HCl-15", 34.69),
    38001: ("HCl-17", 34.74),
    20001: ("HF-19", 41.47),
    34002: ("H2S-121", 505.79),
    63001: ("HNO3-146", 214000.0),
    30008: ("NO-46", 1591.28),
    46006: ("NO2-646", 13617.0),
}


@dataclasses.dataclass
class JplRecord:
    """One .cat row in SI units (lbl_jpl.h:10 jpl_record)."""

    tag: int
    f0: float  # Hz
    df: float  # Hz (frequency error)
    s: float  # m^2 Hz, integrated intensity at 300 K
    dr: int  # degrees of freedom
    e0: float  # J (lower-state energy)
    g_upp: int
    qnfmt: int
    quanta: str


def parse_cat_line(row: str) -> JplRecord:
    """Parse one fixed-width JPL row (lbl_jpl.cpp:69 field widths)."""
    f0 = float(row[0:13]) * 1e6
    df = float(row[13:21]) * 1e6
    # log10 of nm^2 MHz -> m^2 Hz: 1e-18 m^2 * 1e6 Hz = 1e-12
    s = 10.0 ** float(row[21:29]) / 1e12
    dr = int(row[29:31])
    e0 = float(row[31:41]) * _KAYCM2J
    g_upp = int(row[41:44])
    tag = abs(int(row[44:51]))
    qnfmt = int(row[51:55])
    return JplRecord(tag, f0, df, s, dr, e0, g_upp, qnfmt, row[55:].rstrip("\n"))


def einstein_a_from_jpl(s, gu, e0, f0, Q300, T0=T0_JPL):
    """A from the JPL intensity (lbl_data.cpp:34 einstein_a at T0=300)."""
    return (
        -8.0
        * math.pi
        * Q300
        * s
        / (
            gu
            * math.exp(-e0 / (const.k * T0))
            * math.expm1(-(const.h * f0) / (const.k * T0))
            * (const.c / f0) ** 2
        )
    )


def read_cat_records(path_or_lines, fmin=0.0, fmax=np.inf):
    """Parse a .cat file (or list of rows) into JplRecords."""
    if isinstance(path_or_lines, (list, tuple)):
        rows = path_or_lines
    else:
        with open(path_or_lines) as fh:
            rows = fh.readlines()
    out = []
    for row in rows:
        if len(row.rstrip("\n")) < 55:
            continue
        r = parse_cat_line(row)
        if fmin <= r.f0 <= fmax:
            out.append(r)
    return out


def read_cat(
    path_or_lines,
    species_list,
    tag_map=None,
    cutoff=np.inf,
    fmin=0.0,
    fmax=np.inf,
):
    """Read a .cat file into build_catalog line dicts.

    Mirrors jpl_record::from (lbl_jpl.cpp:115): gl unknown (-1 in the
    reference; here g_upp reused as a neutral placeholder in the
    degeneracy-free strength path), broadening = air-only T1 [25e3, 0.75]
    at T0 = 300 K.

    species_list: VMR-vector species tags; lines of other species skipped.
    tag_map: optional {tag: (isotopologue, Q300)} overriding JPL_TAGS.
    """
    tags = dict(JPL_TAGS)
    if tag_map:
        tags.update(tag_map)
    out = []
    for r in read_cat_records(path_or_lines, fmin=fmin, fmax=fmax):
        if r.tag not in tags:
            continue
        iso_name, Q300 = tags[r.tag]
        meta = ISOTOPOLOGUES.get(iso_name)
        if meta is None or meta.species not in species_list:
            continue
        gu = float(r.g_upp) if r.g_upp > 0 else 1.0
        a = einstein_a_from_jpl(r.s, gu, r.e0, r.f0, Q300)
        out.append(
            dict(
                f0=r.f0,
                a=a,
                e0=r.e0,
                gu=gu,
                gl=gu,  # JPL carries no lower-state degeneracy
                iso_mass=meta.mass,
                iso_ratio=meta.abundance,
                spec_idx=species_list.index(meta.species),
                iso_idx=0,
                band_idx=0,
                t0=T0_JPL,
                cutoff=cutoff,
                ls={"bath": {"G0": (Law.T1, [25e3, 0.75])}},
                isotopologue=iso_name,
            )
        )
    return out


def catalog_from_cat(path, species_list, tag_map=None, cutoff=np.inf,
                     fmin=0.0, fmax=np.inf, n_perturbers=2):
    """.cat -> LineCatalog (dict path; JPL catalogs are per-species small)."""
    from ..lbl.catalog import build_catalog

    lines = read_cat(
        path, species_list, tag_map=tag_map, cutoff=cutoff,
        fmin=fmin, fmax=fmax,
    )
    lines.sort(key=lambda r: r["f0"])
    return build_catalog(lines, n_perturbers=n_perturbers)
