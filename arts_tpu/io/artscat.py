"""Legacy ARTSCAT-3/4 line-catalog reader.

Parity reference: /root/reference/src/xml_io_old.cc —
``ReadFromArtscat3Stream`` (:11), ``from_artscat4`` (:166),
``ReadFromArtscat4Stream`` (:215), ``xml_io_stream<ArrayOfArtscatMeta>``
(:327) — and the split-file convention of
``abs_bandsReadSpeciesSplitARTSCAT`` (/root/reference/src/m_lbl.cc:507).

These formats carry the planetary spectroscopy catalogs (e.g.
``spectroscopy/Perrin/`` used by tests/core/mars/cat.py).  Records are
``@``-prefixed text lines inside an ``<ArrayOfLineRecord version=...>``
XML element; output is the same line-dict schema as
:func:`arts_tpu.io.hitran.read_par`, feeding
:func:`arts_tpu.lbl.catalog.build_catalog` directly.
"""

import glob
import gzip
import os
import re

import numpy as np

from ..lbl.tmodel import Law
from .hitran import einstein_a_from_s
from .species import ISOTOPOLOGUES

# ARTSCAT-4 perturber column order (xml_io_old.cc:178-185): the line's
# own species then N2, O2, H2O, CO2, H2, He.
_V4_PERTURBERS = ("N2", "O2", "H2O", "CO2", "H2", "He")


def _read_text(path_or_text):
    if "\n" in path_or_text or "<" in path_or_text:
        return path_or_text
    if path_or_text.endswith(".gz"):
        with gzip.open(path_or_text, "rt") as fh:
            return fh.read()
    with open(path_or_text) as fh:
        return fh.read()


def parse_artscat(path_or_text):
    """(version, records): ARTSCAT version int and raw ``@`` record strings.

    Accepts a path (.xml or .xml.gz) or the XML text itself.  Mirrors
    xml_io_stream<ArrayOfArtscatMeta>::read (xml_io_old.cc:327): the
    ArrayOfLineRecord tag carries the version; each record is one line
    starting with ``@``.
    """
    text = _read_text(path_or_text)
    m = re.search(
        r"<ArrayOfLineRecord[^>]*version\s*=\s*\"ARTSCAT-(\d)\"[^>]*>(.*?)"
        r"</ArrayOfLineRecord>",
        text,
        re.S,
    )
    if m is None:
        raise ValueError("no <ArrayOfLineRecord version=\"ARTSCAT-N\"> found")
    version = int(m.group(1))
    if version not in (3, 4):
        raise ValueError(
            f"unknown ARTSCAT version {version}: supported are 3 and 4"
        )
    records = [
        ln.strip()
        for ln in m.group(2).splitlines()
        if ln.lstrip().startswith("@")
    ]
    return version, records


def _parse_v3(tokens):
    """One ARTSCAT-3 record -> raw fields (ReadFromArtscat3Stream :11).

    Layout after ``@``: ARTSID f0 psf I0 T0 e0 agam sgam nair nself tgam
    naux aux*naux [7 accuracies, ignored].
    """
    artsid = tokens[0]
    f0, psf, I0, T0, e0, agam, sgam, nair, nself, tgam = (
        float(t) for t in tokens[1:11]
    )
    # tgam != T0: rescale to the intensity reference temperature
    # (xml_io_old.cc:128-134)
    if tgam != T0:
        agam *= (tgam / T0) ** nair
        sgam *= (tgam / T0) ** nself
        psf *= (tgam / T0) ** (0.25 + 1.5 * nair)
    # NOTE: the reference stores the SELF G0 exponent as nair, not nself
    # (xml_io_old.cc:139 `self.data[G0] = {T1, Vector{sgam, nair}}`;
    # ARTS 2 used nself).  We transcribe the reference exactly.
    ls_named = {
        "self": {"G0": (Law.T1, [sgam, nair]), "D0": (Law.T5, [psf, nair])},
        "bath": {"G0": (Law.T1, [agam, nair]), "D0": (Law.T5, [psf, nair])},
    }
    return artsid, f0, I0, T0, e0, 1.0, 1.0, ls_named


def _parse_v4(tokens):
    """One ARTSCAT-4 record (ReadFromArtscat4Stream :215, from_artscat4 :166).

    Layout after ``@``: ARTSID f0 I0 T0 e0 A gu gl, then 7 G0 x0 values
    (self, N2, O2, H2O, CO2, H2, He), 7 shared G0/D0 exponents, 6 D0 x0
    values (perturbers only; self D0 x0 = 0).
    """
    artsid = tokens[0]
    f0, I0, T0, e0, _A, gu, gl = (float(t) for t in tokens[1:8])
    vals = [float(t) for t in tokens[8 : 8 + 20]]
    g0 = vals[0:7]
    ex = vals[7:14]
    d0 = [0.0] + vals[14:20]
    ls_named = {}
    names = ("self",) + _V4_PERTURBERS
    for name, g, n, d in zip(names, g0, ex, d0):
        # duplicate keys overwrite, as the reference's species-keyed map
        # does when the line's own species is one of the six perturbers
        ls_named[name] = {
            "G0": (Law.T1, [g, n]),
            "D0": (Law.T5, [d, n]),
        }
    if not gu > 0.0:
        gu = 1.0
    if not gl > 0.0:
        gl = 1.0
    return artsid, f0, I0, T0, e0, gu, gl, ls_named


def read_artscat(
    path_or_text,
    species_list,
    q_t0=None,
    cutoff=np.inf,
    fmin=0.0,
    fmax=np.inf,
    iso_start=0,
):
    """Read an ARTSCAT-3/4 file into build_catalog line dicts.

    species_list: VMR-vector species tags; records of other species (and
    unknown isotopologues) are skipped.  q_t0: {isotopologue: Q(T0)} for
    the strength -> Einstein-A conversion (compute_a, lbl_data.cpp:156;
    ARTSCAT intensities are already abundance-weighted, so no de-weight).
    Returns line dicts in the read_par schema; iso_idx starts at
    iso_start (for merging with other catalogs).
    """
    version, records = parse_artscat(path_or_text)
    parse = _parse_v3 if version == 3 else _parse_v4
    out = []
    iso_ids = {}
    for rec in records:
        tokens = rec.lstrip("@").split()
        if not tokens:
            continue
        artsid, f0, I0, T0, e0, gu, gl, ls_named = parse(tokens)
        if not (fmin <= f0 <= fmax):
            continue
        meta = ISOTOPOLOGUES.get(artsid)
        if meta is None or meta.species not in species_list:
            continue
        spec_idx = species_list.index(meta.species)
        iso_idx = iso_ids.setdefault(artsid, iso_start + len(iso_ids))
        if q_t0 is None or artsid not in q_t0:
            raise KeyError(f"Q(T0) required for {artsid} (pass q_t0)")
        a = einstein_a_from_s(
            I0, gu, e0, f0, q_t0[artsid], iso_abundance=1.0, T0=T0
        )
        # resolve named perturbers to VMR indices; species absent from the
        # VMR vector drop out (the reference's vmr=0 for missing species)
        ls = {}
        for name, vars_ in ls_named.items():
            if name == "self":
                ls[spec_idx] = vars_
            elif name == "bath":
                ls["bath"] = vars_
            elif name in species_list:
                ls[species_list.index(name)] = vars_
        out.append(
            dict(
                f0=f0,
                a=a,
                e0=e0,
                gu=gu,
                gl=gl,
                iso_mass=meta.mass,
                iso_ratio=meta.abundance,
                spec_idx=spec_idx,
                iso_idx=iso_idx,
                band_idx=0,
                t0=T0,
                cutoff=cutoff,
                ls=ls,
                isotopologue=artsid,
            )
        )
    return out


def read_artscat_split(basename, species_list, q_t0=None, **kw):
    """Read per-species/isotopologue split ARTSCAT files under a basename.

    Mirrors abs_bandsReadSpeciesSplitARTSCAT (m_lbl.cc:507): files are
    ``<basename><Species>.xml`` or ``<basename><Isotopologue>.xml`` (a
    trailing ``/`` in basename means a directory).  Missing files are
    skipped; ``.xml.gz`` sidecars are picked up too.
    """
    lines = []
    seen = set()
    for spec in species_list:
        pats = [
            os.path.join(basename, f"{spec}*.xml"),
            basename + f"{spec}*.xml",
        ]
        for pat in pats + [p + ".gz" for p in pats]:
            for path in sorted(glob.glob(pat)):
                if path in seen:
                    continue
                seen.add(path)
                lines.extend(
                    read_artscat(path, species_list, q_t0=q_t0, **kw)
                )
    lines.sort(key=lambda l: l["f0"])
    # one uniform mapping over all files: the same isotopologue appearing
    # in two matched files (H2O.xml and H2O-161.xml) must share one
    # partition-function row
    from .hitran import assign_iso_indices

    assign_iso_indices(lines)
    return lines
