"""Catalog/data layer: cache-dir management + arts-cat-data ingestion.

Parity reference: /root/reference/python/src/pyarts3/data.py —
`download()` (:14) populates ~/.cache/arts with arts-cat-data /
arts-xml-data and honors ARTS_DATA_PATH as an opt-out, and
`to_abs_species` (:321) scans the cat-data directory layout
(lines/<tag>.xml, cia/<a>-CIA-<b>.xml, xsec/<tag>-XFIT.xml,
predef/<model>.xml) for the tags a given species list needs.

Offline-first: this deployment has no network egress, so download()
verifies/uses an existing cache instead of fetching; ingestion reads
whatever layout the search paths point at (io.config honors
ARTS_DATA_PATH / ARTS_XML_DATA_DIR / ARTS_CAT_DATA_DIR like the
reference's parameters.cc).
"""

import os
import pathlib

import numpy as np

from .config import find_data, search_paths

_CAT_SUBDIRS = ("lines", "cia", "xsec", "predef")


def download(data=("xml", "cat"), download_dir=None, verbose=False):
    """Resolve the data cache (pyarts3.data.download parity, data.py:14).

    Like the reference: a set ARTS_DATA_PATH means the user manages their
    own catalogs — no action.  Otherwise the cache directory
    (~/.cache/arts by default) is used when already populated; with no
    network egress an empty cache is an error with instructions rather
    than a fetch.  Returns the list of usable data roots.
    """
    if os.getenv("ARTS_DATA_PATH"):
        if verbose:
            print("ARTS_DATA_PATH set; using user-managed catalogs.")
        return [pathlib.Path(p) for p in os.environ["ARTS_DATA_PATH"].split(":") if p]

    base = pathlib.Path(
        download_dir
        if download_dir is not None
        else pathlib.Path.home() / ".cache" / "arts"
    )
    roots = []
    names = {"xml": "arts-xml-data", "cat": "arts-cat-data"}
    missing = []
    for d in data:
        if d not in names:
            raise RuntimeError(f'Unknown download data type "{d}"')
        hits = sorted(base.glob(names[d] + "*"))
        hits = [h for h in hits if h.is_dir()]
        if hits:
            roots.append(hits[-1])
        else:
            missing.append(names[d])
    if missing:
        raise FileNotFoundError(
            f"Data packages {missing} not found under {base} and this "
            "environment has no network access. Place the extracted "
            "packages there or set ARTS_DATA_PATH / ARTS_CAT_DATA_DIR."
        )
    return roots


def find_xml(relpath):
    """Locate <relpath>.xml under the search paths (file.find_xml parity);
    returns None when absent (the reference's optional-scan behavior)."""
    rel = str(relpath)
    if not rel.endswith(".xml"):
        rel = rel + ".xml"
    try:
        return find_data(rel)
    except FileNotFoundError:
        return None


def to_abs_species(species):
    """Scan the cat-data layout for the absorption tags a species list
    needs (pyarts3.data.to_abs_species parity, data.py:321): line
    catalogs, XFIT cross-section fits, CIA pairs, and the standard
    continuum completions for H2O/CO2."""
    out = []
    species = list(species)
    for spec in species:
        out.append(spec)
        if find_xml(f"xsec/{spec}-XFIT") is not None:
            out.append(f"{spec}-XFIT")
        for spec2 in species:
            if find_xml(f"cia/{spec}-CIA-{spec2}") is not None:
                out.append(f"{spec}-CIA-{spec2}")
            if find_xml(f"cia/{spec2}-CIA-{spec}") is not None:
                out.append(f"{spec2}-CIA-{spec}")
        if spec == "H2O":
            out.append("H2O-ForeignContCKDMT400")
            out.append("H2O-SelfContCKDMT400")
            if find_xml("predef/H2O-SelfContCKDMT430") is not None:
                out.append("H2O-ForeignContCKDMT430")
                out.append("H2O-SelfContCKDMT430")
        elif spec == "CO2":
            out.append("CO2-CKDMT252")
    seen = set()
    uniq = []
    for tag in out:
        if tag not in seen:
            seen.add(tag)
            uniq.append(tag)
    return uniq


def read_catalog_data(
    species, cutoff=np.inf, fmin=0.0, fmax=np.inf, q_t0=None
):
    """Ingest the cat-data layout into framework objects
    (Workspace.ReadCatalogData analogue for the pytree world).

    For each species tag, every lines/<Species>-*.xml AbsorptionBand file
    is read into build_catalog line dicts; legacy ARTSCAT-3/4
    ArrayOfLineRecord files (planetary catalogs, e.g. spectroscopy/Perrin)
    are routed through io.artscat and need q_t0 = {isotopologue: Q(T0)}
    for the strength conversion.  CIA pairs load as CIARecords.  Returns
    dict(cat=LineCatalog | None, cia=[CIARecord...],
    tags=[resolved absorption tags]).
    """
    from ..lbl.catalog import build_catalog
    from .artscat import read_artscat
    from .artsxml import load_abs_bands

    species = list(species)
    lines = []
    for base in search_paths():
        d = base / "lines"
        if not d.is_dir():
            continue
        for f in sorted(d.glob("*.xml")):
            stem = f.stem.split("-")[0]
            if stem in species:
                head = f.read_text(errors="ignore")[:4096]
                if "ArrayOfLineRecord" in head:
                    lines.extend(
                        read_artscat(str(f), species, q_t0=q_t0)
                    )
                else:
                    lines.extend(load_abs_bands(f, species))
    for l in lines:
        l["cutoff"] = min(l.get("cutoff", np.inf), cutoff)
    lines = [l for l in lines if fmin <= l["f0"] <= fmax]
    lines.sort(key=lambda l: l["f0"])
    # uniform iso_idx over the merged multi-reader list: per-file
    # iso_start arithmetic is order-dependent (an ARTSCAT file sorting
    # before an AbsorptionBand file would steal partition-function row 0)
    from .hitran import assign_iso_indices

    iso_map = assign_iso_indices(lines)
    isotopologues = [t for t, _ in sorted(iso_map.items(), key=lambda kv: kv[1])]

    cias = []
    for a in species:
        for b in species:
            p = find_xml(f"cia/{a}-CIA-{b}")
            if p is not None:
                from .artsxml import load

                cias.append((f"{a}-CIA-{b}", load(p)))

    return dict(
        cat=build_catalog(lines) if lines else None,
        cia=cias,
        tags=to_abs_species(species),
        isotopologues=isotopologues,  # ordered by iso_idx (pf table rows)
    )


def read_partfun_data(isotopologues, t_grid=None):
    """Build a PartFunTable from the cache dir's TIPS tables.

    Searches partition-functions/<Isotopologue>.xml under the data search
    paths (the layout the reference's src/partfun/CMakeLists.txt:10
    compiles in at build time — here ingested at runtime).  isotopologues:
    ordered tags defining iso_idx (pass io.hitran.iso_index_of_lines
    order).  Returns (PartFunTable, {tag: iso_idx}); raises
    FileNotFoundError listing any missing tables.
    """
    from ..lbl.partfun import table_from_xml

    files = {}
    missing = []
    for tag in isotopologues:
        p = find_xml(f"partition-functions/{tag}")
        if p is None:
            missing.append(tag)
        else:
            files[tag] = str(p)
    if missing:
        raise FileNotFoundError(
            f"no partition-functions/<iso>.xml for {missing} under the "
            "data search paths (arts-cat-data layout)"
        )
    return table_from_xml(files, t_grid=t_grid)
