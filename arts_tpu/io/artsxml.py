"""ARTS XML (+ binary sidecar) reader.

Parity reference: /root/reference/src/core/xml/xml_io_stream.h (templated
serialization of every workspace group; ASCII XML with an optional
little-endian double `.bin` sidecar written in document order by
src/core/binio/bofstream) and the per-type formats:
  - matpack tensors (xml_io_stream_matpack_mdspan.h)
  - GriddedField (grids + data)
  - AbsorptionBand / line / lineshape model text form (lbl_data.cpp:52,
    lbl_lineshape_model.cpp:293, lbl_temperature_model.cpp:28)
  - legacy SingleScatteringData v3 (gridded TRO format)

This is a host-side scene-construction tool: output is numpy; conversion
to jitted pytrees happens in the loaders (catalog.py / habit builders).
"""

import gzip
import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from ..lbl.tmodel import Law, VARS
from .species import ISOTOPOLOGUES, LONG_TO_TAG, split_tag

LAW_NAMES = {
    "T0": Law.T0,
    "T1": Law.T1,
    "T2": Law.T2,
    "T3": Law.T3,
    "T4": Law.T4,
    "T5": Law.T5,
    "AER": Law.AER,
    "DPL": Law.DPL,
    "POLY": Law.POLY,
}
LAW_SIZES = {
    Law.T0: 1,
    Law.T1: 2,
    Law.T2: 3,
    Law.T3: 2,
    Law.T4: 3,
    Law.T5: 2,
    Law.AER: 4,
    Law.DPL: 4,
}


class _BinCursor:
    """Sequential reader over the little-endian double sidecar."""

    def __init__(self, path):
        self.data = np.fromfile(path, dtype="<f8")
        self.pos = 0

    def take(self, n):
        out = self.data[self.pos : self.pos + n]
        if out.size != n:
            raise ValueError("binary sidecar exhausted")
        self.pos += n
        return out


def _text_numbers(el):
    txt = el.text or ""
    for child in el:
        txt += child.tail or ""
    return np.array([float(t) for t in txt.split()])


_TENSOR_DIMS = {
    "Vector": 1,
    "Matrix": 2,
    "Tensor3": 3,
    "Tensor4": 4,
    "Tensor5": 5,
    "Tensor6": 6,
    "Tensor7": 7,
}
_DIM_ATTRS = [
    "ncols",
    "nrows",
    "npages",
    "nbooks",
    "nshelves",
    "nvitrines",
    "nlibraries",
]


def _tensor_shape(el, ndim):
    if "shape" in el.attrib:
        return tuple(int(s) for s in el.attrib["shape"].split())
    if ndim == 1 and "nelem" in el.attrib:
        return (int(el.attrib["nelem"]),)
    dims = [int(el.attrib[a]) for a in _DIM_ATTRS[:ndim]]
    return tuple(reversed(dims))


def parse_value(el, binc=None):
    """Parse one ARTS XML element into a python/numpy value."""
    tag = el.tag
    if tag == "Matpack":  # arts3 generic tensor with rank attribute
        shape = tuple(int(s) for s in el.attrib["shape"].split())
        n = int(np.prod(shape)) if shape else 1
        vals = binc.take(n) if binc is not None else _text_numbers(el)
        return vals.reshape(shape)
    if tag in _TENSOR_DIMS:
        shape = _tensor_shape(el, _TENSOR_DIMS[tag])
        n = int(np.prod(shape)) if shape else 0
        if binc is not None:
            vals = binc.take(n)
        else:
            vals = _text_numbers(el)
            if vals.size != n:
                raise ValueError(f"{tag}: expected {n} values, got {vals.size}")
        return vals.reshape(shape)
    if tag == "String":
        return (el.text or "").strip().strip('"')
    if tag == "Index":
        return int((el.text or "0").strip())
    if tag == "Numeric":
        if binc is not None:
            return float(binc.take(1)[0])
        return float((el.text or "0").strip())
    if tag in ("Array", "ArrayOfString"):
        return [parse_value(c, binc) for c in el]
    if tag == "GriddedField":
        n = int(el.attrib.get("N", 0))
        kids = list(el)
        name = None
        grids = []
        gridnames = []
        i = 0
        # layout: String name, then per-dim (String gridname? Vector grid)…
        # ARTS v2 GriddedField: name String, then N grid-name Strings and
        # N grid Vectors interleaved or sequential; handle both orders.
        strings = [parse_value(k, binc) for k in kids if k.tag == "String"]
        vecs = [parse_value(k, binc) for k in kids if k.tag == "Vector"]
        data = [
            parse_value(k, binc)
            for k in kids
            if k.tag in _TENSOR_DIMS and k.tag != "Vector"
        ]
        name = strings[0] if strings else None
        gridnames = strings[1 : 1 + n]
        grids = vecs[:n]
        if not data:
            # data may itself be a Vector (1D field): last vector
            data = [vecs[n]] if len(vecs) > n else []
        return dict(
            name=name, gridnames=gridnames, grids=grids, data=data[0] if data else None
        )
    if tag == "QuantumIdentifier":
        return (el.text or "").strip()
    if tag == "AbsorptionBand":
        return parse_band(el)
    if tag == "SingleScatteringData":
        kids = list(el)
        vals = [parse_value(k, binc) for k in kids]
        return dict(
            ptype=vals[0],
            description=vals[1],
            f_grid=vals[2],
            T_grid=vals[3],
            za_grid=vals[4],
            aa_grid=vals[5],
            pha_mat_data=vals[6],
            ext_mat_data=vals[7],
            abs_vec_data=vals[8],
        )
    if tag == "ScatteringMetaData":
        kids = list(el)
        vals = [parse_value(k, binc) for k in kids]
        return dict(
            description=vals[0],
            source=vals[1],
            refr_index=vals[2],
            mass=vals[3],
            diameter_max=vals[4],
            diameter_volume_equ=vals[5],
            diameter_area_equ_aerodynamical=vals[6],
        )
    if tag == "PartitionFunctionsData":
        # src/partfun/xml_io_partfun.cc: type attribute + Matrix payload
        # (Interp: [n, 2] (T, Q) rows; Coeff: [n, 1] polynomial
        # coefficients; StaticInterp: equidistant grid)
        kids = list(el)
        return dict(
            type=el.attrib.get("type", "Interp"),
            data=parse_value(kids[0], binc),
        )
    if tag == "Map":
        kids = list(el)
        out = {}
        for k_el, v_el in zip(kids[0::2], kids[1::2]):
            out[parse_value(k_el, binc)] = parse_value(v_el, binc)
        return out
    # fallback: recurse single child
    kids = list(el)
    if len(kids) == 1:
        return parse_value(kids[0], binc)
    return [parse_value(k, binc) for k in kids]


def parse_band(el):
    """AbsorptionBand: attributes + nelem lines in the text serialization
    of lbl::line (lbl_data.cpp:52: f0 a e0 gu gl zeeman ls qn)."""
    nelem = int(el.attrib.get("nelem", 0))
    cutoff_type = el.attrib.get("cutoff_type", "None")
    cutoff_value = float(el.attrib.get("cutoff_value", np.inf))
    lineshape = el.attrib.get("lineshape", "VP_LTE")
    toks = (el.text or "").split()
    it = iter(toks)
    nxt = lambda: next(it)
    lines = []
    for _ in range(nelem):
        f0 = float(nxt())
        a = float(nxt())
        e0 = float(nxt())
        gu = float(nxt())
        gl = float(nxt())
        # zeeman::model: on flag + gu gl factors
        z_on = nxt()
        z_gu = float(nxt())
        z_gl = float(nxt())
        t0 = float(nxt())
        nspec = int(nxt())
        ls = {}
        for _ in range(nspec):
            sname = nxt()
            tag_name = LONG_TO_TAG.get(sname, sname)
            nvar = int(nxt())
            vars_ = {}
            for _ in range(nvar):
                vname = nxt()
                law = LAW_NAMES[nxt()]
                nx = LAW_SIZES.get(law)
                if nx is None:  # POLY: explicit count
                    nx = int(nxt())
                xs = [float(nxt()) for _ in range(nx)]
                vars_[vname] = (law, xs)
            ls[tag_name] = vars_
        nqn = int(nxt())
        qn = []
        for _ in range(nqn):
            qn.append((nxt(), nxt(), nxt()))
        lines.append(
            dict(
                f0=f0,
                a=a,
                e0=e0,
                gu=gu,
                gl=gl,
                zeeman=(z_on, z_gu, z_gl),
                t0=t0,
                ls=ls,
                qn=qn,
                cutoff=cutoff_value if cutoff_type != "None" else np.inf,
                lineshape=lineshape,
            )
        )
    return dict(
        lineshape=lineshape,
        cutoff_type=cutoff_type,
        cutoff_value=cutoff_value,
        lines=lines,
    )


def load(path):
    """Load an ARTS XML file (gz and binary-sidecar aware). Returns the
    parsed top-level value."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as fh:
        tree = ET.parse(fh)
    root = tree.getroot()
    assert root.tag == "arts", f"not an ARTS XML file: {path}"
    binc = None
    if root.attrib.get("format") == "binary":
        binc = _BinCursor(str(path) + ".bin")
    kids = list(root)
    vals = [parse_value(k, binc) for k in kids]
    return vals[0] if len(vals) == 1 else vals


def load_abs_bands(path, species_list):
    """Load a Map<QuantumIdentifier, AbsorptionBand> XML catalog into the
    per-line dicts accepted by lbl.catalog.build_catalog.

    species_list: ordered species tags defining the VMR vector (e.g.
    ["H2O", "N2", "O2"]). Lines whose species is absent are skipped.
    """
    data = load(path)
    assert isinstance(data, dict)
    out = []
    band_idx = 0
    for qid, band in data.items():
        isot = qid.split()[0]  # "H2O-161 ..." -> isotopologue tag
        spec, _ = split_tag(isot)
        if spec not in species_list:
            band_idx += 1
            continue
        meta = ISOTOPOLOGUES.get(isot)
        if meta is None:
            raise KeyError(
                f"unknown isotopologue {isot}; register it via "
                "arts_tpu.io.species.register_isotopologue"
            )
        spec_idx = species_list.index(spec)
        for ln in band["lines"]:
            ls = {}
            for pert_tag, vars_ in ln["ls"].items():
                if pert_tag == "AIR":
                    key = "bath"
                elif pert_tag in species_list:
                    key = species_list.index(pert_tag)
                else:
                    continue  # perturber not simulated: fold nothing
                ls[key] = {v: model for v, model in vars_.items() if v in VARS}
            out.append(
                dict(
                    f0=ln["f0"],
                    a=ln["a"],
                    e0=ln["e0"],
                    gu=ln["gu"],
                    gl=ln["gl"],
                    iso_mass=meta.mass,
                    iso_ratio=meta.abundance,
                    spec_idx=spec_idx,
                    iso_idx=0,  # caller assigns partition-function slots
                    band_idx=band_idx,
                    t0=ln["t0"],
                    cutoff=ln["cutoff"],
                    ls=ls,
                    isotopologue=isot,
                )
            )
        band_idx += 1
    return out


def load_gridded_field(path):
    """GriddedField XML -> dict(name, gridnames, grids, data)."""
    return load(path)


# ---------------------------------------------------------------------------
# Writer (ascii): enough for data interchange of the numeric workhorses
# (WriteXML parity for tensors and gridded fields).
# ---------------------------------------------------------------------------
_RANK_TAG = {1: "Vector", 2: "Matrix", 3: "Tensor3", 4: "Tensor4",
             5: "Tensor5", 6: "Tensor6", 7: "Tensor7"}


def _format_array(arr):
    return "\n".join(repr(float(v)) for v in np.asarray(arr).ravel())


def _write_value(fh, value):
    if isinstance(value, str):
        fh.write(f'<String>\n"{value}"</String>\n')
    elif isinstance(value, (int, np.integer)):
        fh.write(f"<Index>{int(value)}</Index>\n")
    elif isinstance(value, (float, np.floating)):
        fh.write(f"<Numeric>{float(value)!r}</Numeric>\n")
    elif isinstance(value, dict) and "grids" in value:
        g = value
        n = len(g["grids"])
        fh.write(f'<GriddedField version="2" N="{n}">\n')
        _write_value(fh, g.get("name", ""))
        for nm in g.get("gridnames", [""] * n):
            _write_value(fh, nm)
        for grid in g["grids"]:
            _write_value(fh, np.asarray(grid))
        _write_value(fh, np.asarray(g["data"]))
        fh.write("</GriddedField>\n")
    elif isinstance(value, (list, tuple)):
        fh.write(f'<Array type="Array" nelem="{len(value)}">\n')
        for v in value:
            _write_value(fh, v)
        fh.write("</Array>\n")
    else:
        arr = np.asarray(value)
        tag = _RANK_TAG[max(arr.ndim, 1)]
        shape = " ".join(str(s) for s in (arr.shape if arr.ndim else (1,)))
        fh.write(
            f'<{tag} version="2" type="Numeric" rank="{max(arr.ndim, 1)}" '
            f'shape="{shape}">\n'
        )
        fh.write(_format_array(arr))
        fh.write(f"\n</{tag}>\n")


def save(value, path):
    """Write a value as ARTS-compatible ascii XML (numeric types, strings,
    arrays, gridded fields)."""
    with open(path, "w") as fh:
        fh.write('<?xml version="1.0"?>\n<arts version="3" format="ascii">\n')
        _write_value(fh, value)
        fh.write("</arts>\n")
