"""HITRAN .par (160-char fixed-width) line catalog reader.

Parity reference: /root/reference/src/core/lbl/lbl_hitran.cpp —
read_par_line (:66, field widths and unit conversions) and
hitran_record::from (:179, Einstein-A from S via einstein_a,
lbl_data.cpp:34; line-shape model = T1 G0 self/air + T0 D0).
"""

import dataclasses
import math

import numpy as np

from .. import constants as const
from ..lbl.tmodel import Law
from .species import ISOTOPOLOGUES

# HITRAN molecule number -> (species, [iso code per local iso number])
HITRAN_MOLECULES = {
    1: ("H2O", ["161", "181", "171", "162", "182", "172", "262"]),
    2: ("CO2", ["626", "636", "628", "627", "638", "637", "828", "827"]),
    3: ("O3", ["666", "668", "686", "667", "676"]),
    4: ("N2O", ["446", "456", "546", "448", "447"]),
    5: ("CO", ["26", "36", "28", "27", "38", "37"]),
    6: ("CH4", ["211", "311", "212", "312"]),
    7: ("O2", ["66", "68", "67"]),
    8: ("NO", ["46", "56", "48"]),
    9: ("SO2", ["626", "646"]),
    10: ("NO2", ["646"]),
    11: ("NH3", ["4111", "5111"]),
    12: ("HNO3", ["146"]),
    13: ("OH", ["61", "81", "62"]),
    14: ("HF", ["19"]),
    15: ("HCl", ["15", "17"]),
    18: ("ClO", ["56", "76"]),
    19: ("OCS", ["622", "624", "632", "623", "822"]),
    20: ("H2CO", ["126", "136", "128"]),
    22: ("N2", ["44", "45"]),
    23: ("HCN", ["124", "134", "125"]),
    45: ("H2", ["11", "12"]),
    31: ("H2S", ["121", "141", "131"]),
}

_KAYCM2HZ = 100.0 * const.c
_ATM = 101325.0


@dataclasses.dataclass
class HitranRecord:
    isotopologue: str
    f0: float  # Hz
    S: float  # Hz m^2 (line intensity, SI)
    A: float  # Einstein A [1/s]
    gamma_air: float  # Hz/Pa
    gamma_self: float  # Hz/Pa
    e0: float  # J
    n_air: float
    delta_air: float  # Hz/Pa
    g_upp: float
    g_low: float
    q_upper: str
    q_lower: str
    q_local_upper: str = ""
    q_local_lower: str = ""
    state: object = None  # QuantumState from the extended format


def parse_par_line(line: str) -> HitranRecord:
    """One .par record; the extended arts format (lbl_hitran.cpp:92
    read_hitran_par_record with [par, statep, statepp] order) appends
    comma-separated 'key=value;...' quantum states after column 160 —
    captured into .state when present."""
    mol = int(line[0:2])
    iso_ch = line[2]
    iso = int(iso_ch, 36) if not iso_ch.isdigit() else int(iso_ch)  # 'A' = 10
    if mol not in HITRAN_MOLECULES:
        raise KeyError(
            f"unknown HITRAN molecule number {mol} (extend HITRAN_MOLECULES)"
        )
    spec, isos = HITRAN_MOLECULES[mol]
    if not 1 <= iso <= len(isos):
        raise KeyError(f"unknown isotopologue {iso} for {spec}")
    isot = f"{spec}-{isos[iso - 1]}"
    return HitranRecord(
        isotopologue=isot,
        f0=float(line[3:15]) * _KAYCM2HZ,
        S=float(line[15:25]) * _KAYCM2HZ * 1e-4,
        A=float(line[25:35]),
        gamma_air=float(line[35:40]) * _KAYCM2HZ / _ATM,
        gamma_self=float(line[40:45]) * _KAYCM2HZ / _ATM,
        e0=float(line[45:55]) * const.h * _KAYCM2HZ,
        n_air=float(line[55:59]),
        delta_air=float(line[59:67]) * _KAYCM2HZ / _ATM,
        g_upp=float(line[146:153]),
        g_low=float(line[153:160]),
        q_upper=line[67:82].strip(),
        q_lower=line[82:97].strip(),
        q_local_upper=line[97:112],
        q_local_lower=line[112:127],
        state=_trailing_state(line),
    )


def _trailing_state(line: str):
    """Extended-format trailing quantum states (after column 160)."""
    rest = line.rstrip("\n")[160:]
    if not rest.startswith(","):
        return None
    parts = rest.split(",")
    if len(parts) < 3:
        return None
    from .quantum import from_hitran

    return from_hitran(parts[1], parts[2])


def record_state(rec: HitranRecord):
    """Best-available QuantumState for a record: the extended trailing
    states when present, else the classic global+local quanta fields."""
    if rec.state is not None:
        return rec.state
    from .quantum import (
        global_quanta_diatomic,
        local_quanta_diatomic,
        merge_states,
    )

    loc = local_quanta_diatomic(rec.q_local_upper, rec.q_local_lower)
    glo = global_quanta_diatomic(rec.q_upper, rec.q_lower)
    if loc is None and not (glo.upper or glo.lower):
        return None
    return merge_states(glo, loc)


_BRANCH = {"O": -2, "P": -1, "Q": 0, "R": 1, "S": 2}


def parse_o2_local_quanta(rec: HitranRecord):
    """(Nu, Nl, Ju, Jl) from the O2 .par local lower quanta.

    HITRAN group-2 format for O2 Q'': [dN-branch][N''] [dJ-branch][J'']
    (e.g. " Q  3 Q  4"); N' = N'' + dN, J' = J'' + dJ.  Returns None if
    the field does not parse (non-O2 or unusual tagging).
    """
    import re

    m = re.findall(r"([OPQRS])\s*(\d+)", rec.q_local_lower)
    if len(m) < 2:
        return None
    (bn, nl), (bj, jl) = m[0], m[1]
    Nl, Jl = float(nl), float(jl)
    return Nl + _BRANCH[bn], Nl, Jl + _BRANCH[bj], Jl


def o2_lines_from_par(records, pf_Q296, iso_abundance=0.995262,
                      zeeman=True):
    """O2-66 line dicts for lbl.ecs.make_o2_band (and Zeeman g's) from
    parsed .par records.  Skips records whose quanta do not parse.

    Returns (lines, gus, gls): make_o2_band inputs plus per-line Lande
    g's from the advanced O2 model (lbl_zeeman.cpp GetAdvancedModel)."""
    from ..lbl.zeeman_g import o2_line_g

    lines, gus, gls = [], [], []
    for r in records:
        if not r.isotopologue.startswith("O2-66"):
            continue
        qn = parse_o2_local_quanta(r)
        if qn is None:
            continue
        Nu, Nl, Ju, Jl = qn
        a = r.A if r.A > 0 else einstein_a_from_s(
            r.S, r.g_upp, r.e0, r.f0, pf_Q296, iso_abundance
        )
        lines.append(dict(
            f0=r.f0, a=a, e0=r.e0, gu=r.g_upp,
            Ju=Ju, Jl=Jl, Nu=Nu, Nl=Nl,
            g0=(r.gamma_air, r.n_air), d0=(r.delta_air, 0.0), t0=296.0,
        ))
        if zeeman:
            gu, gl = o2_line_g(Ju, Jl, Nu, Nl)
            gus.append(gu)
            gls.append(gl)
    return lines, gus, gls


def einstein_a_from_s(S, gu, e0, f0, Q296, iso_abundance, T0=296.0):
    """A from the HITRAN intensity (lbl_data.cpp:34 einstein_a with the
    abundance de-weighting of lbl_data.cpp:164 hitran_a).  Q296 is the
    partition function at T0 (ARTSCAT records may use T0 != 296 K)."""
    s = S / iso_abundance
    return (
        -8.0
        * math.pi
        * Q296
        * s
        / (
            gu
            * math.exp(-e0 / (const.k * T0))
            * math.expm1(-(const.h * f0) / (const.k * T0))
            * (const.c / f0) ** 2
        )
    )


def read_par_records(path_or_lines, fmin=0.0, fmax=np.inf):
    """Parse a .par file (or list of rows) into HitranRecords."""
    if isinstance(path_or_lines, (list, tuple)):
        rows = path_or_lines
    else:
        with open(path_or_lines) as fh:
            rows = fh.readlines()
    out = []
    for row in rows:
        if len(row.rstrip("\n")) < 120:
            continue
        try:
            r = parse_par_line(row)
        except KeyError:  # molecule/isotopologue outside the registry
            continue
        if fmin <= r.f0 <= fmax:
            out.append(r)
    return out


def read_par(
    path_or_lines,
    species_list,
    q296=None,
    strength_option="S",
    cutoff=np.inf,
    fmin=0.0,
    fmax=np.inf,
):
    """Read a .par file into build_catalog line dicts.

    species_list: VMR-vector species tags; lines of other species skipped.
    q296: {isotopologue: Q(296K)} needed when strength_option == "S".

    iso_idx is assigned by FIRST APPEARANCE of each isotopologue in the
    (frequency-ordered) input; build the PartFunTable rows in the same
    order (iso_index_of_lines recovers the mapping).
    """
    if isinstance(path_or_lines, (list, tuple)):
        rows = path_or_lines
    else:
        with open(path_or_lines) as fh:
            rows = fh.readlines()
    out = []
    iso_ids = {}
    for row in rows:
        if len(row.rstrip("\n")) < 120:
            continue
        try:
            r = parse_par_line(row)
        except KeyError:
            continue
        if not (fmin <= r.f0 <= fmax):
            continue
        meta = ISOTOPOLOGUES.get(r.isotopologue)
        if meta is None or meta.species not in species_list:
            continue
        spec_idx = species_list.index(meta.species)
        iso_idx = iso_ids.setdefault(r.isotopologue, len(iso_ids))
        if strength_option == "S":
            if q296 is None or r.isotopologue not in q296:
                raise KeyError(
                    f"Q(296) required for {r.isotopologue} with strength 'S'"
                )
            a = einstein_a_from_s(
                r.S, r.g_upp, r.e0, r.f0, q296[r.isotopologue], meta.abundance
            )
        else:
            a = r.A
        ls = {
            spec_idx: {"G0": (Law.T1, [r.gamma_self, r.n_air])},
            "bath": {"G0": (Law.T1, [r.gamma_air, r.n_air])},
        }
        if r.delta_air != 0.0:
            ls[spec_idx]["D0"] = (Law.T0, [r.delta_air])
            ls["bath"]["D0"] = (Law.T0, [r.delta_air])
        out.append(
            dict(
                f0=r.f0,
                a=a,
                e0=r.e0,
                gu=r.g_upp,
                gl=r.g_low,
                iso_mass=meta.mass,
                iso_ratio=meta.abundance,
                spec_idx=spec_idx,
                iso_idx=iso_idx,
                band_idx=0,
                t0=296.0,
                cutoff=cutoff,
                ls=ls,
                isotopologue=r.isotopologue,
            )
        )
    return out


def iso_index_of_lines(lines):
    """{isotopologue: iso_idx} as assigned by read_par (first appearance)."""
    out = {}
    for l in lines:
        tag = l.get("isotopologue")
        if tag is not None and tag not in out:
            out[tag] = l["iso_idx"]
    return out


def assign_iso_indices(lines):
    """Reassign iso_idx uniformly by isotopologue tag (first appearance).

    Multi-reader ingestion (ARTSCAT + AbsorptionBand files, split files
    repeating an isotopologue) must not let per-file iso_start arithmetic
    decide partition-function rows: two readers can otherwise hand the
    same tag two different indices (or two tags the same index) depending
    on file order.  One pass over the merged list makes the mapping a
    pure function of the line ordering.  Returns {tag: iso_idx}.
    """
    ids = {}
    for l in lines:
        tag = l.get("isotopologue")
        if tag is None:
            continue
        l["iso_idx"] = ids.setdefault(tag, len(ids))
    return ids


def catalog_from_par(
    path, species_list, q296=None, strength_option="S", cutoff=np.inf,
    fmin=0.0, fmax=np.inf, n_perturbers=2,
):
    """Vectorized .par -> LineCatalog using the native loader when present.

    Builds the struct-of-arrays catalog directly (no per-line dicts) —
    the production ingestion path for multi-million-line catalogs.
    """
    import jax.numpy as jnp

    from ..lbl.catalog import BATH, LineCatalog
    from ..lbl.tmodel import NV

    try:
        from .native import read_par_arrays

        arr = read_par_arrays(path)
    except Exception:
        # pure-python fallback through the dict path
        from ..lbl.catalog import build_catalog

        lines = read_par(
            path, species_list, q296=q296, strength_option=strength_option,
            cutoff=cutoff, fmin=fmin, fmax=fmax,
        )
        lines.sort(key=lambda r: r["f0"])
        return build_catalog(lines, n_perturbers=n_perturbers)

    f0 = arr["nu"] * _KAYCM2HZ
    keep = (f0 >= fmin) & (f0 <= fmax)
    # resolve isotopologues + species indices (vectorized via lookup tables)
    spec_idx = np.full(arr["mol"].shape, -1, np.int32)
    mass = np.zeros(arr["mol"].shape)
    ratio = np.ones(arr["mol"].shape)
    iso_name = np.empty(arr["mol"].shape, object)
    for m, (tag, isos) in HITRAN_MOLECULES.items():
        if tag not in species_list:
            continue
        si = species_list.index(tag)
        for k, code in enumerate(isos):
            sel = (arr["mol"] == m) & (arr["iso"] == k + 1)
            meta = ISOTOPOLOGUES.get(f"{tag}-{code}")
            if meta is None:
                continue
            spec_idx[sel] = si
            mass[sel] = meta.mass
            ratio[sel] = meta.abundance
            iso_name[sel] = meta.name
    keep &= spec_idx >= 0
    idx = np.nonzero(keep)[0]
    L = idx.size

    e0 = arr["E"][idx] * const.h * _KAYCM2HZ
    gup = arr["gup"][idx]
    glow = arr["glow"][idx]
    f0k = f0[idx]
    if strength_option == "S":
        Svals = arr["S"][idx] * _KAYCM2HZ * 1e-4
        T0 = 296.0
        q = np.array([q296[nm] for nm in iso_name[idx]])
        a = (
            -8.0 * np.pi * q * (Svals / ratio[idx])
            / (
                gup
                * np.exp(-e0 / (const.k * T0))
                * np.expm1(-(const.h * f0k) / (const.k * T0))
                * (const.c / f0k) ** 2
            )
        )
    else:
        a = arr["A"][idx]

    from ..lbl.tmodel import Law

    ls_spec = np.empty((L, 2), np.int32)
    ls_spec[:, 0] = spec_idx[idx]  # self
    ls_spec[:, 1] = BATH
    ls_law = np.zeros((L, 2, NV), np.int32)
    ls_x = np.zeros((L, 2, NV, 4))
    gair = arr["gair"][idx] * _KAYCM2HZ / _ATM
    gself = arr["gself"][idx] * _KAYCM2HZ / _ATM
    nair = arr["nair"][idx]
    delta = arr["delta"][idx] * _KAYCM2HZ / _ATM
    ls_law[:, 0, 0] = Law.T1  # self G0
    ls_x[:, 0, 0, 0] = gself
    ls_x[:, 0, 0, 1] = nair
    ls_law[:, 1, 0] = Law.T1  # air G0
    ls_x[:, 1, 0, 0] = gair
    ls_x[:, 1, 0, 1] = nair
    has_d = delta != 0.0
    ls_law[:, 0, 1] = np.where(has_d, Law.T0, 0)
    ls_x[:, 0, 1, 0] = np.where(has_d, delta, 0.0)
    ls_law[:, 1, 1] = np.where(has_d, Law.T0, 0)
    ls_x[:, 1, 1, 0] = np.where(has_d, delta, 0.0)

    order = np.argsort(f0k)  # sorted by f0 (cutoff block-skip locality)
    # iso_idx by first appearance in frequency order (same convention as
    # the dict path; vectorized for multi-million-line catalogs)
    names_sorted = iso_name[idx][order].astype(str)
    _, first_idx, inv = np.unique(
        names_sorted, return_index=True, return_inverse=True
    )
    rank = np.argsort(np.argsort(first_idx)).astype(np.int32)
    iso_idx_arr = rank[inv]
    j = jnp.asarray
    return LineCatalog(
        f0=j(f0k[order]),
        a=j(a[order]),
        e0=j(e0[order]),
        gu=j(gup[order]),
        gl=j(glow[order]),
        iso_mass=j(mass[idx][order]),
        iso_ratio=j(ratio[idx][order]),
        spec_idx=j(spec_idx[idx][order]),
        iso_idx=j(iso_idx_arr),
        band_idx=j(np.zeros(L, np.int32)),
        t0=j(np.full(L, 296.0)),
        cutoff=j(np.full(L, cutoff)),
        ls_spec=j(ls_spec[order]),
        ls_law=j(ls_law[order]),
        ls_x=j(ls_x[order]),
    )


def zeeman_catalog_from_par(
    path_or_lines,
    species_list,
    q296=None,
    strength_option="S",
    cutoff=np.inf,
    fmin=0.0,
    fmax=np.inf,
):
    """ZeemanCatalog straight from a .par file — no user-supplied g's.

    Per line the quantum state comes from record_state (extended trailing
    states or classic diatomic quanta) and the Lande g's from
    io.quantum.zeeman_g (GetAdvancedModel + SimpleG parity,
    lbl_zeeman.cpp:122-261); lines whose state lacks J are kept unsplit
    (g = 0), matching the reference's "no Zeeman effect" fallback.
    """
    from ..lbl.catalog import build_catalog
    from ..lbl.zeeman import expand_zeeman
    from .quantum import zeeman_g

    lines = read_par(
        path_or_lines, species_list, q296=q296,
        strength_option=strength_option, cutoff=cutoff, fmin=fmin, fmax=fmax,
    )
    records = [
        r for r in read_par_records(path_or_lines, fmin=fmin, fmax=fmax)
        if ISOTOPOLOGUES.get(r.isotopologue) is not None
        and ISOTOPOLOGUES[r.isotopologue].species in species_list
    ]
    assert len(records) == len(lines)
    jus, jls, gus, gls = [], [], [], []
    for r in records:
        st = record_state(r)
        if st is None or not st.has("J"):
            jus.append(0.0)
            jls.append(0.0)
            gus.append(0.0)
            gls.append(0.0)
            continue
        ju, jl = st.at("J")
        gu, gl = zeeman_g(r.isotopologue, st)
        jus.append(float(ju))
        jls.append(float(jl))
        gus.append(gu)
        gls.append(gl)
    order = np.argsort([l["f0"] for l in lines])
    lines = [lines[i] for i in order]
    reorder = lambda a: [a[i] for i in order]
    cat = build_catalog(lines)
    return expand_zeeman(cat, reorder(jus), reorder(jls),
                         reorder(gus), reorder(gls))
