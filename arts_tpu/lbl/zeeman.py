"""Zeeman-split polarized absorption.

Parity reference: /root/reference/src/core/lbl/lbl_zeeman.{h,cpp} —
  - sublines: for polarization pi/sigma+/sigma- (dM = 0/+1/-1), lower-state
    M enumeration with strengths C * wigner3j(Jl, 1, Ju; Ml, dM, -Mu)^2,
    C = 1.5 (pi) / 0.75 (sigma) (lbl_zeeman.h:154) — with these factors the
    polarization-summed absorption reduces exactly to the unpolarized line
  - splitting: df = (mu_B/h) H (Mu gu - Ml gl) (lbl_zeeman.h:342)
  - Hund-case g-factors gu/gl stored per line (catalog data; SimpleGCaseB
    for O2-66 etc.)
  - geometry: theta (B vs LOS) and eta (polarization rotation) from
    magnetic_angles (lbl_zeeman.cpp:321-359); the 7-component polarization
    matrices per type (lbl_zeeman.cpp:413-455)

TPU-native design: Zeeman components become *pseudo-lines* — a static
host-side expansion (line index, polarization, splitting coefficient,
relative strength); the traced evaluation shifts each pseudo-line by
H * split and reuses the same lines x freqs Voigt contraction per
polarization, then assembles the full 7-component propagation matrix.
Hand-written dnorm_view_du/dv/dw derivative code in the reference is
replaced by autodiff through the angle formulas.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln

from .. import constants as const
from .catalog import LineCatalog
from .partfun import PartFunTable
from .voigt import _shape_sum, line_strengths, lineshape_params

POLS = ("pi", "sm", "sp")
DM = {"pi": 0, "sm": -1, "sp": 1}
POL_FACTOR = {"pi": 1.5, "sm": 0.75, "sp": 0.75}


def wigner3j_dipole(jl, ml, dm, ju):
    """wigner3j(Jl, 1, Ju; Ml, dM, -Mu) with Mu = Ml + dM (Racah formula,
    host-side; integers or half-integers)."""
    mu = ml + dm
    if abs(ml) > jl or abs(mu) > ju or abs(ju - jl) > 1 or ju + jl < 1:
        return 0.0

    def lf(x):
        return gammaln(x + 1.0)

    j1, j2, j3 = jl, 1.0, ju
    m1, m2, m3 = ml, dm, -mu
    # triangle coefficient
    pref = 0.5 * (
        lf(j1 + j2 - j3)
        + lf(j1 - j2 + j3)
        + lf(-j1 + j2 + j3)
        - lf(j1 + j2 + j3 + 1)
        + lf(j1 + m1)
        + lf(j1 - m1)
        + lf(j2 + m2)
        + lf(j2 - m2)
        + lf(j3 + m3)
        + lf(j3 - m3)
    )
    tmin = int(max(0.0, max(j2 - j3 - m1, j1 - j3 + m2)))
    tmax = int(min(j1 + j2 - j3, min(j1 - m1, j2 + m2)))
    s = 0.0
    for t in range(tmin, tmax + 1):
        denom = (
            lf(t)
            + lf(j3 - j2 + m1 + t)
            + lf(j3 - j1 - m2 + t)
            + lf(j1 + j2 - j3 - t)
            + lf(j1 - m1 - t)
            + lf(j2 + m2 - t)
        )
        s += (-1.0) ** t * math.exp(pref - denom)
    return (-1.0) ** int(round(j1 - j2 - m3)) * s


def zeeman_components(ju, jl, pol):
    """(ml array, mu array, strengths) for one line and polarization."""
    dm = DM[pol]
    C = POL_FACTOR[pol]
    mls, strengths = [], []
    m = -jl
    while m <= jl + 1e-9:
        w = wigner3j_dipole(jl, m, dm, ju)
        if w != 0.0:
            mls.append(m)
            strengths.append(C * w * w)
        m += 1.0
    mls = np.asarray(mls)
    return mls, mls + dm, np.asarray(strengths)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeemanCatalog:
    """Base catalog + per-polarization pseudo-line expansions."""

    cat: LineCatalog
    # per polarization (pi, sm, sp): padded arrays
    idx: tuple  # 3 x [K] int32 indices into cat lines
    split: tuple  # 3 x [K] splitting coefficients [Hz/T]
    strength: tuple  # 3 x [K] relative strengths


def expand_zeeman(cat: LineCatalog, ju, jl, gu_z, gl_z) -> ZeemanCatalog:
    """Host-side component expansion. ju/jl: [L] J quantum numbers;
    gu_z/gl_z: [L] Lande g factors (0 disables splitting for a line)."""
    C = const.bohr_magneton / const.h
    idx_t, split_t, strength_t = [], [], []
    for pol in POLS:
        ii, ss, st = [], [], []
        for l in range(cat.n_lines):
            if gu_z[l] == 0.0 and gl_z[l] == 0.0:
                # unsplit line: single component at zero shift, strength from
                # the 'no' polarization convention folded into pi? ARTS keeps
                # unsplit lines on the no-polarization path; we put the full
                # line in each of pi/sigma with the closure weights so the
                # summed propmat reduces to the isotropic line.
                ii.append(l)
                ss.append(0.0)
                st.append({"pi": 0.5, "sm": 0.25, "sp": 0.25}[pol])
                continue
            mls, mus, w = zeeman_components(float(ju[l]), float(jl[l]), pol)
            for k in range(len(w)):
                ii.append(l)
                ss.append(C * (mus[k] * gu_z[l] - mls[k] * gl_z[l]))
                st.append(w[k])
        idx_t.append(jnp.asarray(np.asarray(ii, dtype=np.int32)))
        split_t.append(jnp.asarray(np.asarray(ss)))
        strength_t.append(jnp.asarray(np.asarray(st)))
    return ZeemanCatalog(
        cat=cat, idx=tuple(idx_t), split=tuple(split_t), strength=tuple(strength_t)
    )


def magnetic_angles(mag, los_za_deg, los_aa_deg):
    """(H, theta, eta) from magnetic field [T] (u=E, v=N, w=Up) and LOS
    angles in degrees (lbl_zeeman.cpp:321-392)."""
    u, v, w = mag[..., 0], mag[..., 1], mag[..., 2]
    sa = jnp.sin(jnp.deg2rad(los_aa_deg))
    ca = jnp.cos(jnp.deg2rad(los_aa_deg))
    sz = jnp.sin(jnp.deg2rad(los_za_deg))
    cz = jnp.cos(jnp.deg2rad(los_za_deg))
    H = jnp.sqrt(u * u + v * v + w * w)
    uct = sz * sa * u + sz * ca * v + cz * w
    duct = u * sa * cz + v * ca * cz - w * sz
    safeH = jnp.where(H > 0, H, 1.0)
    theta = jnp.where(H > 0, jnp.arccos(jnp.clip(uct / safeH, -1.0, 1.0)), 0.0)
    eta = -jnp.arctan2(ca * u - sa * v, -duct)
    return H, theta, eta


def pol_matrices(theta, eta):
    """7-component polarization matrices per type (lbl_zeeman.cpp:413)."""
    CT = jnp.cos(theta)
    ST2 = jnp.sin(theta) ** 2
    Q = ST2 * jnp.cos(2 * eta)
    U = ST2 * jnp.sin(2 * eta)
    z = jnp.zeros_like(ST2)
    stack = lambda *c: jnp.stack(jnp.broadcast_arrays(*c), axis=-1)
    return {
        "pi": stack(ST2, -Q, U, z, z, U, Q),
        "sm": stack(2 - ST2, Q, -U, 2 * CT, -2 * CT, -U, -Q),
        "sp": stack(2 - ST2, Q, -U, -2 * CT, 2 * CT, -U, -Q),
    }


def zeeman_propmat(
    f_grid,
    zcat: ZeemanCatalog,
    pf: PartFunTable,
    T,
    P,
    vmr,
    mag,
    los_za_deg,
    los_aa_deg=0.0,
    block: int = 256,
    backend: str = "xla",
    tuning: tuple | None = None,
):
    """Full polarized propagation matrix [F, 7] at one atmospheric point.

    Parity: lbl voigt::lte::calculate with ZeemanPolarization pi/sm/sp
    (lbl_lineshape_voigt_lte.cpp:1652) — per-polarization Voigt sums scaled
    by the geometric polarization matrices.  backend="pallas" runs all
    three polarizations' pseudo-lines through the single polarized TPU
    kernel (ops.voigt_kernel.voigt_sum_pol): one shared w(z) evaluation
    feeding 7 weighted accumulator planes.
    """
    cat = zcat.cat
    ls = lineshape_params(cat, T, P, vmr)
    s, f0s, inv_gd, z_imag = line_strengths(cat, pf, T, P, vmr, ls)
    H, theta, eta = magnetic_angles(mag, los_za_deg, los_aa_deg)
    npm = pol_matrices(theta, eta)

    scl = -f_grid * jnp.expm1(-(const.h * f_grid) / (const.k * T))

    def pseudo_lines(p_i):
        idx = zcat.idx[p_i]
        f0_k = f0s[idx] + H * zcat.split[p_i]
        # note: ARTS updates inv_gd with the shifted f0 (update_iz); the
        # relative shift is ~1e-6 so we follow the same recipe
        gd_part = jnp.sqrt(
            const.doppler_broadening_const_squared * T / cat.iso_mass[idx]
        )
        inv_gd_k = 1.0 / (gd_part * f0_k)
        z_imag_k = ls[idx, 0] * inv_gd_k  # G0 * inv_gd
        s_k = (
            zcat.strength[p_i]
            * s[idx]
            * (inv_gd_k / inv_gd[idx])  # strength carries inv_gd factor
        )
        return idx, f0_k, inv_gd_k, z_imag_k, s_k

    if backend == "pallas":
        from ..ops.voigt_kernel import voigt_sum_pol
        from ..ops.wofz import wofz

        parts = [pseudo_lines(p_i) for p_i in range(len(POLS))]
        idx_a = jnp.concatenate([p[0] for p in parts])
        f0_a = jnp.concatenate([p[1] for p in parts])
        igd_a = jnp.concatenate([p[2] for p in parts])
        zi_a = jnp.concatenate([p[3] for p in parts])
        s_a = jnp.concatenate([p[4] for p in parts])
        pw = jnp.concatenate(
            [
                jnp.broadcast_to(
                    npm[pol][None, :], (zcat.idx[p_i].shape[0], 7)
                )
                for p_i, pol in enumerate(POLS)
            ]
        )
        cut = cat.cutoff[idx_a]
        has_cut = jnp.isfinite(cut)
        cut_safe = jnp.where(has_cut, cut, 0.0)
        wcut = jnp.where(
            has_cut, wofz(jax.lax.complex(igd_a * cut_safe, zi_a)), 0.0
        )
        cut_k = jnp.where(has_cut, cut, 1e30)
        anchor = jnp.mean(f_grid)
        tune = dict(tf=512, tl=512)
        if tuning is not None:
            tune = dict(
                zip(("tf", "tl", "max_visits", "mp_terms", "mp_kappa",
                     "nsub"), tuning)
            )
        out7 = voigt_sum_pol(
            f_grid - anchor,
            f0_a - anchor,
            igd_a,
            zi_a,
            jnp.real(s_a),
            jnp.imag(s_a),
            cut_k,
            jnp.real(wcut),
            jnp.imag(wcut),
            pw,
            n=16 if f_grid.dtype == jnp.float32 else 24,
            **tune,
        )
        return scl[:, None] * out7.T

    pm = jnp.zeros(f_grid.shape + (7,), dtype=f_grid.dtype)
    for p_i, pol in enumerate(POLS):
        _, f0_k, inv_gd_k, z_imag_k, s_k = pseudo_lines(p_i)
        shape = _shape_sum(
            f_grid, s_k, f0_k, inv_gd_k, z_imag_k, cat.cutoff[zcat.idx[p_i]],
            block,
        )
        pm = pm + npm[pol][None, :] * (scl * jnp.real(shape))[:, None]
    return pm


def tune_zeeman_kernel(
    f_grid, zcat: ZeemanCatalog, pf, T, P, vmr, mag,
    tf: int = 512, tl: int = 512,
    mp_terms: int = 12, mp_kappa: float = 3.5, slack: int = 2,
    nsub: int = 1,
):
    """Concrete-input (outside-jit) tuner for zeeman_propmat's pallas
    backend: exact static max_visits over a set of atmospheric points,
    mirroring the pseudo-line construction eagerly on CPU.

    Returns (tf, tl, max_visits, mp_terms, mp_kappa, nsub) for the
    ``tuning`` argument.  Zeeman pseudo-lines of one parent spread only
    ~MHz, so small tl makes the multipole collapse nearly the whole
    cutoff window — max_visits then shrinks from nl to a few dozen.
    """
    import numpy as np

    from ..ops.voigt_kernel import voigt_visit_bound

    cat = jax.tree_util.tree_map(np.asarray, zcat.cat)
    zsplit = [np.asarray(s) for s in zcat.split]
    zidx = [np.asarray(i) for i in zcat.idx]
    pf = jax.tree_util.tree_map(np.asarray, pf)
    T = np.asarray(T)
    P = np.asarray(P)
    vmr = np.asarray(vmr)
    H = float(np.sqrt(np.sum(np.asarray(mag) ** 2)))
    anchor = float(np.asarray(f_grid).mean())
    bound = 0
    with jax.default_device(jax.devices("cpu")[0]):
        for z in range(T.shape[0]):
            ls = lineshape_params(cat, T[z], P[z], vmr[z])
            _, f0s, inv_gd, z_imag = line_strengths(
                cat, pf, T[z], P[z], vmr[z], ls
            )
            f0s = np.asarray(f0s)
            G0 = np.asarray(ls[:, 0])
            f0_a, igd_a, zi_a, cut_a = [], [], [], []
            for p_i in range(len(POLS)):
                idx = zidx[p_i]
                f0_k = f0s[idx] + H * zsplit[p_i]
                gd_part = np.sqrt(
                    const.doppler_broadening_const_squared
                    * T[z] / np.asarray(cat.iso_mass)[idx]
                )
                igd_k = 1.0 / (gd_part * f0_k)
                f0_a.append(f0_k)
                igd_a.append(igd_k)
                zi_a.append(G0[idx] * igd_k)
                cut_a.append(np.asarray(cat.cutoff)[idx])
            f0_a = np.concatenate(f0_a)
            igd_a = np.concatenate(igd_a)
            zi_a = np.concatenate(zi_a)
            cut_a = np.where(
                np.isfinite(np.concatenate(cut_a)),
                np.concatenate(cut_a), 1e30,
            )
            bound = max(
                bound,
                voigt_visit_bound(
                    np.asarray(f_grid) - anchor, f0_a - anchor, igd_a,
                    zi_a, cut_a, tf=tf, tl=tl,
                    mp_terms=mp_terms, mp_kappa=mp_kappa, nsub=nsub,
                ),
            )
    return (tf, tl, bound + slack, mp_terms, mp_kappa, nsub)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedZeemanCatalog:
    """Bucketed component-major Zeeman layout for the TPU parent-pole path.

    Each pole is one parent line (or a co-located chunk of a parent with
    more than the largest bucket's components); its Zeeman components
    live in a [CM, NP] slot grid (strength 0 padding), where CM is the
    smallest bucket size covering the parent's component count.  Dense
    slot sums replace pseudo-line gathers and segment reductions, which
    dominate the runtime of the ragged layout on TPU; bucketing by
    component count removes the 2-3x slot-padding waste a single cmax
    grid pays (typical catalogs mix 3-component H2O parents with
    100+-component high-J O2 parents), and component-major order keeps
    the pad on the 8-wide sublane axis instead of the 128-wide lanes."""

    cat: LineCatalog
    parent: tuple   # per bucket: [NP_b] int32 line index of each pole
    split: tuple    # per bucket: [CM_b, NP_b] splitting coeffs [Hz/T]
    strength: tuple  # per bucket: [CM_b, NP_b] rel strengths (0 = pad)
    polidx: tuple   # per bucket: [CM_b, NP_b] int32 pol 0/1/2 (pi,sm,sp)


def pad_zeeman_catalog(
    zcat: ZeemanCatalog,
    cmax: int | None = None,
    buckets: tuple = (4, 16, 64, 128),
):
    """Host-side conversion ZeemanCatalog -> PaddedZeemanCatalog.

    Each parent goes to the smallest bucket holding its component
    count; parents beyond the largest bucket are split into several
    co-located poles (identical centers; the expansion is additive).
    cmax forces the single-bucket legacy layout."""
    if cmax is not None:
        buckets = (int(cmax),)
    buckets = tuple(sorted(set(int(b) for b in buckets)))
    bmax = buckets[-1]
    n = int(zcat.cat.f0.shape[0])
    per_parent = [[] for _ in range(n)]
    for p_i in range(len(POLS)):
        idx = np.asarray(zcat.idx[p_i])
        spl = np.asarray(zcat.split[p_i])
        st = np.asarray(zcat.strength[p_i])
        for k in range(idx.shape[0]):
            per_parent[int(idx[k])].append((spl[k], st[k], p_i))
    groups = {b: [] for b in buckets}  # bucket -> [(parent, comps)]
    for p in range(n):
        comps = per_parent[p]
        # parents beyond the largest bucket split into bmax-sized chunks;
        # every chunk (incl. a short remainder) then buckets by its OWN
        # length, so a 130-component parent costs 128 + 4 slots, not 256
        for o in range(0, max(len(comps), 1), bmax):
            chunk = comps[o:o + bmax]
            if not chunk:
                continue
            b = next(bb for bb in buckets if len(chunk) <= bb)
            groups[b].append((p, chunk))
    parent_t, split_t, strength_t, polidx_t = [], [], [], []
    for b in buckets:
        rows = groups[b]
        if not rows:
            continue
        NP = len(rows)
        split = np.zeros((b, NP))
        strength = np.zeros((b, NP))
        polidx = np.zeros((b, NP), np.int32)
        for r, (p, comps) in enumerate(rows):
            for c, (sp, st, p_i) in enumerate(comps):
                split[c, r] = sp
                strength[c, r] = st
                polidx[c, r] = p_i
        parent_t.append(
            jnp.asarray(np.asarray([p for p, _ in rows], np.int32))
        )
        split_t.append(jnp.asarray(split))
        strength_t.append(jnp.asarray(strength))
        polidx_t.append(jnp.asarray(polidx))
    return PaddedZeemanCatalog(
        cat=zcat.cat,
        parent=tuple(parent_t),
        split=tuple(split_t),
        strength=tuple(strength_t),
        polidx=tuple(polidx_t),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mp_terms", "mp_kappa", "tf", "pb", "noff", "interpret"),
)
def zeeman_propmat_profile(
    f_grid,
    zcat: ZeemanCatalog,
    pf: PartFunTable,
    T,
    P,
    vmr,
    mag,
    los_za_deg,
    los_aa_deg=0.0,
    mp_terms: int = 5,
    mp_kappa: float = 6.0,
    tf: int = 2048,
    pb: int = 256,
    noff: int = 6,
    interpret: bool = False,
):
    """Polarized propagation matrices for a whole profile: [Z, F, 7].

    The TPU-fast Zeeman path: Zeeman components of one parent line spread
    only ~MHz (lbl_zeeman.h:342) while the asymptotic radius is ~10 MHz,
    so beyond a tiny per-parent near radius the component structure
    provably collapses into a parent-pole expansion — the contraction
    shrinks from (pseudo-lines x freqs) to (parents x freqs), evaluated
    by ops.zeeman_mp_kernel in one pallas launch over all levels, with
    the few near grid points per parent corrected exactly in XLA.
    T/P: [Z]; vmr: [Z, S]; mag: [3] (u, v, w in T).
    Equivalent math to vmapping zeeman_propmat over levels; tested
    against it.  noff must cover ceil(max r_near / grid spacing) + 1
    (see tune_zeeman_profile).
    """
    from ..ops.voigt_kernel import _wofz_parts
    from ..ops.zeeman_mp_kernel import (
        near_correction,
        zeeman_mp_eval,
        zeeman_pole_moments,
    )

    if not isinstance(zcat, PaddedZeemanCatalog):
        raise TypeError(
            "zeeman_propmat_profile needs a PaddedZeemanCatalog — convert "
            "once at scene build with pad_zeeman_catalog(zcat)"
        )
    if not zcat.parent:
        raise ValueError(
            "empty PaddedZeemanCatalog (no Zeeman components); nothing "
            "to evaluate — guard the caller or use zeeman_propmat"
        )
    cat = zcat.cat
    H, theta, eta = magnetic_angles(mag, los_za_deg, los_aa_deg)
    npm = pol_matrices(theta, eta)
    pw_tab = jnp.stack([npm[pol] for pol in POLS])  # [3, 7]
    cut_parent = jnp.where(jnp.isfinite(cat.cutoff), cat.cutoff, 1e30)
    wn = 16 if f_grid.dtype == jnp.float32 else 24

    def level(Tz, Pz, vz):
        ls = lineshape_params(cat, Tz, Pz, vz)
        s, f0s, inv_gd, z_imag = line_strengths(cat, pf, Tz, Pz, vz, ls)
        return s, f0s, inv_gd, ls[:, 0]

    s_l, f0_l, igd_l, g0_l = jax.vmap(level)(T, P, vmr)  # [Z, L]
    gd_c = jnp.sqrt(
        const.doppler_broadening_const_squared
        * T[:, None] / cat.iso_mass[None, :]
    )  # [Z, L]

    anchor = jnp.mean(f_grid)
    # per component-count bucket (pad_zeeman_catalog): strength algebra,
    # cutoff-subtraction w(z) (real-pair — no complex dtypes, and
    # outside any vmap: pl.reciprocal inside _wofz_parts has no vmap
    # batching rule) and pole moments on that bucket's [Z, CM_b, NP_b]
    # grid; the per-pole results concatenate for one kernel launch
    moms, bucket_grids = [], []
    for parent_b, split_b, strength_b, polidx_b in zip(
        zcat.parent, zcat.split, zcat.strength, zcat.polidx
    ):
        pw_k = pw_tab[polidx_b]  # [CM_b, NP_b, 7]
        cut_b = cut_parent[parent_b]  # [NP_b]
        at = lambda x: x[:, parent_b][:, None, :]  # [Z, L] -> [Z, 1, NP_b]
        f0_k = at(f0_l) + H * split_b[None]  # [Z, CM_b, NP_b]
        igd_k = 1.0 / (at(gd_c) * f0_k)
        zi_k = at(g0_l) * igd_k
        s_k = strength_b[None] * at(s_l) * (igd_k / at(igd_l))
        sr_k, si_k = jnp.real(s_k), jnp.imag(s_k)
        wcr, wci = _wofz_parts(igd_k * cut_b[None, None, :], zi_k, wn)
        swc_k = sr_k * wcr - si_k * wci
        moms.append(
            jax.vmap(
                lambda f0z, igdz, ziz, srz, siz, swcz: zeeman_pole_moments(
                    f0z - anchor, igdz, ziz, srz, siz, swcz, pw_k,
                    mp_terms, mp_kappa,
                )
            )(f0_k, igd_k, zi_k, sr_k, si_k, swc_k)
        )
        bucket_grids.append((cut_b, f0_k, igd_k, zi_k, sr_k, si_k, pw_k))
    catp = lambda key: jnp.concatenate([m[key] for m in moms], axis=1)

    out = zeeman_mp_eval(
        f_grid - anchor, catp("c_re"), catp("g0"), catp("R"),
        catp("rnear2"),
        jnp.concatenate([g[0] for g in bucket_grids]),
        catp("M_re"), catp("M_im"), catp("swcsum"),
        terms=mp_terms, tf=tf, pb=pb, interpret=interpret,
    )
    for mom, (cut_b, f0_k, igd_k, zi_k, sr_k, si_k, pw_k) in zip(
        moms, bucket_grids
    ):
        out = near_correction(
            f_grid - anchor, out, mom["c_re"], mom["g0"], mom["rnear"],
            cut_b, f0_k - anchor, igd_k, zi_k, sr_k, si_k, pw_k,
            noff=noff, wofz_n=wn,
        )
    scl = -f_grid[None, :] * jnp.expm1(
        -(const.h * f_grid[None, :]) / (const.k * T[:, None])
    )  # [Z, F]
    return scl[:, :, None] * jnp.moveaxis(out[:, :7, :], 1, 2)


def tune_zeeman_profile(
    f_grid, pzcat=None, t_max: float = 320.0, mp_kappa: float = 6.0,
) -> dict:
    """Static knobs for zeeman_propmat_profile on a concrete f_grid:
    noff large enough that the near-correction candidates cover the
    worst-case near radius — max(kappa R, R + 32 Doppler widths) from the
    actual catalog's component spreads — at this grid's spacing."""
    fg = np.asarray(f_grid)
    df = np.diff(fg).min() if fg.size > 1 else 1.0
    if pzcat is not None:
        H_ref = 1e-4  # conservative field bound [T]
        spread = max(
            (float(np.abs(np.asarray(s)).max()) for s in pzcat.split),
            default=0.0,
        ) * H_ref
        m_min = float(np.asarray(pzcat.cat.iso_mass).min())
    else:
        spread, m_min = 6e7, 2.0 * 1.66e-27
    gd_max = float(fg.max()) * float(
        np.sqrt(const.doppler_broadening_const_squared * t_max / m_min)
    )
    R_max = max(spread, gd_max)
    r_max = max(mp_kappa * R_max, R_max + 32.0 * gd_max)
    return dict(noff=int(np.ceil(2 * r_max / df)) + 2, mp_kappa=mp_kappa)
