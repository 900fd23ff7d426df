"""Voigt LTE line-by-line absorption — the framework's #1 hot path.

Parity reference: /root/reference/src/core/lbl/lbl_lineshape_voigt_lte.cpp
  - single_shape (:230-244): z = inv_gd*(f - f0') + i*G0*inv_gd,
    F = Faddeeva::w(z), strength = inv_sqrt_pi*inv_gd*r*x*(1+G-iY)*s(T,Q)
  - line strength s(T,Q) = a*gu*exp(-e0/kT)/(f0^3*Q)   (lbl_data.h:66)
  - prefactor scl = -N*f*expm1(-h f/k T)*c^2/(8 pi)    (:936-956)
  - cutoff "ByLine": subtract the complex shape at f0'+cutoff inside the
    window |f-f0'| <= cutoff, zero outside (lbl_lineshape_voigt_lte.cpp
    core_calc + frequency_spans)
  - line-shape parameter mixing over perturbers (lbl_lineshape_model.cpp:70-92)

The reference hand-codes ~2000 LoC of analytic derivatives of all of this;
here the whole computation is differentiable JAX (custom JVP only inside
wofz), so Jacobians come from autodiff.

Shapes: L lines, F frequencies. The dense [L, F] complex evaluation is
expressed as a lax.map over line blocks to bound memory; the Pallas kernel
in ops/voigt_kernel.py implements the same contraction tiled for VMEM.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .. import constants as const
from ..ops.wofz import wofz
from .catalog import BATH, PAD, LineCatalog
from .partfun import PartFunTable
from .tmodel import IDV, IG, IG0, ID0, IY, NV, P_POW, eval_law


def lineshape_params(cat: LineCatalog, T, P, vmr):
    """Evaluate the 9 line-shape variables for every line at (T, P, vmr).

    Returns [L, NV] array ordered as tmodel.VARS.
    Mixing rule (lbl_lineshape_model.cpp:70-92): VMR-weighted sum over
    perturber species; a Bath entry takes the remainder weight
    (1 - sum of listed VMRs); without Bath the weighted mean is used.
    """
    # per-(line, perturber, variable) raw law values
    sval = eval_law(cat.ls_law, cat.ls_x, cat.t0[:, None, None], T)  # [L,P,NV]
    sval = sval * P ** P_POW.astype(sval.dtype)  # pressure scaling per variable

    is_pad = cat.ls_spec == PAD  # [L,P]
    is_bath = cat.ls_spec == BATH
    w_spec = jnp.where(is_pad | is_bath, 0.0, vmr[jnp.clip(cat.ls_spec, 0)])
    vmr_sum = jnp.sum(w_spec, axis=1)  # [L]
    has_bath = jnp.any(is_bath, axis=1)  # [L]
    w_bath = jnp.where(is_bath, (1.0 - vmr_sum)[:, None], 0.0)
    w = w_spec + w_bath  # [L,P]

    num = jnp.sum(w[:, :, None] * sval, axis=1)  # [L,NV]
    denom = jnp.where(has_bath, 1.0, jnp.where(vmr_sum > 0, vmr_sum, 1.0))
    return num / denom[:, None]


def line_strengths_parts(cat: LineCatalog, pf: PartFunTable, T, P, vmr, ls):
    """Per-line strength as (Re, Im) real arrays (with the number-density
    and c^2/8pi/f0^3 prefactors folded in) and shifted center.

    Returns (sr [L], si [L], f0s [L], inv_gd [L], z_imag [L]).  Real pairs
    rather than one complex array so the complex-free f64-on-TPU path
    (_shape_sum_realpair) never materializes a c128 value.  The factor
    grouping is deliberate: the reference computes s_lte ~ 1e-42 and a
    separate scl ~ 1e+50 prefactor (lbl_lineshape_voigt_lte.cpp:936) which
    over/underflow float32; here every intermediate stays in f32 range so
    the same code runs in reduced precision on the TPU.  The remaining
    frequency factor is -f * expm1(-h f / k T) (applied by the caller).
    """
    Q = pf.Q(T, cat.iso_idx)
    inv_f0 = 1.0 / cat.f0
    g_line = cat.a * cat.gu * jnp.exp(-cat.e0 / (const.k * T)) / Q  # ~1e-8

    f0s = cat.f0 + ls[:, ID0] + ls[:, IDV]  # pressure-shifted center
    gd_part = jnp.sqrt(const.doppler_broadening_const_squared * T / cat.iso_mass)
    inv_gd = 1.0 / (gd_part * f0s)
    z_imag = ls[:, IG0] * inv_gd

    N = P / (const.k * T)  # number density (physics_funcs.h:54)
    pref = (
        (N * inv_f0)
        * ((const.c**2 / (8.0 * jnp.pi)) * inv_f0)
        * inv_f0
    )  # ~1e7, f32-safe grouping

    # build the complex strength via lax.complex of real products — NOT
    # real_array * complex_array, whose f64->c128 convert the TPU x64
    # rewriter cannot expand ("Unsupported CVT X64 expansion")
    x = vmr[cat.spec_idx]
    pre = (const.inv_sqrt_pi * inv_gd * cat.iso_ratio * x) * (g_line * pref)
    sr = pre * (1.0 + ls[:, IG])
    si = pre * (-ls[:, IY])
    return sr, si, f0s, inv_gd, z_imag


def line_strengths(cat: LineCatalog, pf: PartFunTable, T, P, vmr, ls):
    """Complex-strength convenience wrapper around line_strengths_parts."""
    sr, si, f0s, inv_gd, z_imag = line_strengths_parts(cat, pf, T, P, vmr, ls)
    return jax.lax.complex(sr, si), f0s, inv_gd, z_imag


def _shape_sum_realpair(
    f_grid, sr, si, f0s, inv_gd, z_imag, cutoff, block: int,
    mirrored: bool = False,
):
    """Re[_shape_sum] with NO complex dtypes anywhere: real-pair wofz from
    the Pallas kernel helpers (ops/voigt_kernel._wofz_parts) as plain XLA.

    Exists because the TPU x64 rewriter cannot compile complex128 graphs
    at all (f64->c128 CVT expansions and tuple-shape check failures), so
    this is the path that makes f64 LBL runnable ON TPU. [F] real."""
    from ..ops.voigt_kernel import _wofz_parts

    n = 24 if jnp.result_type(f_grid.dtype) == jnp.float32 else 64

    def blocksum(args):
        sr_b, si_b, f0_b, ig_b, zi_b, cut_b = args
        zr = ig_b[:, None] * (f_grid[None, :] - f0_b[:, None])
        zim = jnp.broadcast_to(zi_b[:, None], zr.shape)
        wr, wi = _wofz_parts(zr, zim, n)
        if mirrored:
            zmr = ig_b[:, None] * (f_grid[None, :] + f0_b[:, None])
            wmr, wmi = _wofz_parts(zmr, zim, n)
            wr, wi = wr + wmr, wi + wmi
        has_cut = jnp.isfinite(cut_b)
        cut_safe = jnp.where(has_cut, cut_b, 0.0)
        wcr, wci = _wofz_parts(ig_b * cut_safe, zi_b, n)
        if mirrored:
            wc2r, wc2i = _wofz_parts(ig_b * (2.0 * f0_b + cut_safe), zi_b, n)
            wcr, wci = wcr + wc2r, wci + wc2i
        wcr = jnp.where(has_cut, wcr, 0.0)[:, None]
        wci = jnp.where(has_cut, wci, 0.0)[:, None]
        inside = jnp.abs(f_grid[None, :] - f0_b[:, None]) <= cut_b[:, None]
        vals = sr_b[:, None] * (wr - wcr) - si_b[:, None] * (wi - wci)
        return jnp.sum(jnp.where(inside, vals, 0.0), axis=0)

    L = sr.shape[0]
    nblk = max(1, -(-L // block))
    pad = nblk * block - L
    if pad:
        zpad = lambda a, v=0.0: jnp.concatenate(
            [a, jnp.full((pad,), v, dtype=a.dtype)]
        )
        sr, si, f0s, inv_gd, z_imag = map(zpad, (sr, si, f0s, inv_gd, z_imag))
        cutoff = zpad(cutoff, -1.0)
    args = tuple(
        a.reshape(nblk, block) for a in (sr, si, f0s, inv_gd, z_imag, cutoff)
    )
    if nblk == 1:
        return blocksum(tuple(a[0] for a in args))
    partial = jax.lax.map(blocksum, args)  # [nblk, F]
    return jnp.sum(partial, axis=0)


def _shape_sum(
    f_grid, s, f0s, inv_gd, z_imag, cutoff, block: int, mirrored: bool = False
):
    """sum_l s_l * [F_l(f) - F_l(f0+cut)] masked to |f-f0|<=cut. [F] complex.

    F = w(z) for the plain Voigt; with ``mirrored`` the reference's
    VP_LTE_MIRROR shape F = w(z) + w(zm), zm = inv_gd (f + f0) + i zi
    (lbl_lineshape_voigt_lte_mirrored.h:44)."""

    # Weideman order by precision: 24 terms reach f32 roundoff; 64 for f64
    wofz_n = 24 if jnp.result_type(f_grid.dtype) == jnp.float32 else 64

    # build z via lax.complex, NOT re + 1j*im: the latter lowers to a
    # real->complex convert_element_type, which the TPU x64 rewriter
    # cannot expand for f64->c128 ("Unsupported CVT X64 expansion")
    zof = jax.lax.complex

    def blocksum(args):
        s_b, f0_b, ig_b, zi_b, cut_b = args
        zr = ig_b[:, None] * (f_grid[None, :] - f0_b[:, None])
        z = zof(zr, jnp.broadcast_to(zi_b[:, None], zr.shape))
        w = wofz(z, wofz_n)
        if mirrored:
            zmr = ig_b[:, None] * (f_grid[None, :] + f0_b[:, None])
            zm = zof(zmr, jnp.broadcast_to(zi_b[:, None], zmr.shape))
            w = w + wofz(zm, wofz_n)
        has_cut = jnp.isfinite(cut_b)
        # sanitize inf cutoffs BEFORE the multiply: 0*inf inside a discarded
        # where-branch still NaNs the product's cotangent in reverse mode
        cut_safe = jnp.where(has_cut, cut_b, 0.0)
        zcut = zof(ig_b * cut_safe, zi_b)
        wc = wofz(zcut, wofz_n)
        if mirrored:
            wc = wc + wofz(zof(ig_b * (2.0 * f0_b + cut_safe), zi_b), wofz_n)
        # complex-typed zeros in the selects (a real 0.0 would lower to a
        # scalar f64->c128 convert, unsupported by the TPU x64 rewriter)
        wcut = jnp.where(has_cut[:, None], wc[:, None], 0j)
        inside = jnp.abs(f_grid[None, :] - f0_b[:, None]) <= cut_b[:, None]
        contrib = jnp.where(inside, s_b[:, None] * (w - wcut), 0j)
        return jnp.sum(contrib, axis=0)

    L = s.shape[0]
    nblk = max(1, -(-L // block))
    pad = nblk * block - L
    if pad:
        zpad = lambda a, v=0.0: jnp.concatenate(
            [a, jnp.full((pad,), v, dtype=a.dtype)]
        )
        s, f0s, inv_gd, z_imag = map(zpad, (s, f0s, inv_gd, z_imag))
        # padded lines: cutoff -1 => inside-mask always False => no contribution
        cutoff = zpad(cutoff, -1.0)
    args = tuple(
        a.reshape(nblk, block) for a in (s, f0s, inv_gd, z_imag, cutoff)
    )
    if nblk == 1:
        return blocksum(tuple(a[0] for a in args))
    partial = jax.lax.map(blocksum, args)  # [nblk, F]
    return jnp.sum(partial, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("no_negative_absorption", "block", "mirrored", "realpair"),
)
def absorption(
    f_grid,
    cat: LineCatalog,
    pf: PartFunTable,
    T,
    P,
    vmr,
    no_negative_absorption: bool = True,
    block: int = 256,
    mirrored: bool = False,
    realpair: bool | None = None,
):
    """LBL absorption coefficient [1/m] on f_grid at one atmospheric point.

    Equivalent of the reference's spectral_propmatAddLines for the
    unpolarized Voigt-LTE case (src/m_lbl.cc:242 -> lbl_lineshape_voigt_lte
    calculate).  Returns [F] (the A-component of the propagation matrix).

    realpair=True evaluates the identical math with no complex dtypes
    (required for f64 on TPU, whose x64 rewriter cannot compile c128).
    Default None auto-selects it whenever an f64 trace meets a non-CPU
    backend, so f64 forward operators compile on the chip out of the box.
    """
    if realpair is None:
        realpair = (
            jnp.result_type(f_grid.dtype) == jnp.float64
            and jax.default_backend() != "cpu"
        )
    ls = lineshape_params(cat, T, P, vmr)
    if realpair:
        sr, si, f0s, inv_gd, z_imag = line_strengths_parts(cat, pf, T, P, vmr, ls)
        shape_re = _shape_sum_realpair(
            f_grid, sr, si, f0s, inv_gd, z_imag, cat.cutoff, block, mirrored
        )
    else:
        s, f0s, inv_gd, z_imag = line_strengths(cat, pf, T, P, vmr, ls)
        shape_re = jnp.real(
            _shape_sum(f_grid, s, f0s, inv_gd, z_imag, cat.cutoff, block, mirrored)
        )

    # stimulated-emission frequency factor (the N, c^2/8pi, 1/f0^3 parts
    # are folded into the line strengths for f32 safety)
    scl = -f_grid * jnp.expm1(-(const.h * f_grid) / (const.k * T))
    alpha = scl * shape_re
    if no_negative_absorption:
        alpha = jnp.maximum(alpha, 0.0)
    return alpha


@functools.partial(
    jax.jit,
    static_argnames=(
        "no_negative_absorption", "tf", "tl", "wofz_n", "max_visits",
        "mp_terms", "mp_kappa", "nsub", "coarse", "coarse_k",
    ),
)
def absorption_pallas(
    f_grid,
    cat: LineCatalog,
    pf: PartFunTable,
    T,
    P,
    vmr,
    no_negative_absorption: bool = True,
    tf: int = 256,
    tl: int = 128,
    wofz_n: int | None = None,
    max_visits: int | None = None,
    mp_terms: int = 12,
    mp_kappa: float = 3.5,
    nsub: int = 1,
    coarse: int = 0,
    coarse_k: float = 40.0,
):
    """absorption() with the lines x freqs contraction in the Pallas TPU
    kernel (ops/voigt_kernel.py). Identical math; tiled VMEM execution with
    cutoff-window block skipping.  max_visits (static) should come from
    ops.voigt_kernel.voigt_visit_bound on concrete scene inputs when tl is
    small — see tune_lbl_kernel."""
    from ..ops.voigt_kernel import voigt_sum

    if wofz_n is None:
        # dtype-aware rational order: n=16 reaches f32 roundoff (4e-7 max
        # rel vs scipy wofz in the non-asymptotic region); n=24 for f64
        wofz_n = 24 if f_grid.dtype == jnp.float64 else 16

    ls = lineshape_params(cat, T, P, vmr)
    s, f0s, inv_gd, z_imag = line_strengths(cat, pf, T, P, vmr, ls)

    has_cut = jnp.isfinite(cat.cutoff)
    cut_safe = jnp.where(has_cut, cat.cutoff, 0.0)
    wcut = jnp.where(
        has_cut, wofz(jax.lax.complex(inv_gd * cut_safe, z_imag)), 0.0
    )
    cut_k = jnp.where(has_cut, cat.cutoff, 1e30)

    # common anchor keeps f32 differences accurate
    anchor = jnp.mean(f_grid)
    shape_re = voigt_sum(
        f_grid - anchor,
        f0s - anchor,
        inv_gd,
        z_imag,
        jnp.real(s),
        jnp.imag(s),
        cut_k,
        jnp.real(wcut),
        jnp.imag(wcut),
        tf=tf,
        tl=tl,
        n=wofz_n,
        max_visits=max_visits,
        mp_terms=mp_terms,
        mp_kappa=mp_kappa,
        nsub=nsub,
        coarse=coarse,
        coarse_k=coarse_k,
    )

    scl = -f_grid * jnp.expm1(-(const.h * f_grid) / (const.k * T))
    alpha = scl * shape_re
    if no_negative_absorption:
        alpha = jnp.maximum(alpha, 0.0)
    return alpha


def tune_lbl_kernel(
    f_grid, cat: LineCatalog, pf: PartFunTable, T, P, vmr,
    tf: int = 512, tl: int = 32,
    mp_terms: int = 12, mp_kappa: float = 3.5, slack: int = 2,
    nsub: int = 1, coarse: int = 0, coarse_k: float = 40.0,
):
    """Concrete-input (outside-jit) tuner: exact static max_visits for
    absorption_pallas over a set of atmospheric points.

    With fine line blocks (tl 32-64) the multipole far field swallows most
    in-window (tile, block) pairs, but the pallas grid's static visit axis
    must then be bounded tightly or skipped-slot dispatch dominates.  This
    evaluates the kernels' own classification per level and returns
    dict(tf=, tl=, max_visits=, mp_terms=, mp_kappa=) to splat into
    absorption_pallas.  T/P/vmr: [Z]/[Z]/[Z, S] concrete arrays.
    """
    import numpy as np

    from ..ops.voigt_kernel import voigt_visit_bound

    # all eager math on CPU copies (axon TPU eager path lacks host ops)
    cat = jax.tree_util.tree_map(np.asarray, cat)
    pf = jax.tree_util.tree_map(np.asarray, pf)
    T = np.asarray(T)
    P = np.asarray(P)
    vmr = np.asarray(vmr)
    anchor = float(np.asarray(f_grid).mean())
    bound = 0
    cut_k = np.where(np.isfinite(cat.cutoff), cat.cutoff, 1e30)
    with jax.default_device(jax.devices("cpu")[0]):
        for z in range(T.shape[0]):
            ls = lineshape_params(cat, T[z], P[z], vmr[z])
            _, f0s, inv_gd, z_imag = line_strengths(
                cat, pf, T[z], P[z], vmr[z], ls
            )
            bound = max(
                bound,
                voigt_visit_bound(
                    np.asarray(f_grid) - anchor, np.asarray(f0s) - anchor,
                    np.asarray(inv_gd), np.asarray(z_imag), cut_k,
                    tf=tf, tl=tl, mp_terms=mp_terms, mp_kappa=mp_kappa,
                    nsub=nsub, coarse=coarse, coarse_k=coarse_k,
                ),
            )
    out = dict(
        tf=tf, tl=tl, max_visits=bound + slack,
        mp_terms=mp_terms, mp_kappa=mp_kappa, nsub=nsub,
    )
    if coarse:
        out.update(coarse=coarse, coarse_k=coarse_k)
    return out
