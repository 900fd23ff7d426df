"""Pallas TPU kernel for the lines x frequencies Voigt contraction.

This is the framework's hottest loop — the reference spends its time in
Faddeeva::w per (line, freq) inside OpenMP frequency chunks
(/root/reference/src/m_lbl.cc:256-293, lbl_lineshape_voigt_lte.cpp:239).

Kernel design (see pallas guide):
  * grid = (freq tiles, visited line blocks): a host-side (jnp, tiny)
    interval test builds a per-tile list of line blocks whose cutoff
    windows can intersect the tile; the block index map reads it from
    scalar prefetch, so skipped blocks cost neither DMA nor compute
    (the TPU analogue of the reference's active_lines span search,
    lbl_data.h:270 — but applied to the iteration space itself).
  * line attributes are passed as [L, 1] COLUMNS so the per-line
    broadcasts against the [1, TF] frequency row are natural outer
    products — no lane->sublane transposes inside the kernel.
  * per (line, freq) element: z = inv_gd*(f - f0) + i*z_imag, w(z) via a
    Weideman rational of configurable order (complex arithmetic as real
    pairs on the VPU) blended with the asymptotic Laurent series for
    large |z|; ByLine cutoff = masked subtraction of the per-line
    Re(s * w(z_cut)) constant, folded at trace time.
  * far-wing fast path: when the WHOLE (tile, block) pair is provably in
    the asymptotic region — min|z|^2 >= (igd_min*gap)^2 + zi_min^2 —
    only the ~20-flop Laurent series runs (3 terms at f32, 4 at f64),
    skipping the Weideman loop.  At pressure-broadened microwave shapes
    z_imag alone is >> the threshold, so this is the common path.
  * the accumulator block is [8, TF] (all VPU sublanes busy); the final
    8-row reduction happens outside the kernel.

Frequencies/line centers should be passed pre-shifted by a common anchor
(f - anchor) so float32 keeps sub-kHz resolution; line widths ~1e9 Hz.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wofz import _weideman_coeffs

_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)
_ASYM_R2 = 512.0
# deep tier: whole-(tile, block) 1-term Laurent (pure Lorentz far wing)
# when min |z|^2 >= 2e6 -> relative error c_1/|z|^2 <= 2.5e-7
_DEEP_R2 = 1.0e6

# fast-multipole far field: blocks whose pole cluster is at least
# mp_kappa radii from a tile collapse to a mp_terms-term expansion
# (relative truncation ~ (1/kappa)^terms / (1 - 1/kappa); defaults
# kappa=3.5, terms=12 -> ~4e-7)
_MP_TERMS = 12
_MP_KAPPA = 3.5


def _multipole_far(
    f_flat, t_lo, t_hi, f0, igd, zi, sr, si, cutoff, swc, pw,
    igd_min, zi_min, nl, tl, terms=_MP_TERMS, kappa=_MP_KAPPA,
):
    """Fast-multipole Lorentzian far field for the Voigt contraction.

    Beyond the asymptotic gate, each line's contribution is a rational
    function with (order 1/3/5) poles at p_l = f0_l - i G0_l (the
    Laurent form of s w(z)); a whole block of lines then collapses to a
    single _MP_TERMS-term expansion around the block's pole centroid:

        sum_l s_l w_l(f) ~ sum_j M_j (R/(f - c))^j,

    valid for |f - c| >= kappa R.  The expansion EVALUATION is a
    plain masked XLA contraction over (freqs x blocks) — ~40x fewer
    flops than the direct far tier it replaces; the kernel then visits
    only near (tile, block) pairs.  No reference analogue: the
    reference walks every (line, freq) pair (lbl_data.h:270).

    pw: [L, C] per-line component weights (C=1 scalar, C=7 Zeeman).
    Returns (far [nf, nl] bool, mp [nf*tf, C]).
    """
    dtype = f_flat.dtype
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    blk = lambda x: x.reshape(nl, tl)
    igd_b = blk(igd)
    igd_s = jnp.where(igd_b > 0, igd_b, 1.0)
    G0 = blk(zi) / igd_s  # [nl, tl] Lorentz HWHM in frequency
    f0b = blk(f0)
    c_re = jnp.mean(f0b, axis=1)  # [nl] pole centroid
    c_im = -jnp.mean(G0, axis=1)
    dp = jax.lax.complex(f0b - c_re[:, None], -(G0 + c_im[:, None]))
    R = jnp.maximum(jnp.sqrt(jnp.max(jnp.abs(dp) ** 2, axis=1)), 1.0)
    q = dp / R[:, None].astype(cdtype)  # scaled pole offsets, |q| <= 1

    # per-line pole strengths: s w ~ (i s/sqrt(pi)) sum_k c_k z^-(2k+1),
    # z = igd (f - p)  ->  b_k = (i s/sqrt(pi)) c_k / igd^(2k+1)
    s_c = jax.lax.complex(blk(sr), blk(si))
    is_c = 1j * s_c * _INV_SQRT_PI
    # scaled by R^-(2k+1) so every moment term is O(1) in f32
    A = [
        is_c * (_LAURENT_C[k] / (igd_s * R[:, None]) ** (2 * k + 1))
        for k in range(3)
    ]

    # moments M_j = sum_l sum_k binom(j-1, 2k) A_kl q_l^(j-2k-1), j=1..P
    P_ = terms
    qp = [jnp.ones_like(q)]  # q^0 .. q^(P-1)
    for _ in range(P_ - 1):
        qp.append(qp[-1] * q)
    pw_b = pw.reshape(nl, tl, -1).astype(dtype)  # [nl, tl, C]
    C = pw_b.shape[-1]

    def msum(x):  # weighted block sum: [nl, tl] -> [nl, C]
        return jnp.einsum("bt,btc->bc", x, pw_b)

    M = []
    for j in range(1, P_ + 1):
        acc = 0.0
        for k in range(3):
            m = j - 2 * k - 1
            if m < 0:
                continue
            acc = acc + math.comb(j - 1, 2 * k) * (A[k] * qp[m])
        M.append(msum(acc))  # [nl, C] complex
    swc_sum = msum(blk(swc).astype(cdtype))  # [nl, C] (real-valued)

    # far classification per (tile, block)
    gap = jnp.maximum(
        jnp.maximum(c_re[None, :] - t_hi[:, None], t_lo[:, None] - c_re[None, :]),
        0.0,
    )  # [nf, nl]
    dist2 = gap * gap + (c_im * c_im)[None, :]
    far = dist2 >= (kappa * R) ** 2
    # every line's |z|^2 must clear the asymptotic gate (Laurent-3 regime)
    gmin = igd_min[None, :] * gap
    far &= gmin * gmin + (zi_min * zi_min)[None, :] > 2.0 * _ASYM_R2
    # the tile must sit inside EVERY line's cutoff window (the expansion
    # has no per-line masking; padded lines' inverted windows exclude
    # their block automatically)
    win_in_lo = jnp.max(f0b - blk(cutoff), axis=1)
    win_in_hi = jnp.min(f0b + blk(cutoff), axis=1)
    far &= (t_lo[:, None] >= win_in_lo[None, :]) & (
        t_hi[:, None] <= win_in_hi[None, :]
    )

    # evaluation: u = R/(f - c), Horner accumulation per component with
    # the (freqs x blocks) contraction on the MXU
    tf = f_flat.shape[0] // t_lo.shape[0]
    farf = jnp.repeat(far, tf, axis=0)  # [F, nl]
    u = R[None, :].astype(cdtype) / (
        jax.lax.complex(
            f_flat[:, None] - c_re[None, :],
            jnp.broadcast_to(-c_im[None, :], (f_flat.shape[0], nl)),
        )
    )
    u = jnp.where(farf, u, 0.0)  # also kills padded-block NaNs
    mp = jnp.zeros((f_flat.shape[0], C), dtype)
    U = u
    for j in range(P_):
        Mc = M[j]
        mp = mp + (
            jnp.real(U) @ jnp.real(Mc) - jnp.imag(U) @ jnp.imag(Mc)
        )
        if j < P_ - 1:
            U = U * u
    mp = mp - farf.astype(dtype) @ jnp.real(swc_sum).astype(dtype)
    return far, mp


def _smoothstep(s):
    """C^2 quintic smoothstep on clamped s: 0 -> 0, 1 -> 1, zero first
    and second derivatives at both ends (the blend window for the
    coarse-grid far field — hard masks would put kinks inside interp
    cells, NOTES_ROUND4 trap (a))."""
    s = jnp.clip(s, 0.0, 1.0)
    return s * s * s * (10.0 + s * (-15.0 + 6.0 * s))


def _coarse_far(
    f_flat, s_lo, s_hi, f0, igd, zi, sr, si, cutoff, swc, pw,
    f0_lo, f0_hi, nl, tl, factor, K, mid_r2, mid_terms,
):
    """Coarse-grid far field for the Voigt contraction.

    Beyond a per-line radius r0 the (in-window, cutoff-subtracted) line
    tail is a smooth slowly-varying function of frequency, so the whole
    far field is evaluated on a `factor`x coarser UNIFORM grid with the
    mid-tier Laurent series and cubic-Lagrange-interpolated back to the
    fine grid: ~factor x fewer far pairs than the direct tier and, unlike
    the block multipole (_multipole_far), a per-LINE near radius — no
    cluster-radius term, so the direct tier shrinks to r1 = 2 K h_c
    (~8 GHz at the bench shape vs ~21 GHz for the tl=256 multipole).

    Exactness: each line's contribution splits as
        chi(|df|) psi(|df|) g_l  +  (1 - chi psi) g_l,
    chi a quintic smoothstep opening over [r0, r0 + Kh] and psi one
    closing over [cut - Kh, cut]; the first term (globally C^2, fully
    inside the cutoff window) lives here on the coarse grid, the exact
    complement stays in the direct kernel (weighted by 1 - chi psi), so
    the cutoff-subtraction kink at f0 +- cut is computed at FULL
    resolution (NOTES_ROUND4 trap (b)).  Interp error ~ 2.8 (h_c/r0)^4
    of the local tail: ~1e-6 at the default K = 40.

    Returns (far [nsub-tiles, nl] bool, far_fine [F, C], r0 [L]).
    """
    dtype = f_flat.dtype
    F = f_flat.shape[0]
    fmin = jnp.min(f_flat)
    fmax = jnp.max(f_flat)
    Fc = max(F // factor, 8) + 4
    # host-static length; traced uniform spacing
    h_c = (fmax - fmin) / (Fc - 5)
    fc = fmin + (jnp.arange(Fc, dtype=dtype) - 2.0) * h_c

    ramp = K * h_c
    # r0 must also clear the mid Laurent gate for every line
    mid_gap = jnp.sqrt(jnp.maximum(2.0 * mid_r2 - zi * zi, 0.0)) / jnp.where(
        igd > 0, igd, 1.0
    )
    r0 = jnp.maximum(ramp, mid_gap)  # [L]

    # ---- coarse evaluation over all (coarse point, line) pairs ----
    df = fc[:, None] - f0[None, :]  # [Fc, L]
    ad = jnp.abs(df)
    chi = _smoothstep((ad - r0[None, :]) / ramp)
    psi = _smoothstep((cutoff[None, :] - ad) / ramp)
    wblend = chi * psi
    on = wblend > 0.0
    zr = jnp.where(on, igd[None, :] * df, 100.0)
    zim = jnp.where(on, jnp.broadcast_to(zi[None, :], zr.shape), 100.0)
    wr, wi = _wofz_asym(zr, zim, terms=mid_terms, pl_recip=False)
    vals = (sr[None, :] * wr - si[None, :] * wi) - swc[None, :]
    contrib = jnp.where(on, wblend * vals, 0.0)  # [Fc, L]
    far_c = contrib @ pw.astype(dtype)  # [Fc, C]

    # ---- cubic Lagrange interpolation to the fine grid ----
    t = (f_flat - fc[0]) / h_c
    i1 = jnp.clip(t.astype(jnp.int32), 1, Fc - 3)
    x = t - i1.astype(dtype)  # in [0, 1) inside the grid
    w0 = -x * (x - 1.0) * (x - 2.0) / 6.0
    w1 = (x + 1.0) * (x - 1.0) * (x - 2.0) / 2.0
    w2 = -(x + 1.0) * x * (x - 2.0) / 2.0
    w3 = (x + 1.0) * x * (x - 1.0) / 6.0
    g = lambda off: far_c[i1 + off]  # [F, C]
    far_fine = (
        w0[:, None] * g(-1) + w1[:, None] * g(0)
        + w2[:, None] * g(1) + w3[:, None] * g(2)
    )

    # ---- (sub-tile, block) far classification ----
    # The direct complement (1 - chi psi) is nonzero only (a) within r1
    # of a pole or (b) in the psi ramp just inside a cutoff edge, so a
    # sub-tile is near iff it intersects the block's pole band or either
    # cutoff-edge band — an EXACT union test (the naive "inside every
    # line's psi == 1 region" couples all lines of a block and never
    # fires at realistic spans).
    blk = lambda x: x.reshape(nl, tl)
    r1 = r0 + ramp
    r1b = blk(r1)
    f0b = blk(f0)
    cutb = blk(cutoff)
    valid = cutb > 0.0  # padded lines carry cutoff = -1
    finite = valid & (cutb < 1e20)  # no-cutoff lines have no edge
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    pole_lo = jnp.min(jnp.where(valid, f0b - r1b, big), axis=1)
    pole_hi = jnp.max(jnp.where(valid, f0b + r1b, -big), axis=1)
    up_lo = jnp.min(jnp.where(finite, f0b + cutb, big), axis=1) - ramp
    up_hi = jnp.max(jnp.where(finite, f0b + cutb, -big), axis=1)
    dn_lo = jnp.min(jnp.where(finite, f0b - cutb, big), axis=1)
    dn_hi = jnp.max(jnp.where(finite, f0b - cutb, -big), axis=1) + ramp

    def hits(lo, hi):
        return (hi[None, :] >= s_lo[:, None]) & (lo[None, :] <= s_hi[:, None])

    near_bands = (
        hits(pole_lo, pole_hi) | hits(up_lo, up_hi) | hits(dn_lo, dn_hi)
    )
    # blocks with padded lines always go direct (their in-kernel s = 0
    # zeroes them; the band extrema above ignore them)
    has_pad = jnp.any(~valid, axis=1)
    far = ~near_bands & ~has_pad[None, :]
    return far, far_fine, r0, ramp


def _reciprocal(x):
    if x.dtype == jnp.float32:
        try:
            y = pl.reciprocal(x, approx=True)
        except NotImplementedError:
            # pl.reciprocal has no vmap batching rule; outside kernels
            # under vmap, fall back to the exact divide
            return 1.0 / x
        return y * (2.0 - x * y)  # one Newton step: ~2^-24 accurate
    return 1.0 / x


def _wofz_weideman(zr, zi, n):
    """Weideman rational approximation (wr, wi) for Im z >= 0."""
    Lw, a = _weideman_coeffs(n)
    dtype = zr.dtype
    Lw = jnp.asarray(Lw, dtype)

    # Weideman: Z = (L + i z)/(L - i z); iz = -zi + i zr
    dr = Lw + zi  # Re(L - iz)
    di = -zr  # Im(L - iz)
    d2 = dr * dr + di * di
    inv_d2 = _reciprocal(d2)
    nr = Lw - zi  # Re(L + iz)
    ni = zr  # Im(L + iz)
    Zr = (nr * dr + ni * di) * inv_d2
    Zi = (ni * dr - nr * di) * inv_d2
    pr = jnp.zeros_like(zr)
    pi = jnp.zeros_like(zr)
    for c in a:
        pr, pi = pr * Zr - pi * Zi + c, pr * Zi + pi * Zr
    # w = (2 p / (L - iz) + 1/sqrt(pi)) / (L - iz)
    t_r = (2.0 * (pr * dr + pi * di)) * inv_d2 + _INV_SQRT_PI
    t_i = (2.0 * (pi * dr - pr * di)) * inv_d2
    w_r = (t_r * dr + t_i * di) * inv_d2
    w_i = (t_i * dr - t_r * di) * inv_d2
    return w_r, w_i


# Laurent coefficients c_k = (2k-1)!!/2^k of w ~ i/(sqrt(pi) z) sum c_k z^-2k
_LAURENT_C = (1.0, 0.5, 0.75, 15.0 / 8.0, 105.0 / 16.0, 945.0 / 32.0,
              10395.0 / 64.0, 135135.0 / 128.0)


def _wofz_asym(zr, zi, terms=None, pl_recip=True):
    """Laurent series w ~ i/(sqrt(pi) z) sum c_k z^-2k.

    Error ~ the first omitted term, c_T/|z|^2T.  Default term counts at
    the far gate |z|^2 > _ASYM_R2 = 512: 3 at f32 (1.9 |z|^-6 = 1.4e-8),
    4 at f64 (6.6 |z|^-8 = 9.4e-11).  The mid tier (_MID_R2) passes
    terms explicitly: 6 at f32 (|z|^2 >= 36 -> 7.4e-8), 8 at f64
    (|z|^2 >= 150 -> 4e-14).  pl_recip=False for XLA-side callers that
    may sit under vmap (pl.reciprocal has no batching rule)."""
    r2 = zr * zr + zi * zi
    inv_r2 = _reciprocal(r2) if pl_recip else 1.0 / r2
    # 1/z^2 = (zr^2 - zi^2 - 2 i zr zi)/|z|^4
    u_r = (zr * zr - zi * zi) * inv_r2 * inv_r2
    u_i = (-2.0 * zr * zi) * inv_r2 * inv_r2
    if terms is None:
        terms = 3 if zr.dtype == jnp.float32 else 4
    cs = _LAURENT_C[:terms]
    s_r = jnp.full_like(zr, cs[-1])
    s_i = jnp.zeros_like(zr)
    for c in reversed(cs[:-1]):
        s_r, s_i = s_r * u_r - s_i * u_i + c, s_r * u_i + s_i * u_r
    # i/(sqrt(pi) z) = (zi + i zr)/(sqrt(pi)|z|^2)
    f_r = zi * inv_r2 * _INV_SQRT_PI
    f_i = zr * inv_r2 * _INV_SQRT_PI
    return f_r * s_r - f_i * s_i, f_r * s_i + f_i * s_r


def _wofz_deep(zr, zi):
    """1-term Laurent w ~ i/(sqrt(pi) z): the pure far-wing Lorentz form.

    Valid for |z|^2 >= _DEEP_R2 (rel. error c_1/|z|^2 <= 2.5e-7) — the
    pressure-broadened bottom-of-atmosphere rows where z_imag alone is
    thousands; ~4x fewer flops than the 3-term series."""
    inv = _reciprocal(zr * zr + zi * zi) * _INV_SQRT_PI
    return zi * inv, zr * inv


def _wofz_parts(zr, zi, n):
    """w(z) for Im z >= 0: Weideman blended with the asymptotic series."""
    r2 = zr * zr + zi * zi
    big = r2 > _ASYM_R2
    w_r, w_i = _wofz_weideman(zr, zi, n)
    # evaluate the series at a safe point where masked out to avoid 1/0
    safe = jnp.full_like(zr, 100.0)  # dtype-matched: a python literal
    # here becomes an f64 scalar under x64 mode, which Mosaic rejects
    zr_b = jnp.where(big, zr, safe)
    zi_b = jnp.where(big, zi, safe)
    wa_r, wa_i = _wofz_asym(zr_b, zi_b)
    return jnp.where(big, wa_r, w_r), jnp.where(big, wa_i, w_i)


def _voigt_kernel(
    # scalar prefetch
    blkidx_ref,  # [nf, max_visits] line-block index per (tile, slot)
    nvisit_ref,  # [nf] visited-block count per tile
    submask_ref,  # [nf, nl] int32 bitmask of near sub-tiles per block
    f0min_ref,
    f0max_ref,
    igdmin_ref,
    zimin_ref,
    # blocks
    f_ref,  # [1, TF]
    f0_ref,  # [TL, 1]
    igd_ref,
    zi_ref,
    sr_ref,
    si_ref,
    cut_ref,
    swc_ref,
    *rest,  # (+ r0_ref, invr_ref when coarse) + out_ref [8, TF]
    n,
    nsub,
    coarse=False,
):
    if coarse:
        r0_ref, invr_ref, out_ref = rest
    else:
        (out_ref,) = rest
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    jb = blkidx_ref[i, j]  # actual line-block id this slot maps to
    visit = j < nvisit_ref[i]
    bits = submask_ref[i, jb]
    f32 = f_ref.dtype == jnp.float32
    # mid tier: a longer Laurent series is still at roundoff well below
    # the far gate (6 terms at f32 from |z|^2 = 36, 8 at f64 from 150),
    # ~4x cheaper than the Weideman blend it replaces
    mid_r2, mid_terms = (36.0, 6) if f32 else (150.0, 8)
    sf = f_ref.shape[1] // nsub

    f0c = f0_ref[:, 0][:, None]
    igdc = igd_ref[:, 0][:, None]
    zic = zi_ref[:, 0][:, None]
    src = sr_ref[:, 0][:, None]
    sic = si_ref[:, 0][:, None]
    cutc = cut_ref[:, 0][:, None]
    swcc = swc_ref[:, 0][:, None]
    if coarse:
        r0c = r0_ref[:, 0][:, None]
        invr = invr_ref[0, 0]

    # the classification (and the multipole far field) is per SUB-tile of
    # sf lanes: the kernel computes only the sub-tiles whose bit is set,
    # each with its own provable |z|^2 lower bound choosing the cheapest
    # valid tier — every |z|^2 >= (igd_min * gap)^2 + zi_min^2 with gap
    # the separation between the sub-tile interval and the block's f0s
    for st in range(nsub):
        sub_on = visit & (((bits >> st) & 1) == 1)
        t_lo = f_ref[0, st * sf]
        t_hi = f_ref[0, (st + 1) * sf - 1]
        gap = jnp.maximum(
            jnp.maximum(f0min_ref[jb] - t_hi, t_lo - f0max_ref[jb]), 0.0
        )
        gmin = igdmin_ref[jb] * gap
        bound2 = gmin * gmin + zimin_ref[jb] * zimin_ref[jb]
        deep = bound2 > 2.0 * _DEEP_R2
        asym = bound2 > 2.0 * _ASYM_R2
        mid = bound2 > 2.0 * mid_r2

        def load(st=st):
            df = f_ref[0, st * sf:(st + 1) * sf][None, :] - f0c  # [TL, SF]
            zr = igdc * df
            zim = jnp.broadcast_to(zic, zr.shape)
            return df, zr, zim

        def accumulate(df, wr, wi, st=st):
            ad = jnp.abs(df)
            inside = ad <= cutc
            vals = (src * wr - sic * wi) - swcc
            if coarse:
                # exact complement of the coarse-grid far field: the
                # smooth blend chi(|df|) psi(cut - |df|) lives there
                chi = _smoothstep((ad - r0c) * invr)
                psi = _smoothstep((cutc - ad) * invr)
                vals = vals * (1.0 - chi * psi)
            contrib = jnp.where(inside, vals, jnp.zeros_like(vals))
            tl, w = contrib.shape
            out_ref[:, st * sf:(st + 1) * sf] += jnp.sum(
                contrib.reshape(tl // 8, 8, w), axis=0
            )

        @pl.when(sub_on & deep)
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_deep(zr, zim)
            accumulate(df, wr, wi)

        @pl.when(sub_on & asym & jnp.logical_not(deep))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_asym(zr, zim)
            accumulate(df, wr, wi)

        @pl.when(sub_on & mid & jnp.logical_not(asym))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_asym(zr, zim, terms=mid_terms)
            accumulate(df, wr, wi)

        @pl.when(sub_on & jnp.logical_not(mid))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_parts(zr, zim, n)
            accumulate(df, wr, wi)


def _voigt_kernel_pol(
    # scalar prefetch
    blkidx_ref,
    nvisit_ref,
    submask_ref,
    f0min_ref,
    f0max_ref,
    igdmin_ref,
    zimin_ref,
    # blocks
    f_ref,  # [1, TF]
    f0_ref,  # [TL, 1]
    igd_ref,
    zi_ref,
    sr_ref,
    si_ref,
    cut_ref,
    swc_ref,
    pw_ref,  # [8, TL] polarization weights, transposed (7 rows used)
    out_ref,  # [8, TF]
    *,
    n,
    nsub,
):
    """The Voigt contraction with per-line polarization weight columns:
    out[c] = sum_l pw[c, l] Re(s_l (w - wcut)); the w(z) evaluation (the
    dominant cost) is shared across the 7 propmat components, and the
    7-component weighting contracts on the MXU as one [8, TL] @ [TL, SF]
    matmul per near sub-tile instead of seven VPU passes.

    Parity: the reference's as_zeeman scaling of the per-line propagation
    matrix (lbl_lineshape_voigt_lte.cpp:186-204 + lbl_zeeman.h:234-409),
    vectorized over pseudo-lines instead of per-line 7x7 scatter."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    jb = blkidx_ref[i, j]
    visit = j < nvisit_ref[i]
    bits = submask_ref[i, jb]
    f32 = f_ref.dtype == jnp.float32
    mid_r2, mid_terms = (36.0, 6) if f32 else (150.0, 8)
    sf = f_ref.shape[1] // nsub

    f0c = f0_ref[:, 0][:, None]
    igdc = igd_ref[:, 0][:, None]
    zic = zi_ref[:, 0][:, None]
    src = sr_ref[:, 0][:, None]
    sic = si_ref[:, 0][:, None]
    cutc = cut_ref[:, 0][:, None]
    swcc = swc_ref[:, 0][:, None]

    for st in range(nsub):
        sub_on = visit & (((bits >> st) & 1) == 1)
        t_lo = f_ref[0, st * sf]
        t_hi = f_ref[0, (st + 1) * sf - 1]
        gap = jnp.maximum(
            jnp.maximum(f0min_ref[jb] - t_hi, t_lo - f0max_ref[jb]), 0.0
        )
        gmin = igdmin_ref[jb] * gap
        bound2 = gmin * gmin + zimin_ref[jb] * zimin_ref[jb]
        deep = bound2 > 2.0 * _DEEP_R2
        asym = bound2 > 2.0 * _ASYM_R2
        mid = bound2 > 2.0 * mid_r2

        def load(st=st):
            df = f_ref[0, st * sf:(st + 1) * sf][None, :] - f0c
            zr = igdc * df
            zim = jnp.broadcast_to(zic, zr.shape)
            return df, zr, zim

        def accumulate(df, wr, wi, st=st):
            inside = jnp.abs(df) <= cutc
            vals = (src * wr - sic * wi) - swcc
            contrib = jnp.where(inside, vals, jnp.zeros_like(vals))
            out_ref[:, st * sf:(st + 1) * sf] += jax.lax.dot_general(
                pw_ref[:, :], contrib,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # full f32: the default single bf16 pass costs ~4e-4 of
                # the component mix (this kernel is no longer the Zeeman
                # hot path — the parent-pole kernel is — so accuracy wins)
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(sub_on & deep)
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_deep(zr, zim)
            accumulate(df, wr, wi)

        @pl.when(sub_on & asym & jnp.logical_not(deep))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_asym(zr, zim)
            accumulate(df, wr, wi)

        @pl.when(sub_on & mid & jnp.logical_not(asym))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_asym(zr, zim, terms=mid_terms)
            accumulate(df, wr, wi)

        @pl.when(sub_on & jnp.logical_not(mid))
        def _():
            df, zr, zim = load()
            wr, wi = _wofz_parts(zr, zim, n)
            accumulate(df, wr, wi)


def _pad_lines(nl, tl, f0, inv_gd, z_imag, s_re, s_im, cutoff,
               wcut_re, wcut_im, pw=None):
    L = f0.shape[0]
    padL = nl * tl - L
    if padL:
        pads = lambda x, v=0.0: jnp.pad(x, (0, padL), constant_values=v)
        f0 = pads(f0)
        inv_gd = pads(inv_gd)
        z_imag = pads(z_imag, 1.0)  # keep zi_min bounds meaningful
        s_re = pads(s_re)
        s_im = pads(s_im)
        cutoff = pads(cutoff, -1.0)
        wcut_re = pads(wcut_re)
        wcut_im = pads(wcut_im)
        if pw is not None:
            pw = jnp.pad(pw, ((0, padL), (0, 0)))
    return f0, inv_gd, z_imag, s_re, s_im, cutoff, wcut_re, wcut_im, pw


def _classify_visits(
    f_grid, f0, inv_gd, z_imag, s_re, s_im, cutoff, swc, pw,
    nf, tf, nl, tl, multipole, mp_terms, mp_kappa, nsub=1,
    coarse=0, coarse_k=40.0,
):
    """Shared (sub-tile, block) classification for both Voigt kernels.

    Classification (window overlap + multipole far test) happens at
    SUB-tile granularity (sf lanes, default 128): a kernel (tile, block)
    pair is visited iff any of its sub-tiles is near, and the int32
    ``submask`` tells the kernel which sub-tiles to compute.  Coarse
    tiles would otherwise force a full direct visit whenever a tile
    merely straddles a cutoff-window edge or a far-radius boundary.

    Returns (visit [nf, nl] bool, submask [nf, nl] int32,
    mp [nf*tf, C] | None, block extrema).  All jnp on tiny [nf]/[nl]
    shapes except the multipole evaluation.
    """
    sf = tf // nsub
    blk = lambda x: x.reshape(nl, tl)
    win_lo = jnp.min(blk(f0 - cutoff), axis=1)
    win_hi = jnp.max(blk(f0 + cutoff), axis=1)
    f0_lo = jnp.min(blk(f0), axis=1)
    f0_hi = jnp.max(blk(f0), axis=1)
    igd_min = jnp.min(blk(inv_gd), axis=1)
    zi_min = jnp.min(blk(z_imag), axis=1)

    subs = f_grid.reshape(nf * nsub, sf)
    s_lo = subs[:, 0]
    s_hi = subs[:, -1]
    near = (win_hi[None, :] >= s_lo[:, None]) & (
        win_lo[None, :] <= s_hi[:, None]
    )  # [nf*nsub, nl]
    mp = None
    r0 = None
    if coarse:
        f32 = f_grid.dtype == jnp.float32
        mid_r2, mid_terms = (36.0, 6) if f32 else (150.0, 8)
        far, mp, r0, ramp = _coarse_far(
            f_grid, s_lo, s_hi, f0, inv_gd, z_imag, s_re, s_im, cutoff,
            swc, pw, f0_lo, f0_hi, nl, tl, coarse, coarse_k,
            mid_r2, mid_terms,
        )
        r0 = (r0, ramp)
        near = near & ~far
    elif multipole:
        far, mp = _multipole_far(
            f_grid, s_lo, s_hi, f0, inv_gd, z_imag, s_re, s_im, cutoff,
            swc, pw, igd_min, zi_min, nl, tl,
            terms=mp_terms, kappa=mp_kappa,
        )
        near = near & ~far
    near3 = near.reshape(nf, nsub, nl)
    visit = jnp.any(near3, axis=1)
    st = jnp.arange(nsub, dtype=jnp.int32)
    submask = jnp.sum(
        near3.astype(jnp.int32) << st[None, :, None], axis=1
    ).astype(jnp.int32)  # [nf, nl]
    return visit, submask, mp, f0_lo, f0_hi, igd_min, zi_min, r0


def _visit_lists(visit, nf, nl, max_visits):
    """(blkidx [nf, max_visits], nvisit [nf]) from the visit mask.

    max_visits is the STATIC visit-axis bound; blocks beyond it are
    silently dropped — callers must size it with voigt_visit_bound()
    (exact on concrete inputs) or leave the default nl (always safe).
    Overflow slots repeat the last visited block: pallas skips the DMA
    when consecutive steps map to the same block, so they cost ~nothing.
    """
    nvisit = jnp.sum(visit, axis=1).astype(jnp.int32)  # [nf]
    order = jnp.argsort(~visit, axis=1, stable=True).astype(jnp.int32)
    last = order[jnp.arange(nf), jnp.maximum(nvisit - 1, 0)]
    jidx = jnp.arange(nl, dtype=jnp.int32)[None, :]
    blkidx = jnp.where(jidx < nvisit[:, None], order, last[:, None])
    if max_visits < nl:
        blkidx = blkidx[:, :max_visits]
        nvisit = jnp.minimum(nvisit, max_visits)
    return blkidx, nvisit


def voigt_visit_bound(
    f_grid, f0, inv_gd, z_imag, cutoff,
    tf: int = 512, tl: int = 256,
    multipole: bool = True,
    mp_terms: int = _MP_TERMS, mp_kappa: float = _MP_KAPPA,
    nsub: int = 1, coarse: int = 0, coarse_k: float = 40.0,
) -> int:
    """Exact max visited blocks per freq tile, on CONCRETE (numpy) inputs.

    Run once at scene-build time (outside jit) to derive a tight static
    ``max_visits`` for voigt_sum/voigt_sum_pol: with fine line blocks the
    default bound (nl) pads the pallas grid with mostly-skipped slots
    whose dispatch overhead dominates.  Uses the same classification code
    as the kernels, evaluated eagerly, so it can never under-count.
    For level-batched use, call per level and take the max.
    """
    import numpy as np

    # eager numerics pinned to CPU: the axon TPU eager path lacks some
    # host ops (UNIMPLEMENTED errors that vanish under jit)
    with jax.default_device(jax.devices("cpu")[0]):
        f_grid = jnp.asarray(np.asarray(f_grid))
        F, L = f_grid.shape[0], np.asarray(f0).shape[0]
        nf, nl = -(-F // tf), -(-L // tl)
        if nf * tf - F:
            f_grid = jnp.pad(
                f_grid, (0, nf * tf - F), constant_values=f_grid[-1]
            )
        z = jnp.zeros(L, f_grid.dtype)
        args = _pad_lines(
            nl, tl, jnp.asarray(np.asarray(f0)),
            jnp.asarray(np.asarray(inv_gd)),
            jnp.asarray(np.asarray(z_imag)), z, z,
            jnp.asarray(np.asarray(cutoff)), z, z,
            jnp.ones((L, 1), f_grid.dtype),
        )
        f0p, igdp, zip_, srp, sip, cutp, wcrp, wcip, pwp = args
        swc = srp * wcrp - sip * wcip
        visit, _, *_ = _classify_visits(
            f_grid, f0p, igdp, zip_, srp, sip, cutp, swc, pwp,
            nf, tf, nl, tl, multipole, mp_terms, mp_kappa, nsub,
            coarse, coarse_k,
        )
        return int(np.asarray(jnp.sum(visit, axis=1)).max())


@functools.partial(
    jax.jit,
    static_argnames=(
        "tf", "tl", "n", "interpret", "multipole", "max_visits",
        "mp_terms", "mp_kappa", "nsub", "coarse", "coarse_k",
    ),
)
def voigt_sum(
    f_grid,
    f0,
    inv_gd,
    z_imag,
    s_re,
    s_im,
    cutoff,
    wcut_re,
    wcut_im,
    tf: int = 512,
    tl: int = 256,
    n: int = 24,
    interpret: bool = False,
    multipole: bool = True,
    max_visits: int | None = None,
    mp_terms: int = _MP_TERMS,
    mp_kappa: float = _MP_KAPPA,
    nsub: int = 1,
    coarse: int = 0,
    coarse_k: float = 40.0,
):
    """Re sum_l s_l (w(z_l(f)) - wcut_l) masked to |f-f0_l| <= cut_l. [F].

    All inputs 1D; pad lines with s = 0, cutoff = -1. Frequencies and f0
    should share a common anchor shift for f32 use. cutoff must be finite
    (use a huge value like 1e30 for 'no cutoff' with wcut = 0).
    multipole: evaluate provably-far (tile, block) pairs by the block
    pole expansion in XLA instead of the direct kernel tier.  Small tl
    (32-64) shrinks the cluster radius so the far field swallows most
    in-window pairs; pair it with a tight static max_visits from
    voigt_visit_bound() so the grid's visit axis stays short.
    """
    F = f_grid.shape[0]
    L = f0.shape[0]
    dtype = f_grid.dtype
    nf = -(-F // tf)
    nl = -(-L // tl)
    padF = nf * tf - F

    if padF:
        f_grid = jnp.pad(f_grid, (0, padF), constant_values=f_grid[-1])
    (f0, inv_gd, z_imag, s_re, s_im, cutoff, wcut_re, wcut_im, _
     ) = _pad_lines(nl, tl, f0, inv_gd, z_imag, s_re, s_im, cutoff,
                    wcut_re, wcut_im)

    # per-line cutoff-subtraction constant folded at trace time:
    # contribution = Re(s w) - Re(s wcut) inside the window
    swc = s_re * wcut_re - s_im * wcut_im

    visit, submask, mp, f0_lo, f0_hi, igd_min, zi_min, r0t = _classify_visits(
        f_grid, f0, inv_gd, z_imag, s_re, s_im, cutoff, swc,
        jnp.ones((f0.shape[0], 1), dtype),
        nf, tf, nl, tl, multipole, mp_terms, mp_kappa, nsub,
        coarse, coarse_k,
    )
    max_visits = nl if max_visits is None else min(max_visits, nl)
    blkidx, nvisit = _visit_lists(visit, nf, nl, max_visits)

    col = lambda x: x.reshape(-1, 1)

    nlinecols = 9 if coarse else 7
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # blkidx, nvisit, submask, f0_lo, f0_hi, igd_min, zi_min
        num_scalar_prefetch=7,
        grid=(nf, max_visits),
        in_specs=[
            pl.BlockSpec(
                (1, tf), lambda i, j, b, nv, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(
                (tl, 1),
                lambda i, j, b, nv, *_: (b[i, j], 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * nlinecols,
        out_specs=pl.BlockSpec(
            (8, tf), lambda i, j, b, nv, *_: (0, i), memory_space=pltpu.VMEM
        ),
    )

    args = [
        blkidx,
        nvisit,
        submask,
        f0_lo,
        f0_hi,
        igd_min,
        zi_min,
        f_grid[None, :],
        col(f0),
        col(inv_gd),
        col(z_imag),
        col(s_re),
        col(s_im),
        col(cutoff),
        col(swc),
    ]
    if coarse:
        r0, ramp = r0t
        args += [col(r0), col(jnp.full_like(r0, 1.0 / ramp))]
    out = pl.pallas_call(
        functools.partial(_voigt_kernel, n=n, nsub=nsub,
                          coarse=bool(coarse)),
        out_shape=jax.ShapeDtypeStruct((8, nf * tf), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args)
    total = jnp.sum(out, axis=0)
    if coarse or multipole:
        total = total + mp[:, 0]
    return total[:F]


@functools.partial(
    jax.jit,
    static_argnames=(
        "tf", "tl", "n", "interpret", "multipole", "max_visits",
        "mp_terms", "mp_kappa", "nsub",
    ),
)
def voigt_sum_pol(
    f_grid,
    f0,
    inv_gd,
    z_imag,
    s_re,
    s_im,
    cutoff,
    wcut_re,
    wcut_im,
    pw,
    tf: int = 512,
    tl: int = 256,
    n: int = 24,
    interpret: bool = False,
    multipole: bool = True,
    max_visits: int | None = None,
    mp_terms: int = _MP_TERMS,
    mp_kappa: float = _MP_KAPPA,
    nsub: int = 1,
):
    """Polarized Voigt contraction: [7, F] with
    out[c] = sum_l pw[l, c] Re(s_l (w(z_l) - wcut_l)) inside the window.

    pw: [L, 7] per-line polarization weights (the Zeeman pi/sigma
    geometric matrices broadcast to pseudo-lines).  Other args as
    voigt_sum; same block-skipping and Laurent tier gating — the w(z)
    evaluation is shared across all 7 components.  For Zeeman catalogs
    small tl aligns clusters with parent lines (components spread only
    ~MHz) so the multipole collapses nearly the whole window.
    """
    F = f_grid.shape[0]
    L = f0.shape[0]
    dtype = f_grid.dtype
    nf = -(-F // tf)
    nl = -(-L // tl)
    padF = nf * tf - F

    if padF:
        f_grid = jnp.pad(f_grid, (0, padF), constant_values=f_grid[-1])
    (f0, inv_gd, z_imag, s_re, s_im, cutoff, wcut_re, wcut_im, pw
     ) = _pad_lines(nl, tl, f0, inv_gd, z_imag, s_re, s_im, cutoff,
                    wcut_re, wcut_im, pw)
    # transposed [8, L] so the kernel's weighting is a single MXU matmul
    pw8 = jnp.pad(pw.astype(dtype), ((0, 0), (0, 1))).T

    swc = s_re * wcut_re - s_im * wcut_im

    visit, submask, mp, f0_lo, f0_hi, igd_min, zi_min, _ = _classify_visits(
        f_grid, f0, inv_gd, z_imag, s_re, s_im, cutoff, swc, pw,
        nf, tf, nl, tl, multipole, mp_terms, mp_kappa, nsub,
    )
    max_visits = nl if max_visits is None else min(max_visits, nl)
    blkidx, nvisit = _visit_lists(visit, nf, nl, max_visits)

    col = lambda x: x.reshape(-1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nf, max_visits),
        in_specs=[
            pl.BlockSpec(
                (1, tf), lambda i, j, b, nv, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(
                (tl, 1),
                lambda i, j, b, nv, *_: (b[i, j], 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 7
        + [
            pl.BlockSpec(
                (8, tl),
                lambda i, j, b, nv, *_: (0, b[i, j]),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, tf), lambda i, j, b, nv, *_: (0, i),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_voigt_kernel_pol, n=n, nsub=nsub),
        out_shape=jax.ShapeDtypeStruct((8, nf * tf), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        blkidx,
        nvisit,
        submask,
        f0_lo,
        f0_hi,
        igd_min,
        zi_min,
        f_grid[None, :],
        col(f0),
        col(inv_gd),
        col(z_imag),
        col(s_re),
        col(s_im),
        col(cutoff),
        col(swc),
        pw8,
    )
    total = out[:7]
    if multipole:
        total = total + mp.T[:7]
    return total[:, :F]
