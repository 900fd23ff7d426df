"""Parent-pole multipole kernel for Zeeman polarized absorption.

The reference evaluates Faddeeva::w per (Zeeman component, frequency)
(/root/reference/src/core/lbl/lbl_lineshape_voigt_lte.cpp:186-204 with the
component expansion of lbl_zeeman.h:234-409) — ~30 pseudo-lines per parent
line.  But the components of one parent spread only ~MHz around the parent
center (mu_B/h * H * (Mu gu - Ml gl), lbl_zeeman.h:342) while the Voigt
asymptotic radius is ~10 MHz and the cutoff window is ~GHz: beyond a tiny
per-parent near radius the whole Zeeman structure provably collapses into
a P-term pole expansion around the PARENT:

    sum_k pw_kc s_k w_k(f)  ~  sum_j M_jc (R_p / (f - c_p))^j,

so the lines x freqs contraction shrinks ~30x, from (pseudo-lines x freqs)
to (parents x freqs).  No reference analogue — the reference walks every
component (lbl_lineshape_voigt_lte.cpp:1652).

Pipeline (all shapes static):
  1. `zeeman_pole_moments` (XLA): per-level per-pole complex moments
     M_j[c] via dense slot sums over the padded component grid
     (lbl.zeeman.pad_zeeman_catalog — component-major [CM, NP] buckets
     sized to the per-parent component counts); pole centers
     c_p = f0s_p - i G0_p (components share the parent's broadening), a
     scale R_p >= component spread, and a near radius
     r_p = max(kappa R_p, R_p + sqrt(2*ASYM_R2)/igd) guaranteeing both
     the per-component Laurent-3 gate and the moment truncation.
  2. `_zeeman_mp_kernel` (Pallas): dense [parents x freqs] evaluation,
     one grid step per (level, freq tile, parent block); u = R/(f - c) on
     the VPU, the per-term component contraction M_j^T @ U_j on the MXU;
     in-window masking at parent granularity (components of one parent
     share the cutoff; the <= R_p window-edge blur is far below the
     kernel guard).  Levels ride the grid — one launch per profile.
  3. `near_correction` (XLA): the few grid points per parent inside r_p
     (usually 0-1 at microwave grids) evaluated exactly per component
     (Weideman w(z)) and accumulated scatter-free via a one-hot MXU
     contraction plus static shifts.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .voigt_kernel import _ASYM_R2, _LAURENT_C, _reciprocal, _wofz_parts

_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def zeeman_pole_moments(
    f0_k, igd_k, zi_k, sr_k, si_k, swc_k, pw_k,
    terms: int, kappa: float,
):
    """Per-pole expansion data from a padded [CM, NP] component grid.

    Dense slot reductions (padding has strength 0) — the ragged
    pseudo-line layout needed gathers + segment scatters, which dominate
    on TPU.  Component-MAJOR layout: the slot axis rides the sublanes
    and the (large) pole axis the lanes, so small-CM buckets
    (lbl.zeeman.pad_zeeman_catalog) pad to 8 sublanes instead of 128
    lanes.  pw_k: [CM, NP, C].  Returns dict of [NP(, ...)] arrays.
    """
    mask = sr_k != 0.0
    cnt = jnp.maximum(jnp.sum(mask, axis=0).astype(f0_k.dtype), 1.0)
    igd_s = jnp.where(igd_k > 0, igd_k, 1.0)
    msum = lambda x: jnp.sum(jnp.where(mask, x, 0.0), axis=0)
    c_re = msum(f0_k) / cnt
    G0_k = zi_k / igd_s
    G0_p = msum(G0_k) / cnt  # shared per parent
    igd_p = msum(igd_k) / cnt
    igd_ps = jnp.where(igd_p > 0, igd_p, 1.0)

    # R floor = the pole's Doppler width: igd R >= 1 keeps the scaled
    # Laurent strengths (1/(igd R))^(2k+1) and the powers u^j within f32
    # range (a 1 Hz floor overflows them for single-component parents)
    dp = jnp.where(mask, f0_k - c_re[None, :], 0.0)
    R = jnp.maximum(
        jnp.sqrt(jnp.max(dp * dp, axis=0)), 1.0 / igd_ps
    )
    q = dp / R[None, :]  # real, |q| <= 1

    # per-component Laurent strengths b_k = i s c_k / (igd R)^(2k+1),
    # scaled by R^-(2k+1) so moments stay O(1) in f32
    igdR = jnp.maximum(igd_k * R[None, :], 1e-3)
    A = []
    for k in range(3):
        scale = _LAURENT_C[k] / igdR ** (2 * k + 1) * _INV_SQRT_PI
        # i * (sr + i si) * scale = (-si + i sr) * scale
        A.append((-si_k * scale, sr_k * scale))

    # moments M_j[c] = sum_k pw_kc sum_kk binom(j-1, 2kk) A_kk q^(j-2kk-1)
    qp = [jnp.ones_like(q)]
    for _ in range(terms - 1):
        qp.append(qp[-1] * q)
    wsum = lambda x: jnp.einsum(
        "kp,kpc->pc", jnp.where(mask, x, 0.0), pw_k,
        precision=jax.lax.Precision.HIGHEST,
    )
    M_re, M_im = [], []
    for j in range(1, terms + 1):
        ar = jnp.zeros_like(q)
        ai = jnp.zeros_like(q)
        for k in range(3):
            m = j - 2 * k - 1
            if m < 0:
                continue
            cb = math.comb(j - 1, 2 * k)
            ar = ar + cb * A[k][0] * qp[m]
            ai = ai + cb * A[k][1] * qp[m]
        M_re.append(wsum(ar))  # [NP, C]
        M_im.append(wsum(ai))
    M_re = jnp.stack(M_re, axis=1)  # [NP, P, C]
    M_im = jnp.stack(M_im, axis=1)
    swcsum = wsum(swc_k)  # [NP, C]

    # near radius: moment truncation (kappa R) AND every component's
    # Laurent-3 asymptotic gate (|z|^2 >= 2 ASYM_R2 at distance r - R)
    zi_p = G0_p * igd_p
    asym_gap = jnp.sqrt(
        jnp.maximum(2.0 * _ASYM_R2 - zi_p * zi_p, 0.0)
    ) / igd_ps
    r_near = jnp.maximum(kappa * R, R + asym_gap)
    return dict(
        c_re=c_re, g0=G0_p, R=R, rnear2=r_near * r_near, rnear=r_near,
        M_re=M_re, M_im=M_im, swcsum=swcsum, count=cnt,
    )


def _zeeman_mp_kernel(
    f_ref,      # [1, TF]
    cre_ref,    # [1, PB, 1]
    g0_ref,     # [1, PB, 1]
    R_ref,      # [1, PB, 1]
    rn2_ref,    # [1, PB, 1]
    cut_ref,    # [PB, 1]     (level-independent)
    m_ref,      # [1, 1, 8, (2 P + 1) PB]  [Mr_0..Mr_P-1, -Mi_0.., swcsum]
    out_ref,    # [1, 8, TF]
    *,
    terms,
):
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f = f_ref[0, :][None, :]           # [1, TF]
    cre = cre_ref[0]                   # [PB, 1]
    g0 = g0_ref[0]
    dr = f - cre                       # [PB, TF]
    d2 = dr * dr + g0 * g0
    inwin = jnp.abs(dr) <= cut_ref[:]  # parent-granularity cutoff window
    far = d2 >= rn2_ref[0]
    mask = inwin & far
    invR = _reciprocal(d2) * R_ref[0]
    zero = jnp.zeros_like(dr)
    # u = R (dr - i G0) / |f - c|^2, masked (also kills padded parents)
    ur = jnp.where(mask, dr * invR, zero)
    ui = jnp.where(mask, -(g0 * invR), zero)

    # all Horner powers + the cutoff-subtraction indicator stacked along
    # the contraction axis: wide matmuls instead of dozens of tiny dots
    # (which serialize on the MXU).  Mixed precision: the leading
    # ``hi_terms`` term chunks run at HIGHEST (their bf16 rounding would
    # cost ~1e-3 of the result), the geometrically-smaller tail —
    # |term j| <= (1/kappa)^(j-1) of the lead — at fast DEFAULT, keeping
    # the tail's bf16 error ~1e-4 relative while paying the 6-pass
    # HIGHEST cost only on 2 of 2P+1 chunks.
    Ur, Ui = ur, ui
    urs, uis = [], []
    for j in range(terms):
        urs.append(Ur)
        uis.append(Ui)
        if j < terms - 1:
            Ur, Ui = Ur * ur - Ui * ui, Ur * ui + Ui * ur
    pb = ur.shape[0]
    hi_terms = 1
    chunks = urs + uis + [-(inwin.astype(jnp.float32))]
    hi_idx = list(range(hi_terms)) + list(range(terms, terms + hi_terms))
    lo_idx = [i for i in range(len(chunks)) if i not in hi_idx]
    dot = lambda ks, prec: jax.lax.dot_general(
        jnp.concatenate(
            [m_ref[0, 0, :, k * pb:(k + 1) * pb] for k in ks], axis=1
        ),
        jnp.concatenate([chunks[k] for k in ks], axis=0),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[0] += dot(hi_idx, jax.lax.Precision.HIGHEST) + dot(
        lo_idx, jax.lax.Precision.DEFAULT
    )


@functools.partial(
    jax.jit, static_argnames=("terms", "tf", "pb", "interpret")
)
def zeeman_mp_eval(
    f_grid, c_re, g0, R, rnear2, cutoff, M_re, M_im, swcsum,
    terms: int = 6, tf: int = 512, pb: int = 128, interpret: bool = False,
):
    """Dense parent-pole expansion field: [Z, 8, F] (7 components used).

    c_re/g0/R/rnear2: [Z, NP]; cutoff: [NP]; M_re/M_im: [Z, NP, P, C<=8];
    swcsum: [Z, NP, C].  One pallas launch covers all levels.
    """
    Z, NP = c_re.shape
    F = f_grid.shape[0]
    dtype = f_grid.dtype
    nf = -(-F // tf)
    npb = -(-NP // pb)
    padF = nf * tf - F
    padP = npb * pb - NP
    if padF:
        f_grid = jnp.pad(f_grid, (0, padF), constant_values=f_grid[-1])
    if padP:
        padz = lambda x: jnp.pad(x, ((0, 0), (0, padP)))
        c_re = jnp.pad(c_re, ((0, 0), (0, padP)), constant_values=1e30)
        g0 = padz(g0)
        R = padz(R)
        # padded parents: rnear2 huge -> never far -> masked out
        rnear2 = jnp.pad(rnear2, ((0, 0), (0, padP)), constant_values=jnp.inf)
        cutoff = jnp.pad(cutoff, (0, padP), constant_values=-1.0)
        M_re = jnp.pad(M_re, ((0, 0), (0, padP), (0, 0), (0, 0)))
        M_im = jnp.pad(M_im, ((0, 0), (0, padP), (0, 0), (0, 0)))
        swcsum = jnp.pad(swcsum, ((0, 0), (0, padP), (0, 0)))
    NPp = npb * pb
    C = M_re.shape[-1]
    if C < 8:
        M_re = jnp.pad(M_re, ((0, 0), (0, 0), (0, 0), (0, 8 - C)))
        M_im = jnp.pad(M_im, ((0, 0), (0, 0), (0, 0), (0, 8 - C)))
        swcsum = jnp.pad(swcsum, ((0, 0), (0, 0), (0, 8 - C)))

    # moment layout for the kernel: one [8, (2P+1) pb] matrix per
    # (level, parent block), K-chunks [Mr_0..Mr_P-1, -Mi_0.., swcsum]
    # matching the kernel's stacked-powers contraction
    m_stack = jnp.concatenate(
        [
            M_re.transpose(0, 2, 3, 1),      # [Z, P, 8, NP]
            -M_im.transpose(0, 2, 3, 1),
            swcsum.transpose(0, 2, 1)[:, None],  # [Z, 1, 8, NP]
        ],
        axis=1,
    )  # [Z, 2P+1, 8, NP]
    nk = 2 * terms + 1
    m_all = (
        m_stack.reshape(Z, nk, 8, npb, pb)
        .transpose(0, 3, 2, 1, 4)
        .reshape(Z, npb, 8, nk * pb)
    )

    col3 = lambda x: x.reshape(Z, NPp, 1)

    out = pl.pallas_call(
        functools.partial(_zeeman_mp_kernel, terms=terms),
        out_shape=jax.ShapeDtypeStruct((Z, 8, nf * tf), dtype),
        grid=(Z, nf, npb),
        in_specs=[
            pl.BlockSpec((1, tf), lambda z, i, b: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pb, 1), lambda z, i, b: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pb, 1), lambda z, i, b: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pb, 1), lambda z, i, b: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pb, 1), lambda z, i, b: (z, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1), lambda z, i, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, nk * pb), lambda z, i, b: (z, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tf), lambda z, i, b: (z, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        f_grid[None, :],
        col3(c_re),
        col3(g0),
        col3(R),
        col3(rnear2),
        cutoff.reshape(NPp, 1),
        m_all,
    )
    return out[:, :, :F]


def near_correction(
    f_grid, out, c_re, g0, rnear, cutoff,
    f0_k, igd_k, zi_k, sr_k, si_k, pw_k,
    noff: int = 6, wofz_n: int = 16,
):
    """Exact per-component evaluation at the few grid points inside each
    pole's near radius, scatter-added onto the expansion field.

    out: [Z, 8, F] from zeeman_mp_eval; c_re/g0/rnear: [Z, NP];
    component grids f0_k/igd_k/zi_k/sr_k/si_k: [Z, CM, NP]
    (component-major — see zeeman_pole_moments); pw_k: [CM, NP, C];
    cutoff: [NP].  The near mask is the EXACT complement of the
    kernel's far mask (distance to the POLE, imag part included — a
    heavily broadened pole needs no correction even at dr ~ 0).
    noff: static candidate points per pole; must cover
    ceil(2 max rnear / grid spacing) + 2 (tuner-checked).
    """
    Z, NP = c_re.shape
    F = f_grid.shape[0]
    i0 = jnp.searchsorted(f_grid, c_re.reshape(-1)).reshape(Z, NP)
    offs = jnp.arange(noff, dtype=jnp.int32) - (noff // 2)
    tgt = i0[:, :, None] + offs[None, None, :]  # unclipped targets
    inrange = (tgt >= 0) & (tgt < F)
    cand = jnp.clip(tgt, 0, F - 1)
    fo = f_grid[cand]  # [Z, NP, O]
    dr = fo - c_re[:, :, None]
    d2 = dr * dr + (g0 * g0)[:, :, None]
    pmask = inrange & (d2 < (rnear * rnear)[:, :, None]) & (
        jnp.abs(dr) <= cutoff[None, :, None]
    )

    # exact component values at the pole's candidates, laid out
    # [Z, O, CM, NP] so the minor dims stay the wide (CM, NP) pair
    foT = jnp.moveaxis(fo, 2, 1)  # [Z, O, NP]
    zr = igd_k[:, None] * (foT[:, :, None, :] - f0_k[:, None])
    zi = jnp.broadcast_to(zi_k[:, None], zr.shape)
    wr, wi = _wofz_parts(zr, zi, wofz_n)
    val = sr_k[:, None] * wr - si_k[:, None] * wi  # [Z, O, CM, NP]
    corr = jnp.einsum(
        "zokp,kpc->zpoc", val, pw_k,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Z, NP, O, C]
    corr = jnp.where(pmask[..., None], corr, 0.0)
    C = corr.shape[-1]
    corr8 = jnp.pad(corr, ((0, 0), (0, 0), (0, 0), (0, 8 - C)))

    # scatter-free accumulation: a TPU scatter-add serializes its updates
    # (~0.5 ms per level measured).  i0 is ascending (poles sorted by
    # f0), so sum-by-target is an exact prefix-sum difference:
    # dense[f] = csum[first pole with i0 > f] - csum[first pole with
    # i0 >= f] — two gathers per frequency, no matmul, full f32.
    # contract against the pole -> i0 one-hot on the MXU (one-hot entries
    # are exact in bf16); corr is split hi + lo so two fast DEFAULT
    # passes reach f32 accuracy without the 6-pass HIGHEST cost
    onehot = (
        i0[:, :, None] == jnp.arange(F, dtype=jnp.int32)[None, None, :]
    ).astype(out.dtype)  # [Z, NP, F]
    dense = jnp.einsum("znoc,znf->zocf", corr8, onehot,
                       precision=jax.lax.Precision.HIGHEST)  # [Z, O, 8, F]
    for o in range(noff):
        k = int(o - (noff // 2))
        m = dense[:, o]
        if k > 0:
            m = jnp.pad(m, ((0, 0), (0, 0), (k, 0)))[:, :, :F]
        elif k < 0:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, -k)))[:, :, -k:]
        out = out + m
    return out
