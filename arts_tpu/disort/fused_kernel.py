"""Fully fused Pallas TPU path for the DISORT per-frequency solve.

Parity: the reference's per-frequency chain `diagonalize` ->
`solve_for_coefs` -> `u/u0` assembly (/root/reference/src/core/disort-cpp/
disort.cpp:323-430, :181, :700-820), which it runs as per-thread LAPACK
calls inside an OpenMP frequency loop (src/m_disort.cc:37-47).

TPU-first design: three streaming kernels over a (freq-block, layer)
grid, with the (frequency x Fourier-mode) extent flattened into the
128-lane axis and every small-matrix operation unrolled over static
N x N indices on (S, 128) vreg tiles:

  stage 1  eigen + particular sources   grid (fb, l): phase matrices ->
           Cholesky/Jacobi eigenstructure (eigen_kernel.eigen_core) +
           thermal & beam particular solutions; streams Gp/Gm/Ek and the
           particular radiances to HBM exactly once.
  stage 2  BVP forward elimination      grid (fb, l), l sequential:
           the structured block-tridiagonal Thomas factorization
           (solver._solve_block_tridiag_structured's recurrence) with the
           rank-N carries (W, uy) resident in VMEM scratch across grid
           steps; streams per-layer factors (P, y) out.
  stage 3  back-substitution + radiance grid (fb, l) reversed: X_l, then
           the level radiances u/v directly — no [L, M, 2N, 2N] block
           tensor ever exists in HBM.

The old XLA cyclic-reduction path (solver.solve_block_tridiag_cr_*)
materialized the block tridiagonal plus ~log2(L) levels of half-block
factors in HBM (~0.5 GB round-trip per 4096-freq solve); this path
moves each eigen factor exactly twice (write once, read once) — about
15x less DISORT-stage wall time at the bench shape.

The public wrapper `fused_u_lvl` is custom_vmap-wrapped so the
per-frequency vmap in fwd_allsky collapses into the kernels' lane axis.
Like fused_eigen it is inference-path only (no custom VJP); autodiff
uses the XLA path (fast_linalg=False).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.eigh_jacobi import _default_sweeps
from .eigen_kernel import eigen_core


def _is0(x):
    return isinstance(x, (int, float)) and x == 0.0


def _mul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    if isinstance(a, (int, float)) and a == 1.0:
        return b
    if isinstance(b, (int, float)) and b == 1.0:
        return a
    return a * b


def _sub(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return -b
    return a - b


def _add(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return b
    return a + b


def _ge_solve(A, B):
    """Gaussian elimination (no pivoting) on tile lists: A X = B.

    A: n x n nested list of tiles; B: n x k nested list (columns may be
    the static floats 0.0/1.0 — sparsity is skipped symbolically, which
    matters for the [0; I] identity RHS of the BVP factor solve).
    Same contract as ops.smallalg.solve_unrolled: diagonally-dominant
    systems only.
    """
    n = len(A)
    k = len(B[0])
    A = [row[:] for row in A]
    B = [row[:] for row in B]
    for i in range(n):
        inv = 1.0 / A[i][i]
        for j in range(i + 1, n):
            A[i][j] = _mul(A[i][j], inv)
        for j in range(k):
            B[i][j] = _mul(B[i][j], inv)
        for r in range(i + 1, n):
            f = A[r][i]
            for j in range(i + 1, n):
                A[r][j] = _sub(A[r][j], _mul(f, A[i][j]))
            for j in range(k):
                B[r][j] = _sub(B[r][j], _mul(f, B[i][j]))
    X = [[None] * k for _ in range(n)]
    for i in range(n - 1, -1, -1):
        for j in range(k):
            acc = B[i][j]
            for r in range(i + 1, n):
                acc = _sub(acc, _mul(A[i][r], X[r][j]))
            X[i][j] = acc
    return X


def _matmul(A, B):
    """Tile-list matmul: [p x q] @ [q x r] -> [p x r] with zero skipping."""
    p, q, r = len(A), len(B), len(B[0])
    out = [[0.0] * r for _ in range(p)]
    for i in range(p):
        for j in range(r):
            acc = 0.0
            for t in range(q):
                acc = _add(acc, _mul(A[i][t], B[t][j]))
            out[i][j] = acc
    return out


def _matvec(A, x):
    p, q = len(A), len(x)
    out = []
    for i in range(p):
        acc = 0.0
        for t in range(q):
            acc = _add(acc, _mul(A[i][t], x[t]))
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# stage 1: eigen + particular solutions
# ---------------------------------------------------------------------------


def _stage1_kernel(
    pp_ref, pm_ref, om_ref, dtau_ref, tb0_ref, tb1_ref,
    *rest,
    n, sweeps, mu, w, mu0, has_beam,
):
    if has_beam:
        (qp_ref, qm_ref, ebt_ref, ebb_ref,
         ek_ref, gp_ref, gm_ref, ut_ref, vt_ref, ub_ref, vb_ref) = rest
    else:
        (ek_ref, gp_ref, gm_ref, ut_ref, vt_ref, ub_ref, vb_ref) = rest

    Pp = [[pp_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    Pm = [[pm_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    om = om_ref[0]
    dtau = dtau_ref[0]

    kk, ek, Gp, Gm, H1, H2 = eigen_core(
        Pp, Pm, om, dtau, n=n, sweeps=sweeps, mu=mu, w=w
    )
    for j in range(n):
        ek_ref[0, j] = ek[j]
    for i in range(n):
        for j in range(n):
            gp_ref[0, i * n + j] = Gp[i][j]
            gm_ref[0, i * n + j] = Gm[i][j]

    # alpha+-beta operators from the H matrices: S1/2 = H1/2 / (F_i F_j),
    # ApB[i][j] = -S1[i][j] w_j / mu_i, AmB from S2 (solver.py:530-531)
    Fq = [float(np.sqrt(w[i] / mu[i])) for i in range(n)]
    ApB = [[None] * n for _ in range(n)]
    AmB = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            sc = -w[j] / (Fq[i] * Fq[j] * mu[i])
            ApB[i][j] = sc * H1[i][j]
            AmB[i][j] = sc * H2[i][j]

    # thermal particular (solver.py:574-587): tb0/tb1 arrive pre-masked
    # (mode-0 lanes only) and pre-multiplied by (1 - omega'):
    #   g1 = tb1 / mu ; g0v = tb0 / mu
    #   q1 = AmB^-1 g1 ; p-r = 2 ApB^-1 q1 ; p+r = 2 AmB^-1 g0v
    tb0 = tb0_ref[0]
    tb1 = tb1_ref[0]
    # one shared AmB factorization for both thermal solves
    g_cols = [
        [tb1 * (1.0 / mu[i]), tb0 * (1.0 / mu[i])] for i in range(n)
    ]
    sol_t = _ge_solve(AmB, g_cols)
    q1 = [sol_t[i][0] for i in range(n)]
    p_plus_r = [2.0 * sol_t[i][1] for i in range(n)]
    p_minus_r = [2.0 * r[0] for r in _ge_solve(ApB, [[q] for q in q1])]
    p0 = [0.5 * (p_plus_r[i] + p_minus_r[i]) for i in range(n)]
    r0 = [0.5 * (p_plus_r[i] - p_minus_r[i]) for i in range(n)]

    up_top = list(p0)
    vp_top = list(r0)
    up_bot = [p0[i] + q1[i] * dtau for i in range(n)]
    vp_bot = [r0[i] + q1[i] * dtau for i in range(n)]

    if has_beam:
        # beam particular (solver.py:536-554): qp/qm arrive with the
        # (2-delm0) fbeam omega'/4pi prefactor applied per lane
        qp = [qp_ref[0, i] for i in range(n)]
        qm = [qm_ref[0, i] for i in range(n)]
        Amat = _matmul(ApB, AmB)
        spm = [(qp[i] + qm[i]) / mu[i] for i in range(n)]
        dpm = [(qp[i] - qm[i]) / (mu[i] * mu0) for i in range(n)]
        rhs_s = [_sub(a, b) for a, b in zip(_matvec(ApB, spm), dpm)]
        inv_mu02 = 1.0 / (mu0 * mu0)
        Asys = [row[:] for row in Amat]
        for i in range(n):
            Asys[i][i] = Asys[i][i] - inv_mu02
        s = [r[0] for r in _ge_solve(Asys, [[x] for x in rhs_s])]
        d = [
            -mu0 * _sub(v, spm[i])
            for i, v in enumerate(_matvec(AmB, s))
        ]
        zp = [0.5 * (s[i] + d[i]) for i in range(n)]
        zm = [0.5 * (s[i] - d[i]) for i in range(n)]
        ebt = ebt_ref[0]
        ebb = ebb_ref[0]
        for i in range(n):
            up_top[i] = up_top[i] + zp[i] * ebt
            vp_top[i] = vp_top[i] + zm[i] * ebt
            up_bot[i] = up_bot[i] + zp[i] * ebb
            vp_bot[i] = vp_bot[i] + zm[i] * ebb

    for i in range(n):
        ut_ref[0, i] = up_top[i]
        vt_ref[0, i] = vp_top[i]
        ub_ref[0, i] = up_bot[i]
        vb_ref[0, i] = vp_bot[i]


# ---------------------------------------------------------------------------
# stage 2: BVP forward elimination (structured Thomas)
# ---------------------------------------------------------------------------


def _stage2_kernel(
    gp_ref, gm_ref, ek_ref, rhs_ref, rsurf_ref,
    p_ref, y_ref,
    w_scr, uy_scr,
    *, n, L,
):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        w_scr[...] = jnp.zeros_like(w_scr)
        uy_scr[...] = jnp.zeros_like(uy_scr)

    Gp = [[gp_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    Gm = [[gm_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    ek = [ek_ref[0, j] for j in range(n)]
    GpE = [[Gp[i][j] * ek[j] for j in range(n)] for i in range(n)]
    GmE = [[Gm[i][j] * ek[j] for j in range(n)] for i in range(n)]

    # U = [GmE | Gp], T = -[Gp | GmE]  (solver.py:144-145)
    U = [GmE[i] + Gp[i] for i in range(n)]
    T = [[-x for x in Gp[i] + GmE[i]] for i in range(n)]

    Wprev = [[w_scr[i * n + j] for j in range(n)] for i in range(n)]
    uyprev = [uy_scr[i] for i in range(n)]

    # rows A: -[Gm | GpE] - Wprev T  (the l = 0 sign flip is folded into
    # the rhs by the caller — row scaling leaves the solution unchanged)
    WT = _matmul(Wprev, T)
    Arows = [
        [_sub(-x, WT[i][j]) for j, x in enumerate(Gm[i] + GpE[i])]
        for i in range(n)
    ]
    # rows B: [GpE | Gm] - (l == L-1) Rsurf U
    Rs = [[rsurf_ref[i * n + j] for j in range(n)] for i in range(n)]
    RU = _matmul(Rs, U)
    is_last = jnp.where(l == L - 1, 1.0, 0.0).astype(ek[0].dtype)
    Brows = [
        [_sub(x, _mul(is_last, RU[i][j])) for j, x in enumerate(GpE[i] + Gm[i])]
        for i in range(n)
    ]
    D = Arows + Brows  # 2n x 2n

    # rhs with the A-part reduced by uyprev
    rmod = [rhs_ref[0, i] - uyprev[i] for i in range(n)] + [
        rhs_ref[0, n + i] for i in range(n)
    ]
    # solve D [P | y] = [[0; I] | rmod]
    B = [[0.0] * (n + 1) for _ in range(2 * n)]
    for j in range(n):
        B[n + j][j] = 1.0
    for i in range(2 * n):
        B[i][n] = rmod[i]
    sol = _ge_solve(D, B)
    P = [[sol[i][j] for j in range(n)] for i in range(2 * n)]
    y = [sol[i][n] for i in range(2 * n)]

    W = _matmul(U, P)  # [n x 2n] @ [2n x n]
    uy = _matvec(U, y)
    for i in range(n):
        uy_scr[i] = uy[i]
        for j in range(n):
            w_scr[i * n + j] = W[i][j]
    for i in range(2 * n):
        y_ref[0, i] = y[i]
        for j in range(n):
            p_ref[0, i * n + j] = P[i][j]


# ---------------------------------------------------------------------------
# stage 3: back-substitution + level radiances
# ---------------------------------------------------------------------------


def _stage3_kernel(
    p_ref, y_ref, gp_ref, gm_ref, ek_ref,
    ut_ref, vt_ref, ub_ref, vb_ref,
    utop_ref, vtop_ref, ubot_ref, vbot_ref,
    t_scr,
    *, n, L,
):
    i_rev = pl.program_id(1)

    @pl.when(i_rev == 0)
    def _():
        t_scr[...] = jnp.zeros_like(t_scr)

    t = [t_scr[q] for q in range(n)]
    P = [[p_ref[0, i * n + j] for j in range(n)] for i in range(2 * n)]
    y = [y_ref[0, i] for i in range(2 * n)]
    X = [_sub(y[i], v) for i, v in enumerate(_matvec(P, t))]
    Cp = X[:n]
    Cm = X[n:]

    Gp = [[gp_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    Gm = [[gm_ref[0, i * n + j] for j in range(n)] for i in range(n)]
    ek = [ek_ref[0, j] for j in range(n)]
    GpE = [[Gp[i][j] * ek[j] for j in range(n)] for i in range(n)]
    GmE = [[Gm[i][j] * ek[j] for j in range(n)] for i in range(n)]

    # carry for layer l-1: t_new = -[Gp | GmE] X  (solver.py:174-177)
    GpX = _matvec(Gp, Cp)
    GmEX = _matvec(GmE, Cm)
    for q in range(n):
        t_scr[q] = -(GpX[q] + GmEX[q])

    # level radiances (solver.py:700-710)
    GmX = _matvec(Gm, Cp)
    GpEX = _matvec(GpE, Cm)
    GpEXp = _matvec(GpE, Cp)
    GmXm = _matvec(Gm, Cm)
    GmEXp = _matvec(GmE, Cp)
    GpXm = _matvec(Gp, Cm)
    for q in range(n):
        utop_ref[0, q] = GpX[q] + GmEX[q] + ut_ref[0, q]
        vtop_ref[0, q] = GmX[q] + GpEX[q] + vt_ref[0, q]
        ubot_ref[0, q] = GpEXp[q] + GmXm[q] + ub_ref[0, q]
        vbot_ref[0, q] = GmEXp[q] + GpXm[q] + vb_ref[0, q]


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


def _pad_lanes(x, T, S):
    """[..., B] -> [..., T, 128] zero-padded lane layout (T rows of 128)."""
    B = x.shape[-1]
    pad = T * 128 - B
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], -1
        )
    return x.reshape(x.shape[:-1] + (T, 128))


@functools.lru_cache(maxsize=None)
def _make_fused(n, L, M, mu, w, mu0, has_beam, sweeps, sub, interpret):
    """Build the three-kernel fused path for static (n, L, M, quadrature)."""
    nq2 = 2 * n

    def impl(leg_scaled, omega_p, dtau_p, tb0, tb1, qp, qm, ebea,
             rsurf, b_neg, rhs_surf, lam, sign):
        # batched shapes: [F, L, nlegc], [F, L], [F, M, L], [F, M, L, n],
        # [F, L+1], [F, M, n, n], [F, M, n]; lam/sign/lam0 static tables
        F = leg_scaled.shape[0]
        dt = leg_scaled.dtype
        # static tables in the working dtype (numpy f64 operands would
        # upcast the whole solve under x64 mode)
        lam = jnp.asarray(lam, dt)
        sign = jnp.asarray(sign, dt)
        MF = M * F
        S = sub
        nfb = -(-MF // (S * 128))
        T = nfb * S

        # ---- lane layouts ----
        # Pp/Pm: einsum straight into [L, n*n, M, F] then lane-pad
        Pp = jnp.einsum("flk,mki,mkj->lijmf", leg_scaled, lam, lam)
        Pm = jnp.einsum(
            "flk,mk,mki,mkj->lijmf", leg_scaled, sign, lam, lam
        )
        Pp_f = _pad_lanes(Pp.reshape(L, n * n, MF), T, S)
        Pm_f = _pad_lanes(Pm.reshape(L, n * n, MF), T, S)

        def vecMF(x):  # [F, M, L] -> [L, T, 128]
            return _pad_lanes(
                jnp.transpose(x, (2, 1, 0)).reshape(L, MF), T, S
            )

        def vecF(x):  # [F, L] -> broadcast over modes -> [L, T, 128]
            return vecMF(jnp.broadcast_to(x[:, None, :], (F, M, L)))

        om_f = vecF(omega_p)
        dtau_f = vecF(dtau_p)
        tb0_f = vecMF(tb0)
        tb1_f = vecMF(tb1)

        specV = pl.BlockSpec((1, S, 128), lambda fb, l: (l, fb, 0))
        specM = pl.BlockSpec((1, n * n, S, 128), lambda fb, l: (l, 0, fb, 0))
        specN = pl.BlockSpec((1, n, S, 128), lambda fb, l: (l, 0, fb, 0))
        spec2N = pl.BlockSpec(
            (1, nq2, S, 128), lambda fb, l: (l, 0, fb, 0)
        )
        specP = pl.BlockSpec(
            (1, nq2 * n, S, 128), lambda fb, l: (l, 0, fb, 0)
        )
        specRs = pl.BlockSpec((n * n, S, 128), lambda fb, l: (0, fb, 0))

        in1 = [specM, specM, specV, specV, specV, specV]
        args1 = [Pp_f, Pm_f, om_f, dtau_f, tb0_f, tb1_f]
        if has_beam:
            qp_f = _pad_lanes(
                jnp.transpose(qp, (2, 3, 1, 0)).reshape(L, n, MF), T, S
            )
            qm_f = _pad_lanes(
                jnp.transpose(qm, (2, 3, 1, 0)).reshape(L, n, MF), T, S
            )
            ebt_f = vecF(ebea[:, :-1])
            ebb_f = vecF(ebea[:, 1:])
            in1 += [specN, specN, specV, specV]
            args1 += [qp_f, qm_f, ebt_f, ebb_f]

        mk = lambda rows: jax.ShapeDtypeStruct((L, rows, T, 128), dt)
        ek_f, gp_f, gm_f, ut_f, vt_f, ub_f, vb_f = pl.pallas_call(
            functools.partial(
                _stage1_kernel, n=n, sweeps=sweeps, mu=mu, w=w, mu0=mu0,
                has_beam=has_beam,
            ),
            grid=(nfb, L),
            in_specs=in1,
            out_specs=[specN, specM, specM, specN, specN, specN, specN],
            out_shape=[
                mk(n), mk(n * n), mk(n * n), mk(n), mk(n), mk(n), mk(n)
            ],
            interpret=interpret,
        )(*args1)

        # ---- rhs assembly (lane layout, all vector-sized) ----
        bneg_f = _pad_lanes(
            jnp.transpose(b_neg, (2, 1, 0)).reshape(n, MF), T, S
        )
        rsurfv_f = _pad_lanes(
            jnp.transpose(rhs_surf, (2, 1, 0)).reshape(n, MF), T, S
        )
        rsurf_f = _pad_lanes(
            jnp.transpose(rsurf, (2, 3, 1, 0)).reshape(n * n, MF), T, S
        )
        # A rows: l = 0 -> -(b_neg - vp_top[0])  [sign-flip: stage 2 uses
        # -[Gm | GpE] for every layer]; l >= 1 -> vp_top[l] - vp_bot[l-1]
        A0 = -(bneg_f - vt_f[0])[None]
        Al = vt_f[1:] - vb_f[:-1]
        # B rows: l <= L-2 -> up_top[l+1] - up_bot[l];
        # l = L-1 -> rhs_surf - up_bot + Rsurf vp_bot
        Bl = ut_f[1:] - ub_f[:-1]
        R4 = rsurf_f.reshape(n, n, T, 128)
        Rvb = jnp.einsum("ijtl,jtl->itl", R4, vb_f[-1])
        BL = (rsurfv_f - ub_f[-1] + Rvb)[None]
        rhs_f = jnp.concatenate(
            [
                jnp.concatenate([A0, Al], 0),
                jnp.concatenate([Bl, BL], 0),
            ],
            1,
        )  # [L, 2n, T, 128]

        p_f, y_f = pl.pallas_call(
            functools.partial(_stage2_kernel, n=n, L=L),
            grid=(nfb, L),
            in_specs=[specM, specM, specN, spec2N, specRs],
            out_specs=[specP, spec2N],
            out_shape=[mk(nq2 * n), mk(nq2)],
            scratch_shapes=[
                pltpu.VMEM((n * n, S, 128), dt),
                pltpu.VMEM((n, S, 128), dt),
            ],
            interpret=interpret,
        )(gp_f, gm_f, ek_f, rhs_f, rsurf_f)

        rev = lambda fb, i: (L - 1 - i, 0, fb, 0)
        specMr = pl.BlockSpec((1, n * n, S, 128), rev)
        specNr = pl.BlockSpec((1, n, S, 128), rev)
        spec2Nr = pl.BlockSpec((1, nq2, S, 128), rev)
        specPr = pl.BlockSpec((1, nq2 * n, S, 128), rev)

        utop_f, vtop_f, ubot_f, vbot_f = pl.pallas_call(
            functools.partial(_stage3_kernel, n=n, L=L),
            grid=(nfb, L),
            in_specs=[
                specPr, spec2Nr, specMr, specMr, specNr,
                specNr, specNr, specNr, specNr,
            ],
            out_specs=[specNr, specNr, specNr, specNr],
            out_shape=[mk(n), mk(n), mk(n), mk(n)],
            scratch_shapes=[
                pltpu.VMEM((n, S, 128), dt),
            ],
            interpret=interpret,
        )(p_f, y_f, gp_f, gm_f, ek_f, ut_f, vt_f, ub_f, vb_f)

        def unpack(x):  # [L, n, T, 128] -> [F, M, L, n]
            flat = x.reshape(L, n, T * 128)[..., :MF]
            return jnp.transpose(
                flat.reshape(L, n, M, F), (3, 2, 0, 1)
            )

        u_top = unpack(utop_f)
        v_top = unpack(vtop_f)
        u_bot = unpack(ubot_f)
        v_bot = unpack(vbot_f)
        u_lvl = jnp.concatenate([u_top, u_bot[:, :, -1:]], 2)
        v_lvl = jnp.concatenate([v_top, v_bot[:, :, -1:]], 2)
        return u_lvl, v_lvl

    return impl


def fused_u_lvl(
    leg_scaled, omega_p, dtau_p, tb0, tb1, qp, qm, ebea,
    rsurf, b_neg, rhs_surf,
    *, lam, sign, mu, w, mu0=0.0, has_beam=False, sweeps=None,
    sub=8, interpret=False,
):
    """(u_lvl, v_lvl) [M, L+1, N] per frequency via the fused TPU path.

    Unbatched args follow disort()'s internals: leg_scaled [L, nlegc],
    omega_p/dtau_p [L], tb0/tb1 [M, L] (pre-masked mode-0 thermal
    (1-w')b coefficients), qp/qm [M, L, N] prefactored beam sources,
    ebea [L+1] scaled beam attenuation, rsurf [M, N, N], b_neg [M, N],
    rhs_surf [M, N].  lam/sign: static quadrature tables (numpy);
    mu/w: quadrature nodes/weights (numpy).  vmap over a leading
    frequency axis collapses into the kernel lane dimension.
    """
    n = len(mu)
    M, L = tb0.shape[-2], tb0.shape[-1]
    if sweeps is None:
        sweeps = _default_sweeps(leg_scaled.dtype)
    impl = _make_fused(
        int(n), int(L), int(M),
        tuple(float(x) for x in mu), tuple(float(x) for x in w),
        float(mu0), bool(has_beam), int(sweeps), int(sub), bool(interpret),
    )
    lam_j = np.asarray(lam)
    sign_j = np.asarray(sign)

    def unbatched(leg_scaled, omega_p, dtau_p, tb0, tb1, qp, qm, ebea,
                  rsurf, b_neg, rhs_surf):
        out = impl(
            leg_scaled[None], omega_p[None], dtau_p[None], tb0[None],
            tb1[None], qp[None], qm[None], ebea[None], rsurf[None],
            b_neg[None], rhs_surf[None], lam_j, sign_j,
        )
        return out[0][0], out[1][0]

    run = jax.custom_batching.custom_vmap(unbatched)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):
        # constants created inside a vmapped caller (e.g. the zero beam
        # sources of a thermal-only run) arrive unbatched: broadcast them
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        out = impl(*args, lam_j, sign_j)
        return out, (True, True)

    return run(
        leg_scaled, omega_p, dtau_p, tb0, tb1, qp, qm, ebea, rsurf,
        b_neg, rhs_surf,
    )
