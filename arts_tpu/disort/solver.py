"""Plane-parallel discrete-ordinates solver (DISORT), TPU-native.

Parity reference: /root/reference/src/core/disort-cpp/disort.{h,cpp} (the
C++ re-implementation of Pythonic-DISORT: per Fourier mode & layer an
N x N eigen-decomposition, then a global banded boundary-value solve
`solve_for_coefs` at disort.cpp:181, post-processing to intensities and
fluxes) and 3rdparty/cdisort (classic Stamnes DISORT used for our golden
values; delta-M per c_disort_set:3550, flux conventions per c_fluxes:2377).

TPU-first redesign (batched, no per-frequency loop):
  * the asymmetric (alpha-beta)(alpha+beta) eigenproblem (general `eig` in
    the reference, disort-eigen.h:27 — unavailable on TPU) is reduced to a
    SYMMETRIC one: with F = diag(sqrt(w/mu)) the system matrix is similar
    to H1 H2 with H1, H2 symmetric; Cholesky -H1 = L L^T turns it into
    eigh(-L^T H2 L).  Exact, differentiable, eigh batches on the MXU.
  * the global banded BVP becomes a block-tridiagonal Thomas elimination
    (lax.scan over layers, 2N x 2N blocks) in the unknowns
    X_l = [C+_l; C-_l], with the diagonally-dominant equation grouping
    {v-continuity at the layer top (strong in C+_l), u-continuity at the
    layer bottom (strong in C-_l)} — the conditioning the reference's
    banded LU gets from pivoting, by construction.
  * Fourier modes are a batched leading axis (associated-Legendre tables
    zero-padded below l < m, so one einsum covers all modes); frequencies
    vmap outside.

Layer solution representation (exponentials always decaying, the standard
DISORT scaling):
    u(t) = G+ C+ e^{-k t} + G- C- e^{-k (D - t)} + u_p(t)
    v(t) = G- C+ e^{-k t} + G+ C- e^{-k (D - t)} + v_p(t)
with t local optical depth from the layer top, D the scaled layer
thickness, u upwelling / v downwelling at the positive quadrature nodes.
"""

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigh_jacobi import eigh_jacobi
from ..ops.smallalg import cholesky_unrolled, solve_unrolled
from .quadrature import double_gauss, lambda_at, lambda_tables

# test hook: run the fused Pallas path in interpret mode on any backend
# (tests/test_fused_disort.py compares it against the XLA path on CPU)
_FORCE_FUSED_INTERPRET = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DisortInput:
    """Single-frequency inputs (vmap for spectra). L layers, level 0 = TOA.

    Parity: DisortSettings per-frequency slice (disort.h:650-710).
    """

    tau: jax.Array  # [L] layer optical thickness (unscaled)
    omega: jax.Array  # [L] single scattering albedo
    leg: jax.Array  # [L, NLeg] phase moments g_l, g_0 = 1 (no 2l+1 factor)
    f: jax.Array  # [L] delta-M fractional scattering (0 = off)
    b_levels: jax.Array  # [L+1] thermal source (Planck) at levels; 0 = none
    fbeam: jax.Array  # beam flux at TOA (perpendicular to beam)
    fisot: jax.Array  # isotropic illumination at TOA
    albedo: jax.Array  # Lambertian surface albedo
    b_surf: jax.Array  # surface emission Planck radiance
    b_top: jax.Array  # top-boundary emission radiance (temis * B(ttemp))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DisortOutput:
    """Per-level outputs; mu ascending (negative = downwelling) as cdisort."""

    mu: jax.Array  # [NQuad]
    flux_up: jax.Array  # [L+1]
    flux_down_diffuse: jax.Array  # [L+1]
    flux_direct: jax.Array  # [L+1] (unscaled beam)
    u0: jax.Array  # [L+1, NQuad] azimuthally averaged intensity
    u: Optional[jax.Array] = None  # [L+1, NQuad, nphi]


def _eigh_lapack(A):
    """jnp.linalg.eigh as a plain-tuple pytree (platform_dependent branch
    partner to eigh_jacobi, whose output is a tuple not an EighResult)."""
    w, V = jnp.linalg.eigh(A)
    return w, V


def _eigen(Pp, Pm, omega, mu, w, fast_linalg=False):
    """Homogeneous solutions per (mode, layer): k [M,L,N], Gp/Gm [M,L,N,N]."""
    c = 0.5 * omega  # [L]
    inv_w = 1.0 / w
    F = jnp.sqrt(w / mu)

    cPp = c[None, :, None, None] * Pp
    cPm = c[None, :, None, None] * Pm
    S1 = cPp - cPm - jnp.diag(inv_w)
    S2 = cPp + cPm - jnp.diag(inv_w)

    H1 = F[:, None] * S1 * F[None, :]
    H2 = F[:, None] * S2 * F[None, :]

    if fast_linalg:
        Lc = cholesky_unrolled(-H1)  # -H1 SPD for omega < 1
    else:
        Lc = jnp.linalg.cholesky(-H1)
    Hsym = -jnp.einsum("...ji,...jk,...kl->...il", Lc, H2, Lc)
    # the TPU XLA f32 eigh custom call is not radiance-grade — even at
    # highest matmul precision it leaves ~15% u0 errors where the Jacobi
    # sweep (and CPU LAPACK) sit at ~0.1% (native/eigh_tpu_repro.py) —
    # so every non-CPU lowering routes through eigh_jacobi regardless of
    # fast_linalg; jnp.linalg.eigh means LAPACK, kept for cpu (decided
    # at lowering time so CPU-pinned runs in a TPU session get LAPACK)
    if fast_linalg:
        k2, V = eigh_jacobi(Hsym)
    elif jax.default_backend() == "cpu":
        k2, V = jnp.linalg.eigh(Hsym)  # pure-CPU session: LAPACK
    else:
        # non-CPU session: Jacobi on the accelerator; computations the
        # caller pins to the CPU device still lower to LAPACK there
        k2, V = jax.lax.platform_dependent(
            Hsym, cpu=_eigh_lapack, default=eigh_jacobi
        )
    k = jnp.sqrt(jnp.maximum(k2, 1e-24))

    E = jnp.sqrt(w * mu)
    Y = (1.0 / E)[:, None] * jnp.einsum("...ij,...jk->...ik", Lc, V)
    # F2 = M^-1 S2 W; g+ - g- = (F2 y)/k
    F2Y = (1.0 / mu)[:, None] * jnp.einsum("...ij,...jk->...ik", S2 * w[None, :], Y)
    D = F2Y / k[..., None, :]
    Gp = 0.5 * (Y + D)
    Gm = 0.5 * (Y - D)
    return k, Gp, Gm


def _solve_block_tridiag_structured(Gp, Gm, Ek, rhs, Rsurf, fast_linalg=False):
    """DISORT-specialized block-tridiagonal Thomas elimination.

    Exploits the BVP block structure: the sub-diagonal block of layer l is
    S' U_{l-1} (A rows only, U = [GmE, Gp]) and the super-diagonal is
    S T_{l+1} (B rows only, T = -[Gp, GmE]), so the forward elimination
    needs only the rank-N carries W = U P and uy = U y with P = D'^-1 S.
    Per layer this streams 2 N^2 inputs + stores a [2N, N] factor instead
    of materializing three [2N, 2N] blocks (the old assembly moved ~4x
    more HBM per layer and dominated the DISORT step time on TPU).

    Gp, Gm: [L, ..., N, N]; Ek: [L, ..., N]; rhs: [L, ..., 2N];
    Rsurf: [..., N, N] surface reflection operator (last layer's B rows).
    Returns X: [L, ..., 2N].
    """
    Lr = Gp.shape[0]
    N = Gp.shape[-1]
    batch = Gp.shape[1:-2]
    dtype = Gp.dtype
    S_mat = jnp.broadcast_to(
        jnp.concatenate(
            [jnp.zeros((N, N), dtype), jnp.eye(N, dtype=dtype)], 0
        ),
        batch + (2 * N, N),
    )
    idx = jnp.arange(Lr)

    def fwd(carry, inp):
        Wprev, uyprev = carry
        Gp_l, Gm_l, Ek_l, r_l, l = inp
        GpE = Gp_l * Ek_l[..., None, :]
        GmE = Gm_l * Ek_l[..., None, :]
        U = jnp.concatenate([GmE, Gp_l], -1)  # [..., N, 2N]
        T = -jnp.concatenate([Gp_l, GmE], -1)
        sgn = jnp.where(l == 0, 1.0, -1.0).astype(dtype)
        is_last = (l == Lr - 1).astype(dtype)
        RU = jnp.einsum("...ij,...jk->...ik", Rsurf, U)
        Arows = sgn * jnp.concatenate([Gm_l, GpE], -1) - jnp.einsum(
            "...ij,...jk->...ik", Wprev, T
        )
        Brows = jnp.concatenate([GpE, Gm_l], -1) - is_last * RU
        D = jnp.concatenate([Arows, Brows], -2)
        rmod = r_l.at[..., :N].add(-uyprev)
        stacked = jnp.concatenate([S_mat, rmod[..., None]], -1)
        sol = (
            solve_unrolled(D, stacked)
            if fast_linalg
            else jnp.linalg.solve(D, stacked)
        )
        P = sol[..., :N]
        y = sol[..., N]
        W = jnp.einsum("...ij,...jk->...ik", U, P)
        uy = jnp.einsum("...ij,...j->...i", U, y)
        return (W, uy), (P, y)

    W0 = jnp.zeros(batch + (N, N), dtype)
    uy0 = jnp.zeros(batch + (N,), dtype)
    _, (Ps, ys) = jax.lax.scan(fwd, (W0, uy0), (Gp, Gm, Ek, rhs, idx))

    def bwd(t, inp):
        P_l, y_l, Gp_l, Gm_l, Ek_l = inp
        X = y_l - jnp.einsum("...ij,...j->...i", P_l, t)
        GmE = Gm_l * Ek_l[..., None, :]
        tnew = -jnp.einsum(
            "...ij,...j->...i", jnp.concatenate([Gp_l, GmE], -1), X
        )
        return tnew, X

    _, Xs = jax.lax.scan(
        bwd, jnp.zeros(batch + (N,), dtype), (Ps, ys, Gp, Gm, Ek),
        reverse=True,
    )
    return Xs


def _assemble_bvp_blocks(Gp, Gm, Ek, Rsurf):
    """Materialize the DISORT BVP block-tridiagonal from eigen factors.

    Same block layout as _solve_block_tridiag_structured's docstring:
    per block row l the A rows (first N) couple X_{l-1} via U_{l-1} =
    [GmE, Gp] and X_l via sgn_l [Gm, GpE]; the B rows couple X_l via
    [GpE, Gm] (surface-reflected on the last layer) and X_{l+1} via
    -[Gp, GmE].

    Gp/Gm: [M, L, N, N]; Ek: [M, L, N]; Rsurf: [M, N, N].
    Returns (Adn, Adiag, Aup) each [L, M, 2N, 2N].
    """
    M, L, N, _ = Gp.shape
    GpE = Gp * Ek[..., None, :]
    GmE = Gm * Ek[..., None, :]
    U = jnp.concatenate([GmE, Gp], -1)  # [M, L, N, 2N]
    T = jnp.concatenate([Gp, GmE], -1)
    sgn = jnp.where(jnp.arange(L) == 0, 1.0, -1.0).astype(Gp.dtype)
    A_diag = sgn[None, :, None, None] * jnp.concatenate([Gm, GpE], -1)
    B_diag = jnp.concatenate([GpE, Gm], -1)
    RU = jnp.einsum("mij,mjk->mik", Rsurf, U[:, -1])
    B_diag = B_diag.at[:, -1].add(-RU)
    Adiag = jnp.concatenate([A_diag, B_diag], -2)  # [M, L, 2N, 2N]
    zeros = jnp.zeros_like(U)
    Adn = jnp.concatenate(
        [jnp.concatenate([zeros[:, :1], U[:, :-1]], 1), zeros], -2
    )
    Aup = jnp.concatenate(
        [zeros, jnp.concatenate([-T[:, 1:], zeros[:, :1]], 1)], -2
    )
    mv = lambda a: jnp.moveaxis(a, 1, 0)
    return mv(Adn), mv(Adiag), mv(Aup)


def solve_block_tridiag_cr(Adn, Adiag, Aup, rhs, fast_linalg=True):
    """Block cyclic reduction for Adn[l] X[l-1] + Adiag[l] X[l] + Aup[l] X[l+1] = rhs[l].

    The Thomas scan (`_solve_block_tridiag*`) is latency-bound on TPU: 60
    sequential while-loop steps whose per-step compute is ~1e-2 of the
    step wall time.  Cyclic reduction eliminates all odd blocks at once —
    ceil(log2 L) fully batched levels of (solve, matmul) over the whole
    (layer x batch) extent — trading ~3x flops for ~10x fewer serial
    stages.  All ops are plain jnp (differentiable); no pivoting (same
    contract as solve_unrolled: DISORT's scaled BVP blocks are strongly
    diagonal).

    Leading axis is the block index; trailing [..., B, B] / [..., B].
    Adn[0] and Aup[-1] must be zero blocks.
    """
    B = Adiag.shape[-1]
    _slv = (
        solve_unrolled
        if fast_linalg
        else jnp.linalg.solve
    )

    levels = []
    L_, D_, U_, r_ = Adn, Adiag, Aup, rhs
    n = D_.shape[0]
    while n > 1:
        # odd blocks j = 1, 3, ... are eliminated into their even
        # neighbours.  When n is even the last odd j = n-1 has no right
        # neighbour; Aup[-1] = 0 keeps every formula valid with no pad.
        Lo, Do, Uo, ro = L_[1::2], D_[1::2], U_[1::2], r_[1::2]
        m = Do.shape[0]
        sol = _slv(
            Do, jnp.concatenate([Lo, Uo, ro[..., None]], -1)
        )  # D_j^{-1} [L_j | U_j | r_j]
        DL, DU, Dr = sol[..., :B], sol[..., B : 2 * B], sol[..., 2 * B]
        levels.append((DL, DU, Dr))

        Le, De, Ue, re = L_[0::2], D_[0::2], U_[0::2], r_[0::2]
        ne = De.shape[0]
        # left odd neighbour of even i = 2k is odd index k-1 (none for k=0)
        zB = jnp.zeros_like(DL[:1])
        zv = jnp.zeros_like(Dr[:1])
        DLl = jnp.concatenate([zB, DL], 0)[:ne]
        DUl = jnp.concatenate([zB, DU], 0)[:ne]
        Drl = jnp.concatenate([zv, Dr], 0)[:ne]
        # right odd neighbour of even i = 2k is odd index k (none when
        # 2k = n-1 and n odd); pad with zeros at the tail
        DLr = jnp.concatenate([DL, zB], 0)[:ne] if m < ne else DL[:ne]
        DUr = jnp.concatenate([DU, zB], 0)[:ne] if m < ne else DU[:ne]
        Drr = jnp.concatenate([Dr, zv], 0)[:ne] if m < ne else Dr[:ne]

        mm = lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b)
        mv = lambda a, b: jnp.einsum("...ij,...j->...i", a, b)
        L_ = -mm(Le, DLl)
        U_ = -mm(Ue, DUr)
        D_ = De - mm(Le, DUl) - mm(Ue, DLr)
        r_ = re - mv(Le, Drl) - mv(Ue, Drr)
        n = ne

    x = _slv(D_[0], r_[0][..., None])[..., 0][None]  # [1, ..., B]

    for DL, DU, Dr in reversed(levels):
        ne = x.shape[0]
        m = DL.shape[0]
        # x_odd[k] (global 2k+1) = Dr[k] - DL[k] x_even[k] - DU[k] x_even[k+1]
        xe_r = (
            jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)[:m]
            if m >= ne
            else x[1 : m + 1]
        )
        xo = (
            Dr
            - jnp.einsum("...ij,...j->...i", DL, x[:m])
            - jnp.einsum("...ij,...j->...i", DU, xe_r)
        )
        # interleave evens and odds back to this level's ordering
        ntot = ne + m
        out = jnp.zeros((ntot,) + x.shape[1:], x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(xo)
        x = out
    return x


def solve_block_tridiag_cr_structured(Lt, D, Ub, rhs, fast_linalg=True):
    """Cyclic reduction on the DISORT BVP's half-zero block structure.

    The BVP's sub-diagonal blocks are [[Lt], [0]] (only the A rows couple
    X_{l-1}) and the super-diagonals [[0], [Ub]] (only the B rows couple
    X_{l+1}) — see _assemble_bvp_blocks.  One CR elimination preserves
    exactly this shape: the new sub-diagonal -Le @ (D_o^{-1} L_o) keeps
    its bottom rows zero because Le's are zero, and symmetrically for the
    super-diagonal.  So every level stores and multiplies only the [N,2N]
    halves — half the HBM traffic and ~40% fewer flops than the dense CR
    (solve_block_tridiag_cr), algebraically identical.  Also exploits
    [E_A | E_B] = I: the per-level solve is against [I | r] (width 2N+1)
    instead of [L | U | r] (width 4N+1).

    Lt: [n, ..., N, 2N] top half of the sub-diagonal (Lt[0] ignored/zero);
    Ub: [n, ..., N, 2N] bottom half of the super-diagonal (Ub[-1] zero);
    D: [n, ..., 2N, 2N]; rhs: [n, ..., 2N].  Returns X [n, ..., 2N].
    """
    B = D.shape[-1]
    N = B // 2
    _slv = solve_unrolled if fast_linalg else jnp.linalg.solve
    mm = lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b)
    mv = lambda a, b: jnp.einsum("...ij,...j->...i", a, b)

    levels = []
    L_, D_, U_, r_ = Lt, D, Ub, rhs
    n = D_.shape[0]
    while n > 1:
        Lo, Do, Uo, ro = L_[1::2], D_[1::2], U_[1::2], r_[1::2]
        m = Do.shape[0]
        eye = jnp.broadcast_to(jnp.eye(B, dtype=D.dtype), Do.shape)
        sol = _slv(Do, jnp.concatenate([eye, ro[..., None]], -1))
        Dinv, Dr = sol[..., :B], sol[..., B]
        DL = mm(Dinv[..., :N], Lo)  # D_o^{-1} [[Lo],[0]]
        DU = mm(Dinv[..., N:], Uo)  # D_o^{-1} [[0],[Uo]]
        levels.append((DL, DU, Dr))

        Le, De, Ue, re = L_[0::2], D_[0::2], U_[0::2], r_[0::2]
        ne = De.shape[0]
        zB = jnp.zeros_like(DL[:1])
        zv = jnp.zeros_like(Dr[:1])
        DLl = jnp.concatenate([zB, DL], 0)[:ne]
        DUl = jnp.concatenate([zB, DU], 0)[:ne]
        Drl = jnp.concatenate([zv, Dr], 0)[:ne]
        DLr = jnp.concatenate([DL, zB], 0)[:ne] if m < ne else DL[:ne]
        DUr = jnp.concatenate([DU, zB], 0)[:ne] if m < ne else DU[:ne]
        Drr = jnp.concatenate([Dr, zv], 0)[:ne] if m < ne else Dr[:ne]

        # half-block updates: Le = [[Le],[0]] touches only the A rows,
        # Ue = [[0],[Ue]] only the B rows
        L_ = -mm(Le, DLl)
        U_ = -mm(Ue, DUr)
        D_ = jnp.concatenate(
            [De[..., :N, :] - mm(Le, DUl), De[..., N:, :] - mm(Ue, DLr)],
            -2,
        )
        r_ = jnp.concatenate(
            [re[..., :N] - mv(Le, Drl), re[..., N:] - mv(Ue, Drr)], -1
        )
        n = ne

    x = _slv(D_[0], r_[0][..., None])[..., 0][None]

    for DL, DU, Dr in reversed(levels):
        ne = x.shape[0]
        m = DL.shape[0]
        xe_r = (
            jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)[:m]
            if m >= ne
            else x[1 : m + 1]
        )
        xo = Dr - mv(DL, x[:m]) - mv(DU, xe_r)
        ntot = ne + m
        out = jnp.zeros((ntot,) + x.shape[1:], x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(xo)
        x = out
    return x


def _assemble_bvp_halves(Gp, Gm, Ek, Rsurf):
    """The BVP block-tridiagonal in half-block form (no dense Adn/Aup).

    Same layout as _assemble_bvp_blocks, but the sub-diagonal is returned
    as its nonzero top half Lt[l] = U_{l-1} = [GmE, Gp]_{l-1} and the
    super-diagonal as its nonzero bottom half Ub[l] = -T_{l+1} =
    -[Gp, GmE]_{l+1}; feed solve_block_tridiag_cr_structured.

    Gp/Gm: [M, L, N, N]; Ek: [M, L, N]; Rsurf: [M, N, N].
    Returns (Lt [L,M,N,2N], Adiag [L,M,2N,2N], Ub [L,M,N,2N]).
    """
    M, L, N, _ = Gp.shape
    GpE = Gp * Ek[..., None, :]
    GmE = Gm * Ek[..., None, :]
    U = jnp.concatenate([GmE, Gp], -1)  # [M, L, N, 2N]
    T = jnp.concatenate([Gp, GmE], -1)
    sgn = jnp.where(jnp.arange(L) == 0, 1.0, -1.0).astype(Gp.dtype)
    A_diag = sgn[None, :, None, None] * jnp.concatenate([Gm, GpE], -1)
    B_diag = jnp.concatenate([GpE, Gm], -1)
    RU = jnp.einsum("mij,mjk->mik", Rsurf, U[:, -1])
    B_diag = B_diag.at[:, -1].add(-RU)
    Adiag = jnp.concatenate([A_diag, B_diag], -2)  # [M, L, 2N, 2N]
    zero = jnp.zeros_like(U[:, :1])
    Lt = jnp.concatenate([zero, U[:, :-1]], 1)
    Ub = jnp.concatenate([-T[:, 1:], zero], 1)
    mv_ = lambda a: jnp.moveaxis(a, 1, 0)
    return mv_(Lt), mv_(Adiag), mv_(Ub)


def _solve_block_tridiag(Adn, Adiag, Aup, rhs, fast_linalg=False):
    """Thomas elimination for Adn[l] X[l-1] + Adiag[l] X[l] + Aup[l] X[l+1] = rhs[l].

    Leading axis is the block index; trailing [..., B, B] / [..., B].
    Adn[0] and Aup[-1] must be zero blocks.
    """

    def fwd(carry, inp):
        Cprev, dprev = carry  # X[l-1] = dprev - Cprev X[l]
        dn, dg, up, r = inp
        Mod = dg - jnp.einsum("...ij,...jk->...ik", dn, Cprev)
        rmod = r - jnp.einsum("...ij,...j->...i", dn, dprev)
        stacked = jnp.concatenate([up, rmod[..., None]], -1)
        CnD = (
            solve_unrolled(Mod, stacked)
            if fast_linalg
            else jnp.linalg.solve(Mod, stacked)
        )
        Cn = CnD[..., :-1]
        dnew = CnD[..., -1]
        return (Cn, dnew), (Cn, dnew)

    B = Adiag.shape[-1]
    batch = Adiag.shape[1:-2]
    C0 = jnp.zeros(batch + (B, B), dtype=Adiag.dtype)
    d0 = jnp.zeros(batch + (B,), dtype=Adiag.dtype)
    _, (Cs, ds) = jax.lax.scan(fwd, (C0, d0), (Adn, Adiag, Aup, rhs))

    def bwd(Xnext, inp):
        C, d = inp
        X = d - jnp.einsum("...ij,...j->...i", C, Xnext)
        return X, X

    _, Xs = jax.lax.scan(bwd, jnp.zeros_like(d0), (Cs, ds), reverse=True)
    return Xs


@functools.partial(
    jax.jit,
    static_argnames=(
        "nquad", "nleg", "nfourier", "mu0", "phi0", "phis", "fast_linalg",
        "intensity_correction",
    ),
)
def disort(
    inp: DisortInput,
    nquad: int = 16,
    nleg: int | None = None,
    nfourier: int | None = None,
    mu0: float = 0.0,
    phi0: float = 0.0,
    phis: tuple = (),
    fast_linalg: bool | None = None,
    intensity_correction: bool = False,
    brdf=None,
) -> DisortOutput:
    """Solve one plane-parallel RT problem (vmap over frequency outside).

    mu0/phi0/phis are static geometry (host-side scene setup); all
    DisortInput fields are traced.  brdf: optional SurfaceBrdf
    (disort/brdf.py) replacing the Lambertian inp.albedo surface; its
    bem scales inp.b_surf (surface emission) for mode 0.

    fast_linalg None (default) auto-selects per backend: True away from
    CPU (fused Mosaic kernels where supported, else the pure-jnp Jacobi
    eigh + structured solves — the TPU XLA eigh custom call at f32 is
    UNRELIABLE for radiances: measured u0 errors up to several 100% on
    heterogeneous layers vs CPU-f64 truth, while the fused path stays
    at ~1e-3), False on CPU (LAPACK is both exact and fastest there).
    """
    if fast_linalg is None:
        fast_linalg = jax.default_backend() != "cpu"
    Lr = inp.tau.shape[-1]
    N = nquad // 2
    nleg = nleg or nquad
    # computational phase expansion truncated at nquad moments (cdisort
    # keeps GL(k) for k < nstr; higher moments act via delta-M f and the
    # TMS/IMS corrections only)
    nlegc = min(nleg, nquad)
    M = int(nfourier if nfourier is not None else (nquad if mu0 > 0 else 1))

    # working float dtype (integer tau inputs promote to the default
    # float — casting quadrature nodes to an int dtype would zero them)
    dtype = (
        inp.tau.dtype
        if jnp.issubdtype(inp.tau.dtype, jnp.floating)
        else jnp.result_type(float)
    )
    mu_np, w_np = double_gauss(N)
    lam_np, sign_np = lambda_tables(M, nlegc, N)
    # quadrature tables in the working dtype: a bare asarray is f64 under
    # x64 mode and silently upcasts an f32 solve (breaking the fused
    # kernel's dtype-uniform carries)
    mu = jnp.asarray(mu_np, dtype)
    w = jnp.asarray(w_np, dtype)
    lam = jnp.asarray(lam_np, dtype)
    sign = jnp.asarray(sign_np, dtype)
    lam0 = jnp.asarray(
        lambda_at(M, nlegc, mu0) if mu0 > 0 else np.zeros((M, nlegc)), dtype
    )
    I_N = jnp.eye(N, dtype=dtype)

    # ---- delta-M scaling (cdisort c_disort_set:3550-3562) ----
    f = inp.f
    omega = jnp.clip(inp.omega, 0.0, 1.0 - 1e-9)
    wf = omega * f
    omega_p = omega * (1.0 - f) / (1.0 - wf)
    dtau_p = (1.0 - wf) * inp.tau
    tau_p = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(dtau_p)], 0)
    tau_u = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(inp.tau)], 0)
    # arange in the working dtype: an int arange times a python float
    # promotes to f64 under x64 mode, silently upcasting the whole solve
    # (and breaking the fused kernel's dtype-uniform carries)
    ls = jnp.arange(nlegc, dtype=dtype)
    leg_scaled = (
        (2.0 * ls + 1.0)
        * (inp.leg[..., :nlegc] - f[:, None])
        / (1.0 - f[:, None])
    )

    # ---- beam source terms (shared by both solve paths) ----
    has_beam = mu0 > 0.0
    if has_beam:
        delm0 = jnp.asarray(np.where(np.arange(M) == 0, 1.0, 0.0), dtype)
        pref = (2.0 - delm0)[:, None] * (inp.fbeam * omega_p[None, :] / (4.0 * jnp.pi))
        # q+ ~ p^m(mu_i, -mu0) ; q- ~ p^m(-mu_i, -mu0) (parity via sign)
        qp = pref[..., None] * jnp.einsum("lk,mk,mki->mli", leg_scaled, sign * lam0, lam)
        qm = pref[..., None] * jnp.einsum("lk,mk,mki->mli", leg_scaled, lam0, lam)
        ebea = jnp.exp(-tau_p / mu0)  # [L+1], scaled attenuation
    else:
        qp = qm = jnp.zeros((M, Lr, N), dtype)
        ebea = jnp.zeros((Lr + 1,), dtype)

    # ---- thermal source coefficients (mode 0): (1-w')(b0 + b1 t) ----
    # For optically thin layers the linear-in-tau slope b1 = dB/dtau blows
    # up (dtau ~ 1e-27 in an upper atmosphere), and the particular solution
    # ~ mu*b1 cancels catastrophically against the homogeneous part.  A thin
    # layer emits ~ tau*B regardless of slope, so switch to a constant
    # source there (error O(dtau^2 dB), far below roundoff of the slope
    # form).  cdisort is exposed to the same cancellation; we do better.
    thin = dtau_p < 1e-5
    safe_dtau = jnp.where(dtau_p > 1e-30, dtau_p, 1.0)
    b0 = jnp.where(
        thin, 0.5 * (inp.b_levels[1:] + inp.b_levels[:-1]), inp.b_levels[:-1]
    )
    b1 = jnp.where(
        thin, 0.0, (inp.b_levels[1:] - inp.b_levels[:-1]) / safe_dtau
    )
    srcf = 1.0 - omega_p
    m0mask = jnp.asarray(np.arange(M) == 0, dtype)[:, None, None]

    # ---- boundary conditions ----
    b_neg = m0mask[:, 0, :] * (inp.fisot + inp.b_top) * jnp.ones((M, N), dtype)
    if brdf is None:
        Rsurf = 2.0 * inp.albedo * jnp.ones((N, 1), dtype) * (w * mu)[None, :]
        rhs_surf0 = (1.0 - inp.albedo) * inp.b_surf * jnp.ones((N,), dtype)
        if has_beam:
            rhs_surf0 = rhs_surf0 + (
                inp.albedo * mu0 * inp.fbeam * ebea[-1] / jnp.pi
            ) * jnp.ones((N,), dtype)
        rhs_surf = m0mask[:, 0, :] * rhs_surf0[None, :]
        Rsurf_m = m0mask[:, :, :1] * Rsurf[None]  # [M,N,N], zero for m > 0
    else:
        # per-Fourier-mode bidirectional reflection (cdisort c_setmtx:
        # LHS (1+delm0) sum_j w_j mu_j BDR_m(i,j); beam BDR_m(i,0) mu0
        # fbeam/pi; emissivity bem for the mode-0 thermal term)
        nb = min(brdf.bdr.shape[0], M)
        one_delm0 = 1.0 + (jnp.arange(nb) == 0).astype(dtype)  # cdisort
        Rs = (
            one_delm0[:, None, None]
            * brdf.bdr[:nb].astype(dtype)
            * (w * mu)[None, None, :]
        )
        Rsurf_m = jnp.concatenate(
            [Rs, jnp.zeros((M - nb, N, N), dtype)], 0
        )
        rhs_surf = jnp.zeros((M, N), dtype)
        rhs_surf = rhs_surf.at[0].add(brdf.bem.astype(dtype) * inp.b_surf)
        if has_beam:
            rhs_surf = rhs_surf.at[:nb].add(
                brdf.bdr_beam[:nb].astype(dtype)
                * (mu0 * inp.fbeam * ebea[-1] / jnp.pi)
            )

    # Mosaic rejects kernels compiled under x64 mode (even pure-f32 ones,
    # NOTES_ROUND2), so f64 runs keep fast_linalg's pure-jnp path:
    # Jacobi eigh + unrolled solves + structured cyclic reduction
    use_fused = (
        fast_linalg
        and jax.default_backend() == "tpu"
        and N <= 16
        and not jax.config.jax_enable_x64
    )
    if use_fused or _FORCE_FUSED_INTERPRET:
        # fully fused Pallas path: eigen + particular sources + BVP +
        # level radiances stream through VMEM (fused_kernel.py); nothing
        # matrix-sized round-trips HBM more than once
        from .fused_kernel import fused_u_lvl

        m0row = jnp.asarray(np.arange(M) == 0, dtype)
        tb0 = m0row[:, None] * (srcf * b0)[None, :]
        tb1 = m0row[:, None] * (srcf * b1)[None, :]
        with jax.named_scope("disort::fused"):
            u_lvl, v_lvl = fused_u_lvl(
                leg_scaled, omega_p, dtau_p, tb0, tb1, qp, qm, ebea,
                Rsurf_m, b_neg, rhs_surf,
                lam=lam_np, sign=sign_np, mu=mu_np, w=w_np,
                mu0=float(mu0), has_beam=has_beam,
                interpret=bool(_FORCE_FUSED_INTERPRET),
            )
        return _disort_post(
            inp, u_lvl, v_lvl, mu_np, w_np, mu, w, M, nquad, nleg, mu0,
            phi0, phis, intensity_correction, has_beam, ebea, tau_u,
        )

    # ---- XLA path: eigen, particular solutions, BVP, radiances ----
    Pp = jnp.einsum("lk,mki,mkj->mlij", leg_scaled, lam, lam)
    Pm = jnp.einsum("lk,mk,mki,mkj->mlij", leg_scaled, sign, lam, lam)
    # named scopes mirror the reference's per-stage timers
    # ("disort::rhs" etc., src/core/disort-cpp/disort.cpp:211)
    with jax.named_scope("disort::eigen"):
        k, Gp, Gm = _eigen(Pp, Pm, omega_p, mu, w, fast_linalg)
    Ek = jnp.exp(-k * dtau_p[None, :, None])  # [M,L,N]

    c = 0.5 * omega_p
    ApB = (1.0 / mu)[:, None] * (I_N - c[None, :, None, None] * (Pp - Pm) * w)
    AmB = (1.0 / mu)[:, None] * (I_N - c[None, :, None, None] * (Pp + Pm) * w)

    # beam particular solution (homogeneous-operator solve)
    if has_beam:
        Amat = jnp.einsum("...ij,...jk->...ik", ApB, AmB)
        rhs_s = jnp.einsum("...ij,...j->...i", ApB, (qp + qm) / mu) - (
            (qp - qm) / mu
        ) / mu0
        Asys = Amat - I_N / (mu0 * mu0)
        s = (
            solve_unrolled(Asys, rhs_s)
            if fast_linalg
            else jnp.linalg.solve(Asys, rhs_s[..., None])[..., 0]
        )
        d = -mu0 * (jnp.einsum("...ij,...j->...i", AmB, s) - (qp + qm) / mu)
        zp = 0.5 * (s + d)
        zm = 0.5 * (s - d)
    else:
        zp = zm = jnp.zeros((M, Lr, N), dtype)

    # thermal particular solution (mode 0)
    e_over_mu = jnp.ones((N,), dtype) / mu
    g1 = (srcf * b1)[:, None] * e_over_mu
    g0v = (srcf * b0)[:, None] * e_over_mu
    _slv = (
        solve_unrolled
        if fast_linalg
        else (lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0])
    )
    q1 = _slv(AmB[0], g1)
    p_minus_r = 2.0 * _slv(ApB[0], q1)
    p_plus_r = 2.0 * _slv(AmB[0], g0v)
    p0 = 0.5 * (p_plus_r + p_minus_r)
    r0 = 0.5 * (p_plus_r - p_minus_r)

    beam_top = ebea[None, :-1, None]
    beam_bot = ebea[None, 1:, None]
    up_top = m0mask * p0[None] + zp * beam_top
    vp_top = m0mask * r0[None] + zm * beam_top
    up_bot = m0mask * (p0 + q1 * dtau_p[:, None])[None] + zp * beam_bot
    vp_bot = m0mask * (r0 + q1 * dtau_p[:, None])[None] + zm * beam_bot

    GpE = Gp * Ek[..., None, :]
    GmE = Gm * Ek[..., None, :]

    # Equation block l (2N rows) for unknowns X_l = [C+_l; C-_l]:
    #   rows A (N): l = 0 -> top BC; l >= 1 -> v-continuity at interface l
    #               (between layers l-1 and l), strong in C+_l
    #   rows B (N): l <= L-2 -> u-continuity at interface l+1, strong in C-_l
    #               l = L-1 -> surface BC
    # rows A coefficients
    # l = 0: Gm_0 C+_0 + GpE_0 C-_0 = b_neg - vp_top_0
    # l >= 1: GmE_{l-1}C+_{l-1} + Gp_{l-1}C-_{l-1} - Gm_l C+_l - GpE_l C-_l = dv_l
    #   dv_l = vp_top[l] - vp_bot[l-1]
    A_rhs = jnp.concatenate(
        [
            (b_neg - vp_top[:, 0])[:, None],
            vp_top[:, 1:] - vp_bot[:, :-1],
        ],
        1,
    )

    # rows B coefficients
    # l <= L-2: GpE_l C+_l + Gm_l C-_l - Gp_{l+1}C+_{l+1} - GmE_{l+1}C-_{l+1}
    #   = du_{l+1} = up_top[l+1] - up_bot[l]
    # l = L-1: (GpE - R GmE) C+ + (Gm - R Gp) C- = rhs_surf - up_bot + R vp_bot
    B_rhs = jnp.concatenate(
        [
            up_top[:, 1:] - up_bot[:, :-1],
            (
                rhs_surf
                - up_bot[:, -1]
                + jnp.einsum("mij,mj->mi", Rsurf_m[:, :, :], vp_bot[:, -1])
            )[:, None],
        ],
        1,
    )

    rhs = jnp.concatenate([A_rhs, B_rhs], -1)

    if fast_linalg:
        # cyclic reduction: ceil(log2 L) fully batched levels instead of
        # L sequential scan steps (the scan is latency-bound on TPU; its
        # per-step compute is ~1% of the step wall time).  Structured
        # half-block form: the off-diagonal blocks are half-zero at every
        # CR level, so only [N, 2N] halves are stored and multiplied.
        with jax.named_scope("disort::bvp"):
            Lt, Adiag, Ub = _assemble_bvp_halves(Gp, Gm, Ek, Rsurf_m)
            X = solve_block_tridiag_cr_structured(
                Lt, Adiag, Ub, jnp.moveaxis(rhs, 1, 0), fast_linalg
            )  # [L, M, 2N]
    else:
        # scan over layers with in-scan block assembly (see
        # _solve_block_tridiag_structured: streams Gp/Gm/Ek instead of
        # materialized [L, 2N, 2N] blocks)
        X = _solve_block_tridiag_structured(
            jnp.moveaxis(Gp, 1, 0),
            jnp.moveaxis(Gm, 1, 0),
            jnp.moveaxis(Ek, 1, 0),
            jnp.moveaxis(rhs, 1, 0),
            Rsurf_m,
            fast_linalg,
        )  # [L, M, 2N]
    Cp = jnp.moveaxis(X[..., :N], 0, 1)  # [M, L, N]
    Cm = jnp.moveaxis(X[..., N:], 0, 1)

    # ---- radiances at levels ----
    def ev(Ga, Gb, Cp, Cm, part):
        return (
            jnp.einsum("mlij,mlj->mli", Ga, Cp)
            + jnp.einsum("mlij,mlj->mli", Gb, Cm)
            + part
        )

    u_top = ev(Gp, GmE, Cp, Cm, up_top)
    v_top = ev(Gm, GpE, Cp, Cm, vp_top)
    u_bot = ev(GpE, Gm, Cp, Cm, up_bot)
    v_bot = ev(GmE, Gp, Cp, Cm, vp_bot)
    u_lvl = jnp.concatenate([u_top, u_bot[:, -1:]], 1)  # [M, L+1, N]
    v_lvl = jnp.concatenate([v_top, v_bot[:, -1:]], 1)

    return _disort_post(
        inp, u_lvl, v_lvl, mu_np, w_np, mu, w, M, nquad, nleg, mu0, phi0,
        phis, intensity_correction, has_beam, ebea, tau_u,
    )


def _disort_post(
    inp, u_lvl, v_lvl, mu_np, w_np, mu, w, M, nquad, nleg, mu0, phi0,
    phis, intensity_correction, has_beam, ebea, tau_u,
):
    """Fluxes, azimuthally-averaged u0, and Fourier synthesis from the
    per-mode level radiances (shared by the fused and XLA solve paths)."""
    u0 = jnp.concatenate([v_lvl[0][..., ::-1], u_lvl[0]], -1)

    fup = 2.0 * jnp.pi * jnp.einsum("j,j,lj->l", w, mu, u_lvl[0])
    fdn_stream = 2.0 * jnp.pi * jnp.einsum("j,j,lj->l", w, mu, v_lvl[0])
    if has_beam:
        fdir_scaled = mu0 * inp.fbeam * ebea
        fdir_true = mu0 * inp.fbeam * jnp.exp(-tau_u / mu0)
        fdn = fdn_stream + fdir_scaled - fdir_true
    else:
        fdir_true = jnp.zeros_like(fup)
        fdn = fdn_stream

    u_out = None
    if phis and intensity_correction and mu0 > 0.0:
        pass  # correction applied after Fourier synthesis below
    if phis:
        dtype = u_lvl.dtype
        phis_arr = jnp.asarray(
            np.asarray(phis, dtype=np.float64) * np.pi / 180.0, dtype
        )
        ms = jnp.arange(M, dtype=dtype)
        cosm = jnp.cos(ms[:, None] * (np.pi / 180.0 * phi0 - phis_arr[None, :]))
        dn_all = jnp.einsum("mlj,mp->ljp", v_lvl, cosm)[..., ::-1, :]
        up_all = jnp.einsum("mlj,mp->ljp", u_lvl, cosm)
        u_out = jnp.concatenate([dn_all, up_all], -2)
        if intensity_correction and mu0 > 0.0:
            u_out = u_out + tms_ims_correction(
                inp, nquad, nleg, mu0, phi0, phis
            )

    return DisortOutput(
        mu=jnp.asarray(np.concatenate([-mu_np[::-1], mu_np])),
        flux_up=fup,
        flux_down_diffuse=fdn,
        flux_direct=fdir_true,
        u0=u0,
        u=u_out,
    )


def _legendre_all(ctheta, kmax):
    """P_k(ctheta) for k = 0..kmax, stacked on axis 0 (static recurrence)."""
    pls = [jnp.ones_like(ctheta), ctheta]
    for k in range(2, kmax + 1):
        pls.append(((2 * k - 1) * ctheta * pls[-1] - (k - 1) * pls[-2]) / k)
    return jnp.stack(pls[: kmax + 1], 0)


def _single_scat(phase, omega, tau_lvl, mu, mu0, fbeam):
    """Vectorized c_single_scat (cdisort:~2470) at all layer boundaries.

    phase: [..., L] per-layer phase value at the scattering angle;
    omega: [L]; tau_lvl: [L+1] cumulative optical depth; mu: output
    cosines (+-) broadcastable against phase[..., 0]; returns [..., L+1]
    (batched over every leading axis — all output angles evaluate in
    one fused expression rather than a trace-time loop).
    """
    u = tau_lvl[:, None]  # [L+1, 1] boundary depths
    t0 = tau_lvl[:-1][None, :]  # [1, L] layer tops
    t1 = tau_lvl[1:][None, :]  # [1, L] layer bottoms
    mu_b = jnp.asarray(mu)[..., None, None]  # [..., 1, 1]

    def E(t):
        # the exponent is <= 0 in every taken branch (see masks below);
        # clamping kills the inf the untaken branch would otherwise
        # produce for the opposite-sign mu entries
        return jnp.exp(jnp.minimum(-((t - u) / mu_b + t / mu0), 0.0))

    up = mu_b > 0
    # upward: layers j >= boundary index; start clamped to u
    mask_up = t1 > u + 1e-30  # layer strictly below the boundary (or partial)
    term_up = E(jnp.maximum(t0, u)) - E(t1)
    # downward: layers j <= boundary-1; end clamped to u
    mask_dn = t0 < u - 1e-30
    term_dn = E(jnp.minimum(t1, u)) - E(t0)
    term = jnp.where(up, jnp.where(mask_up, term_up, 0.0),
                     jnp.where(mask_dn, term_dn, 0.0))
    ans = jnp.sum(term * (omega[None, :] * phase[..., None, :]), axis=-1)
    denom = 1.0 + jnp.asarray(mu) / mu0
    return ans * fbeam / (4.0 * jnp.pi * denom[..., None])


def tms_ims_correction(
    inp: DisortInput,
    nquad: int,
    nleg_all: int,
    mu0: float,
    phi0: float,
    phis: tuple,
    ims: bool = True,
):
    """TMS/IMS intensity corrections (Nakajima-Tanaka / Stamnes).

    Parity: cdisort c_new_intensity_correction (:2529-2664) — replaces the
    delta-M-truncated single scattering with the exact phase function
    (TMS) and subtracts the secondary-scattering delta-M overshoot near
    the solar aureole (IMS); the reference's disort.h:246-330 u_corr.
    Returns du [L+1, NQuad, nphi] to ADD to the intensity field.
    """
    import numpy as np_

    N = nquad // 2
    mu_np, _ = double_gauss(N)
    mu_all = np_.concatenate([-mu_np[::-1], mu_np])  # ascending
    dtype = inp.tau.dtype

    omega = jnp.clip(inp.omega, 0.0, 1.0 - 1e-9)
    f = inp.f
    wf = omega * f
    omega_p = omega * (1.0 - f) / (1.0 - wf)
    dtau_p = (1.0 - wf) * inp.tau
    tau_p = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(dtau_p)])
    tau_u = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(inp.tau)])

    nstr = nquad
    kfull = inp.leg.shape[-1] - 1
    phis_r = np_.deg2rad(np_.asarray(phis, dtype=np_.float64))
    phi0_r = np_.deg2rad(phi0)

    # scattering-angle cosines for ALL (mu, phi) at once: one Legendre
    # recurrence + two batched single-scat evaluations replace the old
    # trace-time double loop ([NQuad] x [nphi] separate graphs — flat
    # trace size in nphi now, camera-sized nphi included)
    ct_np = -mu0 * mu_all[:, None] + np_.sqrt(
        np_.maximum((1.0 - mu0**2) * (1.0 - mu_all**2), 0.0)
    )[:, None] * np_.cos(phis_r - phi0_r)[None, :]
    ct = jnp.asarray(ct_np, dtype)  # [NQ, nphi]
    P = _legendre_all(ct, kfull)  # [K+1, NQ, nphi]
    ks = jnp.arange(kfull + 1, dtype=dtype)
    w2k1 = 2.0 * ks + 1.0
    phasa = jnp.einsum("k,kqp,lk->qpl", w2k1, P, inp.leg)  # [NQ, nphi, L]
    ktrunc = min(nstr - 1, kfull)
    legm = (inp.leg[:, : ktrunc + 1] - f[:, None]) / (1.0 - f[:, None])
    legm = legm.at[:, 0].set(1.0)
    phasm = jnp.einsum(
        "k,kqp,lk->qpl", w2k1[: ktrunc + 1], P[: ktrunc + 1], legm
    )
    phast = phasa / (1.0 - f * omega)
    mu_j = jnp.asarray(mu_all, dtype)
    ussndm = _single_scat(phast, omega, tau_p, mu_j[:, None], mu0, inp.fbeam)
    ussp = _single_scat(phasm, omega_p, tau_p, mu_j[:, None], mu0, inp.fbeam)
    du = ussndm - ussp  # [NQ, nphi, L+1]

    if ims:
        # the IMS aureole window is static (quadrature mus, solar zenith)
        theta0 = np_.degrees(np_.arccos(-mu0))
        thetap = np_.degrees(np_.arccos(mu_all))
        ims_mask = (mu_all < 0.0) & (np_.abs(theta0 - thetap) <= 10.0)
        if ims_mask.any():
            mu_ims = np_.where(ims_mask, mu_all, -0.5)  # keep exps bounded
            ims_val = _ims_term(
                inp, ct, tau_u, nstr, kfull, jnp.asarray(mu_ims, dtype), mu0
            )  # [NQ, nphi, L+1]
            du = du - jnp.asarray(ims_mask, dtype)[:, None, None] * ims_val
    return jnp.transpose(du, (2, 0, 1))  # [L+1, NQuad, nphi]


def _ims_term(inp: DisortInput, ct, tau_u, nstr, kfull, mu, mu0):
    """c_secondary_scat parity: delta-M spike double-scattering term.

    Batched: ct [NQ, nphi] scattering cosines, mu [NQ] (negative =
    downward, where the term applies); returns [NQ, nphi, L+1].
    """
    dtype = inp.tau.dtype
    omega = jnp.clip(inp.omega, 0.0, 1.0 - 1e-9)
    f = inp.f
    # cumulative (unscaled) means down to each boundary
    w_dt = omega * inp.tau
    f_dt = f * w_dt
    stau = tau_u[1:]  # [L] boundary depths (skip TOA where the term is 0)
    wbar = jnp.cumsum(w_dt)
    fbar = jnp.cumsum(f_dt)
    tiny = 1e-4
    ok = (wbar > tiny) & (fbar > tiny) & (stau > tiny)
    fbar_n = fbar / jnp.where(wbar > 0, wbar, 1.0)
    wbar_n = wbar / jnp.where(stau > 0, stau, 1.0)

    P = _legendre_all(jnp.asarray(ct, dtype), kfull)  # [K+1, NQ, nphi]
    # pspike: k < nstr with gbar = 1; k >= nstr with gbar from moments
    ktop = min(nstr, kfull + 1)
    base = jnp.einsum(
        "k,kqp->qp",
        2.0 * jnp.arange(1, ktop, dtype=dtype) + 1.0,
        P[1:ktop],
    )  # [NQ, nphi]
    pspike = 1.0 + base[..., None] * jnp.ones_like(stau)  # [NQ, nphi, L]
    if kfull >= nstr:
        gmom = jnp.cumsum(inp.leg[:, nstr:] * w_dt[:, None], axis=0)  # [L, K-]
        denom = fbar_n * wbar_n * stau
        gbar = jnp.where(
            (denom > tiny)[:, None], gmom / jnp.where(denom > 0, denom, 1.0)[:, None], 0.0
        )
        kk = jnp.arange(nstr, kfull + 1, dtype=dtype)
        pspike = pspike + jnp.einsum(
            "lk,kqp->qpl", gbar * (2.0 - gbar) * (2.0 * kk + 1.0), P[nstr:]
        )
    umu0p = mu0 / (1.0 - fbar_n * wbar_n)

    def xi(umu1, umu2, tau):
        x1 = (umu2 - umu1) / (umu2 * umu1)
        e1 = jnp.exp(-tau / umu1)
        main = ((tau * x1 - 1.0) * jnp.exp(-tau / umu2) + e1) / (
            jnp.where(x1 == 0, 1.0, x1) ** 2 * umu1 * umu2
        )
        limit = tau * tau * e1 / (2.0 * umu1 * umu2)
        return jnp.where(x1 == 0, limit, main)

    xiv = xi(
        (-jnp.asarray(mu, dtype))[:, None, None],
        umu0p[None, None, :],
        stau[None, None, :],
    )  # [NQ, 1, L]
    val = (
        inp.fbeam
        / (4.0 * jnp.pi)
        * (fbar_n * wbar_n) ** 2
        / (1.0 - fbar_n * wbar_n)
        * pspike
        * xiv
    )
    val = jnp.where(ok, val, 0.0)  # [NQ, nphi, L]
    zero = jnp.zeros(val.shape[:-1] + (1,), dtype)
    return jnp.concatenate([zero, val], axis=-1)
