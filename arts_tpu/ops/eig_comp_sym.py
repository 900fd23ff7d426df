"""Batched eigendecomposition of COMPLEX SYMMETRIC matrices via Jacobi
with complex-orthogonal rotations.

Why: the ECS line-mixing band matrix diag(f0 + D0 + i G0) + i W_offdiag is
similar (by a real diagonal detailed-balance scaling) to a complex
symmetric matrix; XLA has no TPU `eig`, and the reference uses a LAPACK
general eigensolver (lbl_lineshape_voigt_ecs.cpp:83 diagonalize).  Complex
symmetric matrices admit A = Q diag(w) Q^T with COMPLEX ORTHOGONAL Q
(Q^T Q = I, not unitary), and the classical Jacobi iteration carries over
with complex arithmetic (rotation angles from the same formulas).

Convergence holds for diagonalizable matrices (distinct eigenvalues —
generic for line-mixing W); accuracy validated vs scipy.linalg.eig.

Compiled as lax.fori_loop(sweeps) x lax.scan(tournament rounds) with all
of a round's disjoint rotations applied as one gather/scatter + matmul,
so the HLO size is independent of n and sweeps (the unrolled form took
minutes to compile on the remote TPU compiler).
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

from .eigh_jacobi import _tournament


def eig_comp_sym(A, sweeps: int = 12):
    """(w, Q) with A = Q diag(w) Q^T, Q^T Q = I. A: [..., n, n] complex
    symmetric. Eigenvalues sorted by real part (ascending)."""
    n = A.shape[-1]
    batch = A.shape[:-2]
    dtype = A.dtype
    if n == 1:  # trivial band: no rotations
        return A[..., 0, 0][..., None], jnp.ones(batch + (1, 1), dtype)
    rounds = _tournament(n)
    npairs = max(len(r) for r in rounds)
    pad = any(len(r) < npairs for r in rounds)
    # pad uneven rounds with a dummy rotation acting on two extra
    # identity rows (apq = 0 there -> the rotation is the identity)
    m = n + 2 if pad else n
    if pad:
        Ae = jnp.zeros(batch + (m, m), dtype)
        Ae = Ae.at[..., :n, :n].set(A)
        Ae = Ae.at[..., n, n].set(1.0)
        Ae = Ae.at[..., n + 1, n + 1].set(2.0)
        A = Ae
    P = np.array(
        [[pr[0] for pr in r] + [n] * (npairs - len(r)) for r in rounds]
    )
    Qi = np.array(
        [[pr[1] for pr in r] + [n + 1] * (npairs - len(r)) for r in rounds]
    )
    P_j = jnp.asarray(P)
    Q_j = jnp.asarray(Qi)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype), batch + (m, m))

    def round_step(carry, pq):
        A, Q = carry
        p, q = pq  # [npairs] disjoint index arrays
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # grad-safe guards: sanitize operands BEFORE the dangerous ops so
        # no NaN/inf ever enters an untaken `where` branch (NaN would
        # leak through the where gradient otherwise)
        zero = jnp.abs(apq) < 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1.0)
        theta = (aqq - app) / (2.0 * jnp.where(zero, 1.0, apq))
        big = jnp.abs(theta) > 1e8
        theta_s = jnp.where(big, 1.0, theta)
        root = jnp.sqrt(theta_s * theta_s + 1.0)
        # pick the branch with the larger |theta +- root| for stability
        tp = theta_s + root
        tm = theta_s - root
        den = jnp.where(jnp.abs(tp) >= jnp.abs(tm), tp, tm)
        t = jnp.where(big, 1.0 / (2.0 * jnp.where(big, theta, 1.0)), 1.0 / den)
        t = jnp.where(zero, 0.0, t)
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        R = eye
        R = R.at[..., p, p].set(c)
        R = R.at[..., q, q].set(c)
        R = R.at[..., p, q].set(s)
        R = R.at[..., q, p].set(-s)
        # complex-orthogonal congruence: A <- R^T A R (transpose, NOT
        # conjugate transpose)
        # HIGHEST precision: the TPU's default bf16 matmuls destroy the
        # rotation chain (diagonal ~ 6e10 Hz, couplings ~ 1e8 Hz)
        hp = lax.Precision.HIGHEST
        AR = jnp.einsum("...ij,...jk->...ik", A, R, precision=hp)
        A = jnp.einsum("...ji,...jk->...ik", R, AR, precision=hp)
        Q = jnp.einsum("...ij,...jk->...ik", Q, R, precision=hp)
        return (A, Q), None

    def sweep(_, carry):
        (A, Q), _ = lax.scan(round_step, carry, (P_j, Q_j))
        return (A, Q)

    A, Q = lax.fori_loop(0, sweeps, sweep, (A, eye))

    w = jnp.einsum("...ii->...i", A)[..., :n]
    Q = Q[..., :n, :n]
    order = jnp.argsort(jnp.real(w), axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    Q = jnp.take_along_axis(Q, order[..., None, :], axis=-1)
    return w, Q
