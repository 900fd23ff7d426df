"""Unrolled small-matrix linear algebra for huge batches.

XLA's linalg custom calls (LU solve, Cholesky) serialize poorly for
batches of tiny matrices on TPU (the DISORT hot path: ~1e5 solves of
8x8/16x16 per step).  These routines unroll the eliminations with static
indices so everything compiles to fused batched VPU ops.

No pivoting: intended for the diagonally-dominant / SPD systems DISORT
produces (the block-tridiagonal grouping is constructed to be strong on
the diagonal; -H1 is SPD).  Accuracy is validated against
numpy.linalg in the test suite.
"""

import jax.numpy as jnp


def solve_unrolled(A, B):
    """X with A @ X = B. A: [..., n, n], B: [..., n, k] (or [..., n]).

    Partial pivoting via batched selects (static row structure): DISORT's
    block systems contain EXACT zeros for purely absorbing layers
    (omega = 0 decouples the up/down eigenvector blocks), which zero the
    natural pivots — the unpivoted elimination NaN'd there."""
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    n = A.shape[-1]
    # forward elimination to unit upper-triangular
    rows_A = [A[..., i, :] for i in range(n)]
    rows_B = [B[..., i, :] for i in range(n)]
    for i in range(n):
        if i < n - 1:
            col = jnp.stack(
                [jnp.abs(rows_A[j][..., i]) for j in range(i, n)], axis=-1
            )
            p = jnp.argmax(col, axis=-1)  # offset of the pivot row
            piv_A = rows_A[i]
            piv_B = rows_B[i]
            for j in range(i + 1, n):
                take = (p == (j - i))[..., None]
                piv_A = jnp.where(take, rows_A[j], piv_A)
                piv_B = jnp.where(take, rows_B[j], piv_B)
                rows_A[j] = jnp.where(take, rows_A[i], rows_A[j])
                rows_B[j] = jnp.where(take, rows_B[i], rows_B[j])
            rows_A[i] = piv_A
            rows_B[i] = piv_B
        inv = 1.0 / rows_A[i][..., i]
        rows_A[i] = rows_A[i] * inv[..., None]
        rows_B[i] = rows_B[i] * inv[..., None]
        for j in range(i + 1, n):
            f = rows_A[j][..., i]
            rows_A[j] = rows_A[j] - f[..., None] * rows_A[i]
            rows_B[j] = rows_B[j] - f[..., None] * rows_B[i]
    # back substitution
    X = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rows_B[i]
        for j in range(i + 1, n):
            acc = acc - rows_A[i][..., j, None] * X[j]
        X[i] = acc
    out = jnp.stack(X, axis=-2)
    return out[..., 0] if vec else out


def cholesky_unrolled(A):
    """Lower Cholesky of SPD A [..., n, n] (no checks)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    for i in range(n):
        cols = [
            L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0])
            for j in range(n)
        ]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)
