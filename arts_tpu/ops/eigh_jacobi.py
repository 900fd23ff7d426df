"""Batched symmetric eigendecomposition via parallel cyclic Jacobi.

XLA's `eigh` lowers to a sequential custom call that is very slow for
huge batches of tiny matrices (the DISORT per-layer-per-frequency 8x8
problems: ~60k matrices).  This implementation uses tournament-scheduled
parallel Jacobi sweeps: each round applies n/2 disjoint Givens rotations
at once as one orthogonal matrix, so a sweep is a handful of batched
n x n matmuls that fuse on the MXU/VPU.

Accuracy: quadratic convergence; `sweeps=8` reaches f32 roundoff and
~1e-13 in f64 for n <= 16.  Ordering matches jnp.linalg.eigh (ascending).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _tournament(n: int):
    """Round-robin schedule: list of rounds, each a list of disjoint (p,q)."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [
            (min(players[i], players[n - 1 - i]), max(players[i], players[n - 1 - i]))
            for i in range(n // 2)
        ]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


def eigh_jacobi(A, sweeps: int | None = None):
    """(w, V) with A = V diag(w) V^T; A: [..., n, n] symmetric.

    Drop-in for jnp.linalg.eigh on small n (ascending eigenvalues).
    sweeps defaults to 6 in f32 (reaches roundoff) and 8 in f64.
    """
    if sweeps is None:
        sweeps = 6 if A.dtype == jnp.float32 else 8
    n = A.shape[-1]
    batch = A.shape[:-2]
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype), A.shape)
    rounds = _tournament(n)

    def rotation_matrix(A, pairs):
        """Q [..., n, n]: simultaneous Givens rotations for disjoint pairs."""
        Q = jnp.zeros(batch + (n, n), dtype)
        done = set()
        for p, q in pairs:
            app = A[..., p, p]
            aqq = A[..., q, q]
            apq = A[..., p, q]
            # stable rotation angle: t = sign(theta)/(|theta|+sqrt(theta^2+1))
            theta = (aqq - app) / (2.0 * jnp.where(apq == 0.0, 1.0, apq))
            t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
            t = jnp.where(apq == 0.0, 0.0, t)
            c = 1.0 / jnp.sqrt(t * t + 1.0)
            s = t * c
            Q = Q.at[..., p, p].set(c)
            Q = Q.at[..., q, q].set(c)
            Q = Q.at[..., p, q].set(s)
            Q = Q.at[..., q, p].set(-s)
            done.add(p)
            done.add(q)
        for r in range(n):
            if r not in done:
                Q = Q.at[..., r, r].set(1.0)
        return Q

    for _ in range(sweeps):
        for pairs in rounds:
            Q = rotation_matrix(A, pairs)
            AQ = jnp.einsum("...ij,...jk->...ik", A, Q)
            A = jnp.einsum("...ji,...jk->...ik", Q, AQ)
            V = jnp.einsum("...ij,...jk->...ik", V, Q)

    w = jnp.einsum("...ii->...i", A)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V
