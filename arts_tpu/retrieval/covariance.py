"""Covariance-matrix construction helpers.

Parity reference: /root/reference/src/core/jacobian/covariance_matrix.h —
sparse-block `CovarianceMatrix` with per-target blocks and stored
inverses, plus the Retrieval* WSMs that register diagonal/functional
covariances.  Dense-block builders here (state dims are small).
"""

import numpy as np

import jax.numpy as jnp


def diagonal(sd):
    """Diagonal covariance from per-element standard deviations."""
    sd = jnp.asarray(sd)
    return jnp.diag(sd * sd)


def exponential(grid, sd, corr_length):
    """exp(-|dz|/l) correlated covariance on a spatial grid."""
    g = np.asarray(grid, dtype=np.float64)
    d = np.abs(g[:, None] - g[None, :])
    sd = np.broadcast_to(np.asarray(sd, dtype=np.float64), g.shape)
    return jnp.asarray(np.outer(sd, sd) * np.exp(-d / corr_length))


def gaussian(grid, sd, corr_length):
    """exp(-(dz/l)^2) correlated covariance."""
    g = np.asarray(grid, dtype=np.float64)
    d = np.abs(g[:, None] - g[None, :])
    sd = np.broadcast_to(np.asarray(sd, dtype=np.float64), g.shape)
    return jnp.asarray(np.outer(sd, sd) * np.exp(-((d / corr_length) ** 2)))


def block_diag(*blocks):
    """Stack per-target covariance blocks into the full S_a
    (RetrievalFinalizeDiagonal parity for the dense representation)."""
    blocks = [np.asarray(b) for b in blocks]
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    o = 0
    for b in blocks:
        m = b.shape[0]
        out[o : o + m, o : o + m] = b
        o += m
    return jnp.asarray(out)
