"""Lagrange interpolation of configurable order, differentiable.

Parity reference: /root/reference/src/core/matpack/lagrange_interp.h —
Lagrange weights (and derivatives, which autodiff provides here) with
per-axis orders; used by the reference's atm/surface field sampling and
lookup-table evaluation.

TPU-native: weights are computed from a static order with gathered
neighbor windows, so evaluation is one fused gather + contraction.
"""

import functools

import jax
import jax.numpy as jnp


def lagrange_weights(grid, x, order: int):
    """(idx0 [...], w [..., order+1]) neighbor window start + weights.

    grid: [N] ascending; x: any shape. The window is clamped inside the
    grid (ARTS's check-bounds behavior with clamped extrapolation).
    """
    n = grid.shape[0]
    m = order + 1
    i1 = jnp.clip(jnp.searchsorted(grid, x), 1, n - 1)
    i0 = jnp.clip(i1 - (m + 1) // 2, 0, max(n - m, 0))
    # nodes: grid[i0 + k], k = 0..order
    offs = jnp.arange(m)
    nodes = grid[i0[..., None] + offs]  # [..., m]
    xd = x[..., None] - nodes
    # w_k = prod_{j != k} (x - x_j) / (x_k - x_j)
    diff = nodes[..., :, None] - nodes[..., None, :]  # [..., m, m]
    diff = jnp.where(jnp.eye(m, dtype=bool), 1.0, diff)
    num = jnp.where(jnp.eye(m, dtype=bool), 1.0, xd[..., None, :])
    w = jnp.prod(num / diff, axis=-1)
    return i0, w


@functools.partial(jax.jit, static_argnames=("order", "axis"))
def interp(grid, values, x, order: int = 1, axis: int = -1):
    """Interpolate `values` along `axis` (sampled on `grid`) to `x`.

    order=1 reproduces linear interpolation; higher orders give the
    reference's Lagrange behavior for smooth fields.
    """
    values = jnp.moveaxis(values, axis, -1)
    i0, w = lagrange_weights(grid, jnp.asarray(x), order)
    offs = jnp.arange(order + 1)
    window = values[..., i0[..., None] + offs]  # [..., x-shape, m]
    return jnp.sum(window * w, axis=-1)
