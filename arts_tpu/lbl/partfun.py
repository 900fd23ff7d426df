"""Partition functions Q(T) per isotopologue.

Parity reference: /root/reference/src/partfun/ (coefficient- or
interpolation-form data compiled in from arts-cat-data XML).  Here the data
is a runtime pytree: either a polynomial-coefficient table or a sampled
T-grid table evaluated with differentiable interpolation — both batched
over isotopologues so Q(T) for every line is one gather + fused math.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartFunTable:
    """Q(T) for a set of isotopologues.

    Either polynomial coefficients ``coeffs`` [n_iso, n_coef] meaning
    Q(T) = sum_k coeffs[i, k] * T^k, or a sampled table ``t_grid`` [n_t] /
    ``q_grid`` [n_iso, n_t] interpolated linearly (ARTS interpolates its
    gridded form too).  If both are present the table wins.
    """

    coeffs: Optional[jax.Array] = None
    t_grid: Optional[jax.Array] = None
    q_grid: Optional[jax.Array] = None

    def Q(self, T, iso_idx):
        """Q(T) for isotopologue indices iso_idx (any shape)."""
        if self.t_grid is not None:
            t = self.t_grid
            i1 = jnp.clip(jnp.searchsorted(t, T), 1, t.shape[0] - 1)
            i0 = i1 - 1
            w = (T - t[i0]) / (t[i1] - t[i0])
            q = self.q_grid[iso_idx]  # [..., n_t]
            return q[..., i0] * (1.0 - w) + q[..., i1] * w
        c = self.coeffs[iso_idx]  # [..., n_coef]
        # Horner in T
        out = c[..., -1]
        for k in range(c.shape[-1] - 2, -1, -1):
            out = out * T + c[..., k]
        return out


def rigid_rotor_table(n_iso: int, q296, exponent=1.0):
    """Test helper: Q(T) = Q296 * (T/296)^exponent sampled on a T grid."""
    t = np.linspace(50.0, 500.0, 451)
    q296 = np.broadcast_to(np.asarray(q296, dtype=np.float64), (n_iso,))
    q = q296[:, None] * (t[None, :] / 296.0) ** exponent
    return PartFunTable(t_grid=jnp.asarray(t), q_grid=jnp.asarray(q))


def _interp_lin_extrap(T, Q, t):
    """Linear interpolation with clamped-interval (linear) extrapolation —
    the reference's evaluation form (make_auto_partfuns.cc:120-150)."""
    i1 = np.clip(np.searchsorted(T, t), 1, len(T) - 1)
    i0 = i1 - 1
    w = (t - T[i0]) / (T[i1] - T[i0])
    return Q[i0] * (1.0 - w) + Q[i1] * w


def table_from_xml(files, t_grid=None):
    """Build a PartFunTable from arts-cat-data TIPS XML files.

    files: ordered {isotopologue_tag: path-or-parsed-dict} — order defines
    iso_idx (match iso_index_of_lines from the catalog reader).  Each
    entry is a PartitionFunctionsData (src/partfun/xml_io_partfun.cc):
    Interp/StaticInterp [n, 2] (T, Q) rows, Coeff [n, 1] polynomial
    coefficients, or Constant.  All forms are sampled onto a common
    t_grid (default: 1 K spacing over the union range) and evaluated by
    the table's differentiable linear interpolation; beyond a file's own
    range the reference's clamped-interval linear extrapolation applies.

    Returns (PartFunTable, {isotopologue: iso_idx}).
    """
    from ..io.artsxml import load

    parsed = []
    for tag, f in files.items():
        d = f if isinstance(f, dict) else load(f)
        parsed.append((tag, d))

    tmins, tmaxs = [], []
    for _, d in parsed:
        if d["type"] in ("Interp", "StaticInterp"):
            tmins.append(float(np.min(d["data"][:, 0])))
            tmaxs.append(float(np.max(d["data"][:, 0])))
    lo = min(tmins) if tmins else 1.0
    hi = max(tmaxs) if tmaxs else 1000.0
    if t_grid is None:
        t_grid = np.linspace(lo, hi, max(int(round(hi - lo)) + 1, 2))
    t_grid = np.asarray(t_grid, np.float64)

    rows = []
    for _, d in parsed:
        data = np.asarray(d["data"], np.float64)
        kind = d["type"]
        if kind in ("Interp", "StaticInterp"):
            rows.append(_interp_lin_extrap(data[:, 0], data[:, 1], t_grid))
        elif kind == "Coeff":
            c = data.reshape(-1)
            rows.append(np.polyval(c[::-1], t_grid))
        elif kind == "Constant":
            rows.append(np.full_like(t_grid, float(np.ravel(data)[0])))
        else:
            raise ValueError(f"unknown PartitionFunctionsData type {kind}")

    table = PartFunTable(
        t_grid=jnp.asarray(t_grid), q_grid=jnp.asarray(np.stack(rows))
    )
    iso_map = {tag: i for i, (tag, _) in enumerate(parsed)}
    return table, iso_map
