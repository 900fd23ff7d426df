"""Absorption lookup table: train with the LBL kernel, evaluate with
differentiable interpolation.

Parity reference: /root/reference/src/core/lookup/lookup_map.h —
`lookup::table` stores xsec[T_pert x water_pert x log(p) x f] around a
reference profile (t_ref, water_ref on a pressure grid) and evaluates with
Lagrange interpolation per axis (orders configurable); trained by
abs_lookup_dataPrecompute / FromProfiles (src/m_lookup.cc:175,258).

TPU-native: training batches the LBL kernel over the full
(T_pert x w_pert x p) grid in one vmap; evaluation is a fused multilinear
gather (differentiable in T, p, vmr -> usable inside OEM retrievals).
The stored quantity is cross-section-per-molecule of the species
(alpha / (n * vmr)) so the table is linear in the species amount except
for the explicit water perturbation axis (self-broadening), as in the
reference.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .. import constants as const
from .catalog import LineCatalog
from .partfun import PartFunTable
from .voigt import absorption


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AbsLookupTable:
    """Lookup for one species (index spec_idx in the VMR vector)."""

    log_p_grid: jax.Array  # [P] ascending log(p)
    t_ref: jax.Array  # [P] reference temperature profile
    w_ref: jax.Array  # [P] reference water (self) vmr profile
    t_pert: jax.Array  # [NT] temperature perturbations
    w_pert: jax.Array  # [NW] water scaling factors (1.0 = ref)
    f_grid: jax.Array  # [F]
    xsec: jax.Array  # [NT, NW, P, F] cross section per molecule [m^2]
    spec_idx: int = dataclasses.field(metadata=dict(static=True), default=0)

    def absorption(self, T, P, vmr, t_order: int = 1, w_order: int = 1,
                   p_order: int = 1):
        """alpha [F] at one point (differentiable in T, P, vmr).

        t/w/p_order: Lagrange interpolation order per axis (the reference's
        configurable temperature/water/pressure orders,
        lookup_map.h:73-91); order 1 is multilinear.  Orders are clamped
        to the available grid sizes.
        """
        from ..ops.interp import lagrange_weights

        p_order = min(p_order, self.log_p_grid.shape[0] - 1)
        t_order = min(t_order, self.t_pert.shape[0] - 1)
        w_order = min(w_order, self.w_pert.shape[0] - 1)

        lp = jnp.asarray(jnp.log(P))
        pi0, pw = lagrange_weights(self.log_p_grid, lp, p_order)
        # local references at this pressure (same pressure weights)
        tr = sum(
            pw[..., c] * self.t_ref[pi0 + c] for c in range(p_order + 1)
        )
        wr = sum(
            pw[..., c] * self.w_ref[pi0 + c] for c in range(p_order + 1)
        )
        dt = jnp.asarray(T - tr)
        ti0, tw = lagrange_weights(self.t_pert, dt, t_order)
        wfac = jnp.asarray(vmr[self.spec_idx] / jnp.maximum(wr, 1e-30))
        wi0, ww = lagrange_weights(self.w_pert, wfac, w_order)

        x = self.xsec
        xs = 0.0
        for a in range(t_order + 1):
            for b in range(w_order + 1):
                for c in range(p_order + 1):
                    xs = xs + (
                        tw[..., a] * ww[..., b] * pw[..., c]
                    ) * x[ti0 + a, wi0 + b, pi0 + c]

        n = P / (const.k * T)
        return xs * n * vmr[self.spec_idx]


def train_lookup(
    f_grid,
    cat: LineCatalog,
    pf: PartFunTable,
    p_grid,
    t_ref,
    w_ref,
    vmr_ref,
    spec_idx: int,
    t_pert,
    w_pert,
    block: int = 256,
):
    """Precompute the table with the LBL kernel (abs_lookup_dataPrecompute
    parity): one vmapped sweep over (t_pert x w_pert x p)."""
    p_grid = jnp.asarray(p_grid)
    t_ref = jnp.asarray(t_ref)
    w_ref = jnp.asarray(w_ref)
    # store ascending in pressure (searchsorted requirement)
    order = jnp.argsort(p_grid)
    p_grid, t_ref, w_ref = p_grid[order], t_ref[order], w_ref[order]
    t_pert = jnp.asarray(t_pert)
    w_pert = jnp.asarray(w_pert)
    vmr_ref = jnp.asarray(vmr_ref)

    def xsec_point(dt, wfac, ip):
        T = t_ref[ip] + dt
        P = p_grid[ip]
        vmr = vmr_ref.at[spec_idx].set(w_ref[ip] * wfac)
        a = absorption(
            f_grid, cat, pf, T, P, vmr, no_negative_absorption=False, block=block
        )
        n = P / (const.k * T)
        return a / (n * jnp.maximum(vmr[spec_idx], 1e-30))

    ip = jnp.arange(p_grid.shape[0])
    fn = jax.vmap(
        jax.vmap(jax.vmap(xsec_point, (None, None, 0)), (None, 0, None)),
        (0, None, None),
    )
    xsec = fn(t_pert, w_pert, ip)  # [NT, NW, P, F]
    return AbsLookupTable(
        log_p_grid=jnp.log(p_grid),
        t_ref=t_ref,
        w_ref=w_ref,
        t_pert=t_pert,
        w_pert=w_pert,
        f_grid=jnp.asarray(f_grid),
        xsec=xsec,
        spec_idx=spec_idx,
    )
