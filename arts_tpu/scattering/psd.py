"""Particle size distributions.

Parity reference: /root/reference/src/core/scattering/psd.{h,cc} —
`MGDSingleMoment` (modified gamma distribution with lambda derived from a
single mass-density moment; named configs Abel12/Wang16/Field19 at
psd.cc:79-101) and `BinnedPSD` (piecewise-constant counts, psd.cc:128).

All evaluations are differentiable JAX (the reference carries optional
hand-written MGD derivatives in mgd_with_derivatives; autodiff replaces
them).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp

MGD_CONFIGS = {
    # name: (n_alpha, n_b, mu, gamma)  — psd.cc:85-100, SI units
    "Abel12": (0.22, 2.2, 0.0, 1.0),
    "Wang16": (14.764, 1.49, 0.0, 1.0),
    "Field19": (7.9e9, -2.58, 0.0, 1.0),
}


def mgd_psd(sizes, n0, mu, lam, gamma):
    """Modified gamma: N(D) = n0 D^mu exp(-lam D^gamma)."""
    return n0 * sizes**mu * jnp.exp(-lam * sizes**gamma)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGDSingleMoment:
    """Single-moment MGD: lambda from mass density via the mass-size
    relation m(D) = a D^b (psd.cc:56-62)."""

    n_alpha: jax.Array
    n_b: jax.Array
    mu: jax.Array
    gamma: jax.Array
    t_min: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    t_max: float = dataclasses.field(metadata=dict(static=True), default=999.0)

    @classmethod
    def from_name(cls, name, t_min=0.0, t_max=999.0):
        na, nb, mu, ga = MGD_CONFIGS[name]
        j = jnp.asarray
        return cls(j(na), j(nb), j(mu), j(ga), t_min, t_max)

    def evaluate(self, water_content, t, sizes, a, b):
        """PSD number density at `sizes` [m] given mass density [kg/m^3].

        a, b: mass-size relation parameters of the particle data.
        """
        wc = jnp.abs(water_content)
        k = (b + self.mu + 1.0 - self.gamma) / self.gamma
        expo = 1.0 / (self.n_b - k - 1.0)
        denom = a * self.n_alpha * jnp.exp(jax.lax.lgamma(k + 1.0))
        # sanitize BEFORE the (typically negative) power: 0^expo -> inf
        # whose cotangent survives the final where as NaN under autodiff
        # (d psd/d wc at wc = 0 is then a clean 0)
        ok = (wc > 0.0) & (t >= self.t_min) & (t <= self.t_max)
        wc_safe = jnp.where(wc > 0.0, wc, 1.0)
        lam = (wc_safe * self.gamma / denom) ** expo
        n0 = self.n_alpha * lam**self.n_b
        psd = mgd_psd(sizes, n0, self.mu, lam, self.gamma)
        return jnp.where(ok, psd, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedPSD:
    """Piecewise-constant counts over size bins (psd.cc:128-150)."""

    bins: jax.Array  # [nbins+1] ascending edges
    counts: jax.Array  # [nbins]
    t_min: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    t_max: float = dataclasses.field(metadata=dict(static=True), default=350.0)

    def evaluate(self, water_content, t, sizes, a=None, b=None):
        idx = jnp.searchsorted(self.bins, sizes) - 1
        inside = (idx >= 0) & (idx < self.counts.shape[0])
        pnd = jnp.where(inside, self.counts[jnp.clip(idx, 0)], 0.0)
        ok = (t >= self.t_min) & (t <= self.t_max)
        return jnp.where(ok, pnd, 0.0)
