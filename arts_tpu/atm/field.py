"""Atmospheric state fields as pytrees.

Parity reference: /root/reference/src/core/atm/atm_field.h — `AtmField`
maps heterogeneous keys (t, p, wind, mag, VMRs, NLTE, scattering props) to
per-key gridded/constant/functional data with per-point variant dispatch
and Lagrange interpolation (`at(alt,lat,lon)`, flat_weight for Jacobians).

TPU-native redesign: all fields are regridded at construction onto one
common altitude grid (stacked arrays), so point evaluation is a single
differentiable interpolation — no variant dispatch, no string keys; the
Jacobian mapping the reference builds by hand from `flat_weight`
(atm_field.h:239) falls out of autodiff through the interpolation weights.

1D (altitude-profile) atmosphere first; 3D fields follow the same design
with separate lat/lon axes.
"""

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AtmPointData:
    """All atmospheric quantities evaluated at path points (batched)."""

    t: jax.Array  # [...] temperature [K]
    p: jax.Array  # [...] pressure [Pa]
    vmr: jax.Array  # [..., S] volume mixing ratios
    mag: jax.Array  # [..., 3] magnetic field [T]
    wind: jax.Array  # [..., 3] wind [m/s]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Atmosphere1D:
    """1D atmosphere on an ascending altitude grid.

    t, vmr interpolate linearly in altitude; p log-linearly (the standard
    choice for hydrostatic profiles; ARTS interpolates its gridded fields
    with configurable Lagrange orders — order-1 here, higher orders via
    ops.interp when needed).
    """

    z: jax.Array  # [N] altitude [m], ascending
    t: jax.Array  # [N]
    p: jax.Array  # [N]
    vmr: jax.Array  # [S, N]
    mag: jax.Array | None = None  # [3, N]
    wind: jax.Array | None = None  # [3, N]

    @property
    def n_levels(self):
        return self.z.shape[0]

    @property
    def n_species(self):
        return self.vmr.shape[0]

    def at(self, alt) -> AtmPointData:
        """Evaluate the atmosphere at altitudes `alt` [...] (differentiable
        in both alt and the field values)."""
        alt = jnp.asarray(alt)
        z = self.z
        i1 = jnp.clip(jnp.searchsorted(z, alt), 1, z.shape[0] - 1)
        i0 = i1 - 1
        w = (alt - z[i0]) / (z[i1] - z[i0])
        w = jnp.clip(w, 0.0, 1.0)  # clamp-extrapolate beyond the grid

        def lin(f):
            return f[..., i0] * (1.0 - w) + f[..., i1] * w

        t = lin(self.t)
        p = jnp.exp(lin(jnp.log(self.p)))
        vmr = jnp.moveaxis(lin(self.vmr), 0, -1)  # [..., S]
        zero3 = jnp.zeros(alt.shape + (3,), dtype=t.dtype)
        mag = zero3 if self.mag is None else jnp.moveaxis(lin(self.mag), 0, -1)
        wind = zero3 if self.wind is None else jnp.moveaxis(lin(self.wind), 0, -1)
        return AtmPointData(t=t, p=p, vmr=vmr, mag=mag, wind=wind)


def hydrostatic_pressure(
    z, t, p0, g0=9.80665, mean_mass_gmol=28.9647, radius=6.371e6,
    gravity=None, lat_deg=0.0,
):
    """Hydrostatic p(z) from T(z) and surface pressure (host or traced).

    Parity: m_atm.cc atm_fieldHydrostaticPressure; gravity decays with
    altitude as g0 (R/(R+z))^2 (the reference's gravity operator in the
    functional fields, src/core/functional/).  Pass gravity=callable
    g(h, lat_deg) — e.g. path.geodesy.ellipsoid_gravity("Mars") — to use
    the reference's EllipsoidGravity GM/r^2 operator for other bodies
    (functional_gravity.cpp:7, gravity_operatorCentralMass
    m_planets.cc:261); g0/radius are then ignored."""
    from .. import constants as const

    m = mean_mass_gmol * 1e-3 / const.NA  # molecule mass [kg]
    zbar = 0.5 * (z[1:] + z[:-1])
    if gravity is not None:
        g = gravity(zbar, lat_deg)
    else:
        g = g0 * (radius / (radius + zbar)) ** 2
    tbar = 0.5 * (t[1:] + t[:-1])
    dz = z[1:] - z[:-1]
    dlnp = -m * g * dz / (const.k * tbar)
    lnp = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.cumsum(dlnp)])
    return p0 * jnp.exp(lnp)
