"""3D atmospheric fields (alt x lat x lon).

Parity reference: /root/reference/src/core/atm/atm_field.h — `AtmField`
with `GeodeticField3` gridded data per key and point sampling `at(alt,
lat, lon)` with per-axis extrapolation rules.

TPU-native: all keys regridded to one (alt, lat, lon) grid at scene
construction; point evaluation is one fused differentiable trilinear
interpolation (degenerate single-point axes behave as constants — a 1D
profile is just NLat = NLon = 1).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .field import AtmPointData


def _locate(grid, x):
    if grid.shape[0] == 1:
        z = jnp.zeros_like(jnp.asarray(x), dtype=jnp.int32)
        w = jnp.zeros(jnp.shape(x), jnp.result_type(float))
        return z, z, w
    i1 = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
    i0 = i1 - 1
    w = jnp.clip((x - grid[i0]) / (grid[i1] - grid[i0]), 0.0, 1.0)
    return i0, i1, w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Atmosphere3D:
    """Fields on an (alt, lat, lon) grid; t/vmr linear, p log-linear."""

    z: jax.Array  # [NZ] ascending altitude
    lat: jax.Array  # [NLat] ascending
    lon: jax.Array  # [NLon] ascending
    t: jax.Array  # [NZ, NLat, NLon]
    p: jax.Array  # [NZ, NLat, NLon]
    vmr: jax.Array  # [S, NZ, NLat, NLon]
    mag: jax.Array | None = None  # [3, NZ, NLat, NLon]
    wind: jax.Array | None = None  # [3, NZ, NLat, NLon]

    def at(self, alt, lat, lon) -> AtmPointData:
        iz0, iz1, wz = _locate(self.z, alt)
        ia0, ia1, wa = _locate(self.lat, lat)
        io0, io1, wo = _locate(self.lon, lon)

        def tri(f):
            def c(iz, ia, io):
                return f[..., iz, ia, io]

            return (
                (1 - wz)
                * (
                    (1 - wa) * ((1 - wo) * c(iz0, ia0, io0) + wo * c(iz0, ia0, io1))
                    + wa * ((1 - wo) * c(iz0, ia1, io0) + wo * c(iz0, ia1, io1))
                )
                + wz
                * (
                    (1 - wa) * ((1 - wo) * c(iz1, ia0, io0) + wo * c(iz1, ia0, io1))
                    + wa * ((1 - wo) * c(iz1, ia1, io0) + wo * c(iz1, ia1, io1))
                )
            )

        t = tri(self.t)
        p = jnp.exp(tri(jnp.log(self.p)))
        vmr = jnp.moveaxis(tri(self.vmr), 0, -1)
        zero3 = jnp.zeros(jnp.shape(alt) + (3,), t.dtype)
        mag = zero3 if self.mag is None else jnp.moveaxis(tri(self.mag), 0, -1)
        wind = zero3 if self.wind is None else jnp.moveaxis(tri(self.wind), 0, -1)
        return AtmPointData(t=t, p=p, vmr=vmr, mag=mag, wind=wind)
