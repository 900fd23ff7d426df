"""Surface fields.

Parity reference: /root/reference/src/core/surface/surf.h — `SurfaceField`:
ellipsoid + keyed (temperature, elevation, user properties) data as
constant or lat/lon-gridded fields with a `SurfacePoint` evaluation.

TPU-native: a pytree of (lat, lon) grids + stacked property arrays with
differentiable bilinear evaluation; constants are 1x1 grids.
"""

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceField:
    """2D surface property field (temperature, emissivity, elevation...)."""

    lat: jax.Array  # [NLat] ascending
    lon: jax.Array  # [NLon] ascending
    temperature: jax.Array  # [NLat, NLon]
    elevation: jax.Array  # [NLat, NLon]
    emissivity: jax.Array  # [NLat, NLon]

    @classmethod
    def constant(cls, temperature=288.0, elevation=0.0, emissivity=1.0):
        one = lambda v: jnp.full((1, 1), v)
        return cls(
            lat=jnp.zeros((1,)),
            lon=jnp.zeros((1,)),
            temperature=one(temperature),
            elevation=one(elevation),
            emissivity=one(emissivity),
        )

    def at(self, lat, lon):
        """Bilinear evaluation (clamped) -> dict of properties."""

        def locate(grid, x):
            if grid.shape[0] == 1:
                z = jnp.zeros_like(jnp.asarray(x), dtype=jnp.int32)
                return z, z, jnp.zeros_like(jnp.asarray(x, jnp.result_type(float)))
            i1 = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
            i0 = i1 - 1
            w = jnp.clip((x - grid[i0]) / (grid[i1] - grid[i0]), 0.0, 1.0)
            return i0, i1, w

        ia0, ia1, wa = locate(self.lat, lat)
        io0, io1, wo = locate(self.lon, lon)

        def bil(f):
            return (1 - wa) * ((1 - wo) * f[ia0, io0] + wo * f[ia0, io1]) + wa * (
                (1 - wo) * f[ia1, io0] + wo * f[ia1, io1]
            )

        return dict(
            temperature=bil(self.temperature),
            elevation=bil(self.elevation),
            emissivity=bil(self.emissivity),
        )
