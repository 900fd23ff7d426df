"""Sensor observation elements: weighted contractions of simulated radiance.

Parity reference: /root/reference/src/core/sensor/obsel.h — `SensorObsel`
holds a shared frequency grid + poslos vector and a sparse Stokes weight
matrix over (poslos x freq); one measurement-vector element is
y[i] = sum w * I (m_rad.cc:444-467 contraction, HighPerf kernel).

TPU-native redesign: the deduped (geometry, frequency) simulation batch is
a dense array I[geo, freq(, stokes)]; each measurement element is a COO
weight list contracted with gather + segment_sum (jax.ops.segment_sum) —
the sparse-matrix trick the reference implements by hand, expressed in two
XLA-native ops that fuse and shard (segment ids static at trace time).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SensorArray:
    """COO weights: y[row[k]] += w[k] * I[geo[k], freq[k]] for k in nnz."""

    row: jax.Array  # [nnz] int32 measurement element index
    geo: jax.Array  # [nnz] int32 geometry index
    freq: jax.Array  # [nnz] int32 frequency index
    w: jax.Array  # [nnz] weights
    n_elements: int = dataclasses.field(metadata=dict(static=True), default=0)

    def apply(self, I):
        """Contract radiance I[geo, freq] (or [geo, freq, stokes]) into the
        measurement vector [n_elements] (or [n_elements, stokes])."""
        vals = I[self.geo, self.freq]
        if vals.ndim == 1:
            vv = self.w * vals
        else:
            vv = self.w[:, None] * vals
        return jax.ops.segment_sum(vv, self.row, num_segments=self.n_elements)


def gaussian_channels(
    f_grid, centers, fwhm, geo_idx=0, normalize=True
) -> SensorArray:
    """Gaussian channel responses on a shared frequency grid (host-side).

    Parity: measurement_sensorAddSimpleGaussian / AddVectorGaussian WSMs.
    """
    f_grid = np.asarray(f_grid)
    centers = np.atleast_1d(np.asarray(centers, dtype=np.float64))
    fwhm = np.broadcast_to(np.asarray(fwhm, dtype=np.float64), centers.shape)
    geo_idx = np.broadcast_to(np.asarray(geo_idx, dtype=np.int32), centers.shape)

    rows, geos, freqs, ws = [], [], [], []
    for i, (c, fw, g) in enumerate(zip(centers, fwhm, geo_idx)):
        sigma = fw / (2.0 * np.sqrt(2.0 * np.log(2.0)))
        w = np.exp(-0.5 * ((f_grid - c) / sigma) ** 2)
        keep = w > 1e-10
        w = w[keep]
        if normalize and w.sum() > 0:
            w = w / w.sum()
        idx = np.nonzero(keep)[0]
        rows.append(np.full(idx.size, i, dtype=np.int32))
        geos.append(np.full(idx.size, g, dtype=np.int32))
        freqs.append(idx.astype(np.int32))
        ws.append(w)

    return SensorArray(
        row=jnp.asarray(np.concatenate(rows)),
        geo=jnp.asarray(np.concatenate(geos)),
        freq=jnp.asarray(np.concatenate(freqs)),
        w=jnp.asarray(np.concatenate(ws)),
        n_elements=len(centers),
    )


def raw_channels(n_freq, geo_idx=0) -> SensorArray:
    """One measurement element per frequency grid point (the reference's
    measurement_sensorAddSimple raw sensor)."""
    import numpy as np

    idx = np.arange(n_freq, dtype=np.int32)
    return SensorArray(
        row=jnp.asarray(idx),
        geo=jnp.asarray(np.full(n_freq, geo_idx, dtype=np.int32)),
        freq=jnp.asarray(idx),
        w=jnp.ones((n_freq,)),
        n_elements=int(n_freq),
    )


def gaussian_zenith_channels(
    dzen_grid, std_zen, n_freq, geo_offset=0, normalize=True
) -> SensorArray:
    """Gaussian antenna response over zenith offsets (one measurement
    element per frequency, summing geometries with Gaussian weights).

    Parity: measurement_sensorAddGaussianZenith (workspace_methods.cpp) —
    the simulation batch must contain one geometry per dzen_grid entry
    (LOS zenith = center + dzen), starting at geo_offset.
    """
    dzen = np.asarray(dzen_grid, dtype=np.float64)
    wg = np.exp(-0.5 * (dzen / float(std_zen)) ** 2)
    if normalize:
        wg = wg / wg.sum()
    G = dzen.size
    rows = np.repeat(np.arange(n_freq, dtype=np.int32), G)
    geos = np.tile(
        (geo_offset + np.arange(G)).astype(np.int32), n_freq
    )
    freqs = np.repeat(np.arange(n_freq, dtype=np.int32), G)
    ws = np.tile(wg, n_freq)
    return SensorArray(
        row=jnp.asarray(rows),
        geo=jnp.asarray(geos),
        freq=jnp.asarray(freqs),
        w=jnp.asarray(ws),
        n_elements=n_freq,
    )


def camera_pixels(
    n_h, n_w, ccd_h, ccd_w, focal_length, focus_distance,
):
    """Thin-lens camera pixel LOS offsets [(n_h*n_w), 2] (dzen, dazi) [deg].

    Parity: measurement_sensorAddCamera (workspace_methods.cpp) — the
    image distance follows the thin-lens equation d_i = f d_o / (d_o - f)
    and pixel offsets are negated arctans of the CCD displacement (the
    lens inverts the image).
    """
    f = float(focal_length)
    d_o = float(focus_distance)
    d_i = f * d_o / (d_o - f)
    ys = (np.arange(n_h) - (n_h - 1) / 2.0) * (ccd_h / n_h)
    xs = (np.arange(n_w) - (n_w - 1) / 2.0) * (ccd_w / n_w)
    dzen = -np.rad2deg(np.arctan2(ys, d_i))
    dazi = -np.rad2deg(np.arctan2(xs, d_i))
    zz, aa = np.meshgrid(dzen, dazi, indexing="ij")
    return np.stack([zz.ravel(), aa.ravel()], axis=-1)


def camera_channels(n_h, n_w, n_freq, geo_offset=0) -> SensorArray:
    """Dirac per-(pixel, frequency) measurement elements for a camera whose
    pixels occupy geometries [geo_offset, geo_offset + n_h*n_w).

    Element ordering is (pixel-major, frequency-minor), matching the
    reference's n_h x n_w x nfreq element layout.
    """
    P = n_h * n_w
    rows = np.arange(P * n_freq, dtype=np.int32)
    geos = (geo_offset + np.repeat(np.arange(P), n_freq)).astype(np.int32)
    freqs = np.tile(np.arange(n_freq, dtype=np.int32), P)
    return SensorArray(
        row=jnp.asarray(rows),
        geo=jnp.asarray(geos),
        freq=jnp.asarray(freqs),
        w=jnp.ones((P * n_freq,)),
        n_elements=P * n_freq,
    )
