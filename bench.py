"""Driver benchmark: spectral points/s/chip for the LBL(+RT) pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is the
ratio to the first self-recorded value (BENCH_SELF_BASELINE below).
"""

import json
import time

import numpy as np

# self-recorded round-1 starting point (points/s/chip); updated as the
# kernel improves so the ratio tracks progress across rounds
BENCH_SELF_BASELINE = 6.94e4  # round-1 first TPU measurement


def build(n_lev=60, n_lines=2048, n_freq=8192):
    import jax.numpy as jnp

    from arts_tpu.atm import Atmosphere1D
    from arts_tpu.atm.field import hydrostatic_pressure
    from arts_tpu.fwd import ClearskyScene
    from arts_tpu.lbl.catalog import build_catalog
    from arts_tpu.lbl.partfun import rigid_rotor_table
    from arts_tpu.lbl.tmodel import Law
    from arts_tpu.path import geometric_path_1d

    z = jnp.linspace(0.0, 80e3, n_lev)
    t = 288.0 - 6.5e-3 * jnp.minimum(z, 12e3)
    p = hydrostatic_pressure(z, t, 101325.0)
    vmr0 = 0.005 * jnp.exp(-z / 2e3)
    atm = Atmosphere1D(z=z, t=t, p=p, vmr=jnp.stack([vmr0, 1.0 - vmr0]))

    rng = np.random.default_rng(7)
    f0s = np.sort(rng.uniform(160e9, 260e9, n_lines))
    lines = [
        dict(
            f0=float(f0),
            a=float(a),
            e0=float(e0),
            gu=5.0,
            gl=3.0,
            iso_mass=18.0,
            iso_ratio=1.0,
            spec_idx=0,
            iso_idx=0,
            band_idx=0,
            t0=296.0,
            cutoff=25e9,
            ls={"bath": {"G0": (Law.T1, [2.0e4, 0.75])}},
        )
        for f0, a, e0 in zip(
            f0s,
            rng.uniform(1e-8, 1e-6, n_lines),
            rng.uniform(5e-22, 5e-21, n_lines),
        )
    ]
    cat = build_catalog(lines)
    pf = rigid_rotor_table(1, 180.0, 1.5)
    scene = ClearskyScene(atm=atm, cat=cat, pf=pf)

    f_grid = jnp.linspace(160e9, 260e9, n_freq)
    path = geometric_path_1d(100e3, 180.0, 0.0, 80e3, 2000.0)
    return scene, f_grid, jnp.asarray(path.alt), jnp.asarray(path.dr)


def main():
    import jax

    scene, f_grid, alt, dr = build()
    from arts_tpu.fwd import simulate_clearsky

    fn = jax.jit(
        lambda s, f, a, d: simulate_clearsky(s, f, a, d, background="surface")
    )
    out = fn(scene, f_grid, alt, dr)
    out.block_until_ready()  # compile + warmup

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(scene, f_grid, alt, dr)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    pts_per_s = f_grid.shape[0] / dt
    print(
        json.dumps(
            {
                "metric": "spectral points/s/chip (LBL clearsky radiance, "
                f"{scene.cat.n_lines} lines x {f_grid.shape[0]} freqs x "
                f"{alt.shape[0]} path pts)",
                "value": pts_per_s,
                "unit": "points/s/chip",
                "vs_baseline": pts_per_s / BENCH_SELF_BASELINE,
            }
        )
    )


if __name__ == "__main__":
    main()
