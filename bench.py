"""Driver benchmark: spectral points/s/chip for the combined LBL + DISORT
pipeline (the BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is the
ratio to the first self-recorded value below.
"""

import json
import time

import numpy as np

# first TPU measurement of this benchmark definition (round 1):
# 4705 points/s/chip at 2048 lines x 4096 freqs x 60 levels, 16 streams
BENCH_SELF_BASELINE = 4.70e3


def build_scene(n_lev=60, n_lines=2048, n_freq=4096):
    import jax.numpy as jnp

    from arts_tpu.atm.standard import standard_atmosphere
    from arts_tpu.fwd_allsky import AllskyScene
    from arts_tpu.lbl.catalog import build_catalog
    from arts_tpu.lbl.partfun import rigid_rotor_table
    from arts_tpu.lbl.tmodel import Law
    from arts_tpu.scattering import HenyeyGreenstein

    atm = standard_atmosphere(n_levels=n_lev, z_top=80e3, species=("H2O", "N2"))

    rng = np.random.default_rng(7)
    f0s = np.sort(rng.uniform(160e9, 260e9, n_lines))
    lines = [
        dict(
            f0=float(f0), a=float(a), e0=float(e0), gu=5.0, gl=3.0,
            iso_mass=18.0, iso_ratio=1.0, spec_idx=0, iso_idx=0, band_idx=0,
            t0=296.0, cutoff=25e9,
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
    cloud = HenyeyGreenstein(
        ext=jnp.where((atm.z > 4e3) & (atm.z < 9e3), 3e-4, 0.0),
        ssa=jnp.full(atm.z.shape, 0.85),
        g=jnp.full(atm.z.shape, 0.7),
    )
    scene = AllskyScene(
        atm=atm, cat=cat, pf=pf, scatterers=(cloud,),
        surface_temperature=jnp.asarray(288.0),
    )
    f_grid = jnp.linspace(160e9, 260e9, n_freq)
    return scene, f_grid


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from arts_tpu.fwd_allsky import gas_absorption_profile, simulate_allsky

    backend = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    scene, f_grid = build_scene()

    def run():
        # two jits: absorption and the DISORT solve compile independently
        # (the fused whole-pipeline compile is pathologically slow on the
        # remote-compile path)
        k_gas = gas_absorption_profile(scene, f_grid, backend=backend)
        out = simulate_allsky(
            scene, f_grid, nquad=16, nfourier=1, backend=backend,
            fast_linalg=True, k_gas=k_gas,
        )
        return out.flux_up

    out = run()
    out.block_until_ready()  # compile + warmup

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    pts_per_s = f_grid.shape[0] / dt
    print(
        json.dumps(
            {
                "metric": "spectral points/s/chip (LBL+DISORT allsky: "
                f"{scene.cat.n_lines} lines x {f_grid.shape[0]} freqs x "
                f"{scene.atm.z.shape[0]} levels, 16 streams)",
                "value": pts_per_s,
                "unit": "points/s/chip",
                "vs_baseline": pts_per_s / BENCH_SELF_BASELINE,
            }
        )
    )


if __name__ == "__main__":
    main()
