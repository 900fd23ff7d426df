"""Driver benchmark: spectral points/s/chip for the combined LBL + DISORT
pipeline (the BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is the
ratio to the first self-recorded value below.

Scene hardening (round 2): the line catalog is built through the
io.hitran .par ingestion path — two species (H2O + O2) with per-line
self + air perturber maps (T1 G0 laws with spread exponents, T0 D0
shifts), finite ByLine cutoffs, and HITRAN-like parameter raggedness —
so the measured number survives real-catalog configs, per VERDICT
round-1 item 4.  Extra recorded metrics: LBL-only points/s (f32 + f64)
and the Zeeman polarized propmat path, plus the pallas/XLA kernel ratio.
"""

import json
import time

import numpy as np

# first TPU measurement of this benchmark definition (round 1):
# 4705 points/s/chip at 2048 lines x 4096 freqs x 60 levels, 16 streams
BENCH_SELF_BASELINE = 4.70e3


def synth_par_rows(n_lines=2048, fmin=160e9, fmax=260e9, seed=7):
    """Synthetic but HITRAN-shaped .par rows for H2O + O2 (offline stand-in
    for a real catalog: exercises the parser, per-line 2-perturber maps,
    spread broadening exponents, pressure shifts, O2 local quanta)."""
    rng = np.random.default_rng(seed)
    c = 29979245800.0  # cm/s -> nu[cm-1] = f/100c
    rows = []
    half = n_lines // 2
    f0s = np.sort(rng.uniform(fmin, fmax, n_lines))
    for i, f0 in enumerate(f0s):
        is_h2o = i % 2 == 0
        mol = 1 if is_h2o else 7
        nu = f0 / (100.0 * 299792458.0)
        A = rng.uniform(1e-8, 1e-6)
        gair = rng.uniform(0.02, 0.10)  # cm-1/atm
        gself = gair * rng.uniform(1.1, 5.0)
        e0 = rng.uniform(0.0, 1500.0)  # cm-1
        n_air = rng.uniform(0.4, 0.9)
        dair = rng.uniform(-0.01, 0.01)
        gu = 2.0 * rng.integers(1, 20) + 1.0
        # O2 lines carry group-2 local quanta so the Zeeman variant can
        # auto-derive g's (io.quantum GetAdvancedModel parity)
        N = int(rng.integers(1, 20))
        loc = f"  Q {N:2d}  R {max(N - 1, 0):2d}   " if not is_h2o else ""
        row = (
            f"{mol:2d}" + "1"
            + f"{nu:12.6f}" + f"{1e-30:10.3E}" + f"{A:10.3E}"
            + f"{gair:5.4f}"[:5] + f"{gself:5.4f}"[:5]
            + f"{e0:10.4f}" + f"{n_air:4.2f}" + f"{dair:8.6f}"
            + " " * 30 + " " * 15 + loc.ljust(15)
        ).ljust(146) + f"{gu:7.1f}" + f"{max(gu - 2, 1):7.1f}"
        rows.append(row)
    return rows


def _try_real_catalog(cutoff, fmin=160e9, fmax=260e9):
    """(cat, pf, mode) from an arts-cat-data cache dir when one resolves
    (VERDICT r2 item 10); None when offline/incomplete — the caller falls
    back to the deterministic synthetic catalog."""
    try:
        from arts_tpu.io.data import (
            read_catalog_data,
            read_partfun_data,
            search_paths,
        )
        from arts_tpu.io.hitran import iso_index_of_lines

        if not any((p / "lines").is_dir() for p in search_paths()):
            return None
        out = read_catalog_data(
            ["H2O", "O2"], cutoff=cutoff, fmin=fmin, fmax=fmax
        )
        cat = out["cat"]
        if cat is None or cat.n_lines < 64:
            return None
        # partition functions matching the catalog's iso_idx rows
        isotags = out.get("isotopologues")
        if isotags is None:
            return None
        pf, _ = read_partfun_data(isotags)
        return cat, pf, f"cache-dir ({cat.n_lines} lines)"
    except Exception:
        return None


def build_scene(n_lev=60, n_freq=4096, cutoff=25e9):
    import jax.numpy as jnp

    from arts_tpu.atm.standard import standard_atmosphere
    from arts_tpu.fwd_allsky import AllskyScene
    from arts_tpu.io.hitran import read_par
    from arts_tpu.lbl.catalog import build_catalog
    from arts_tpu.lbl.partfun import rigid_rotor_table
    from arts_tpu.scattering import HenyeyGreenstein

    atm = standard_atmosphere(n_levels=n_lev, z_top=80e3, species=("H2O", "O2"))

    real = _try_real_catalog(cutoff)
    if real is not None:
        cat, pf, build_scene.catalog_mode = real
    else:
        rows = synth_par_rows()
        lines = read_par(rows, ["H2O", "O2"], strength_option="A", cutoff=cutoff)
        lines.sort(key=lambda l: l["f0"])
        cat = build_catalog(lines)
        pf = rigid_rotor_table(2, [174.6, 215.7], 1.5)
        build_scene.catalog_mode = "synthetic-par"
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


def _cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def _timeit(fn, iters=5):
    """Time fn(i) over iters calls, i = 1..iters.

    fn MUST vary its device inputs with i: the axon remote-execution
    tunnel deduplicates bit-identical pure executions (measured 53 us vs
    118 ms per iteration for the same jitted matmul chain), so timing a
    loop of identical calls measures RPC caching, not the TPU.
    """
    out = fn(0)
    jax_block(out)
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(i)
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def jax_block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from arts_tpu.fwd_allsky import gas_absorption_profile, simulate_allsky

    backend = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    # NOTE: x64 mode stays OFF in this process — Mosaic rejects kernels
    # compiled under jax_enable_x64 on this toolchain (even pure-f32
    # ones), so the f64 variant runs in a subprocess below.
    scene, f_grid = build_scene()

    def run(i):
        # two jits: absorption and the DISORT solve compile independently
        # (the fused whole-pipeline compile is pathologically slow on the
        # remote-compile path).  The i-Hz grid shift (<1e-11 relative) is
        # physically irrelevant but makes every execution distinct.
        fg = f_grid + jnp.float32(i)
        k_gas = gas_absorption_profile(scene, fg, backend=backend)
        out = simulate_allsky(
            scene, fg, nquad=16, nfourier=1, backend=backend,
            fast_linalg=True, k_gas=k_gas,
        )
        return out.flux_up

    dt = _timeit(run)
    pts_per_s = f_grid.shape[0] / dt

    extras = {}
    try:  # LBL-only f32, both backends (kernel speedup ratio)
        dt_p = _timeit(
            lambda i: gas_absorption_profile(
                scene, f_grid + jnp.float32(i), backend=backend
            )
        )
        extras["lbl_pts_per_s"] = f_grid.shape[0] / dt_p
        # stage breakdown: the headline run is LBL + DISORT; everything
        # past absorption is the DISORT stage (VERDICT r2 asked for this)
        extras["lbl_stage_ms"] = dt_p * 1e3
        extras["disort_stage_ms"] = max(dt - dt_p, 0.0) * 1e3
        if backend == "pallas":
            dt_x = _timeit(
                lambda i: gas_absorption_profile(
                    scene, f_grid + jnp.float32(i), backend="xla"
                )
            )
            extras["lbl_pallas_vs_xla"] = dt_x / dt_p
            # numeric check of the COMPILED kernel on real TPU (interpret
            # mode on CPU lives in tests/test_tpu_kernels.py; this guards
            # the Mosaic-compiled artifact itself)
            kp = np.asarray(gas_absorption_profile(scene, f_grid, backend=backend))
            kx = np.asarray(gas_absorption_profile(scene, f_grid, backend="xla"))
            scale = np.abs(kx).max()
            extras["lbl_pallas_vs_xla_maxdiff"] = float(
                np.abs(kp - kx).max() / scale
            )
    except Exception as e:  # extras must never kill the headline metric
        extras["lbl_error"] = str(e)[:120]
    try:  # on-chip numeric guard for the fused DISORT path: the headline
        # runs the three-kernel Mosaic artifact (fast_linalg=True on TPU);
        # compare its fluxes against the plain XLA solve
        if backend == "pallas":
            k_gas = gas_absorption_profile(scene, f_grid, backend=backend)
            f_fused = np.asarray(
                simulate_allsky(
                    scene, f_grid, nquad=16, nfourier=1, backend=backend,
                    fast_linalg=True, k_gas=k_gas,
                ).flux_up
            )
            f_xla = np.asarray(
                simulate_allsky(
                    scene, f_grid, nquad=16, nfourier=1, backend=backend,
                    fast_linalg=False, k_gas=k_gas,
                ).flux_up
            )
            extras["disort_fused_vs_xla_maxdiff"] = float(
                np.abs(f_fused - f_xla).max() / np.abs(f_xla).max()
            )
    except Exception as e:
        extras["disort_guard_error"] = str(e)[:160]
    try:  # LBL-only f64: subprocess with x64 enabled, XLA backend
        # (TPU f64 is emulated; Mosaic cannot compile under x64 mode)
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, __file__, "--f64-probe"],
            capture_output=True, text=True, timeout=2400,
            env={**os.environ, "JAX_ENABLE_X64": "1"},
        )
        lines_out = r.stdout.strip().splitlines()
        if not lines_out:
            raise RuntimeError(
                f"f64 probe rc={r.returncode}: {r.stderr.strip()[-200:]}"
            )
        vals = json.loads(lines_out[-1])
        extras["lbl_f64_pts_per_s"] = vals["lbl"]
        if "pipeline" in vals:
            extras["pipeline_f64_pts_per_s"] = vals["pipeline"]
        if "pipeline_shape" in vals:
            extras["pipeline_f64_shape"] = vals["pipeline_shape"]
        if "pipeline_error" in vals:
            extras["pipeline_f64_error"] = vals["pipeline_error"]
        extras["lbl_f64_backend"] = "xla"
    except Exception as e:
        extras["lbl_f64_error"] = str(e)[:200]
    try:  # Zeeman polarized propmat (auto g's from the .par quanta)
        from arts_tpu.io.hitran import zeeman_catalog_from_par
        from arts_tpu.lbl.zeeman import zeeman_propmat

        zcat = _cast_tree(
            zeeman_catalog_from_par(
                synth_par_rows(), ["H2O", "O2"], strength_option="A",
                cutoff=25e9,
            ),
            jnp.float32,
        )
        pts = scene.atm.at(scene.atm.z[::-1])
        zbackend = "pallas" if backend == "pallas" else "xla"
        zfun = jax.jit(
            jax.vmap(
                lambda t, p, v, m, za: zeeman_propmat(
                    f_grid, zcat, scene.pf, t, p, v, m, za, backend=zbackend
                ),
                in_axes=(0, 0, 0, None, None),
            )
        )
        mag = jnp.asarray([0.0, 3e-5, 3e-5], jnp.float32)
        dt_z = _timeit(
            lambda i: zfun(pts.t + jnp.float32(i) * 1e-6, pts.p, pts.vmr, mag, 180.0),
            iters=3,
        )
        extras["zeeman_pts_per_s"] = f_grid.shape[0] / dt_z
        if zbackend == "pallas":
            # on-chip guard for the polarized kernel (single point: the
            # XLA variant at full profile depth is prohibitively slow);
            # jitted — the axon eager path lacks some host ops
            import functools

            zp_one = jax.jit(
                functools.partial(zeeman_propmat, backend="pallas")
            )
            zx_one = jax.jit(
                functools.partial(zeeman_propmat, backend="xla")
            )
            pm_p = np.asarray(
                zp_one(
                    f_grid, zcat, scene.pf, pts.t[0], pts.p[0],
                    pts.vmr[0], mag, 180.0,
                )
            )
            pm_x = np.asarray(
                zx_one(
                    f_grid, zcat, scene.pf, pts.t[0], pts.p[0],
                    pts.vmr[0], mag, 180.0,
                )
            )
            extras["zeeman_pallas_vs_xla_maxdiff"] = float(
                np.abs(pm_p - pm_x).max() / np.abs(pm_x).max()
            )
    except Exception as e:
        extras["zeeman_error"] = str(e)[:120]

    print(
        json.dumps(
            {
                "metric": "spectral points/s/chip (LBL+DISORT allsky, "
                f"par-ingested H2O+O2 catalog: {scene.cat.n_lines} lines x "
                f"{f_grid.shape[0]} freqs x {scene.atm.z.shape[0]} levels, "
                "16 streams)",
                "value": pts_per_s,
                "catalog_mode": getattr(
                    build_scene, "catalog_mode", "synthetic-par"
                ),
                "unit": "points/s/chip",
                "vs_baseline": pts_per_s / BENCH_SELF_BASELINE,
                **extras,
            }
        )
    )


def f64_probe():
    """Subprocess entry: f64 points/s ON CHIP — LBL-only and the full
    LBL+DISORT pipeline (VERDICT r2 item 3).  Prints one JSON line."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from arts_tpu.fwd_allsky import gas_absorption_profile, simulate_allsky

    import jax.numpy as jnp

    scene, f_grid = build_scene()
    # xla_realpair: the TPU x64 rewriter cannot compile complex128 graphs
    # (CVT expansions + tuple-shape check failures), so f64-on-TPU runs
    # the complex-free formulation (identical math, tested equal on CPU)
    dt = _timeit(
        lambda i: gas_absorption_profile(
            scene, f_grid + jnp.float64(i), backend="xla_realpair"
        ),
        iters=3,
    )
    out = {"lbl": f_grid.shape[0] / dt}
    try:
        # full pipeline at f64: Mosaic kernels are rejected under x64
        # mode, so fast_linalg=True resolves to the pure-jnp fast path
        # (Jacobi eigh + unrolled solves + structured cyclic reduction).
        # The x64 rewriter cannot compile the CR graph at the full
        # 4096-freq extent (tpu_compile_helper exit 1), so the f64
        # pipeline is measured at 1024 freqs and labeled as such.
        fp = f_grid[::4]

        def run(i):
            fg = fp + jnp.float64(i)
            k_gas = gas_absorption_profile(scene, fg, backend="xla_realpair")
            return simulate_allsky(
                scene, fg, nquad=16, nfourier=1, backend="xla_realpair",
                fast_linalg=True, k_gas=k_gas,
            ).flux_up

        dt_pipe = _timeit(run, iters=2)
        out["pipeline"] = fp.shape[0] / dt_pipe
        out["pipeline_shape"] = f"{fp.shape[0]} freqs"
    except Exception as e:
        out["pipeline_error"] = str(e)[:160]
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if "--f64-probe" in sys.argv:
        f64_probe()
    else:
        main()
