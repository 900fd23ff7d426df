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


def lbl_roofline(scene, f_grid, lbl_seconds):
    """Roofline accounting for the LBL stage (VERDICT r3 item 1).

    Counts, per level, the (line, freq) pairs the kernel actually
    computes — visited (tile, block) pairs at the kernel's tiling, with
    the per-block tier choice (deep/asym/mid/weideman flops per pair) —
    plus the in-window pair count, against the analytic VPU f32 peak.
    Extras dict for the bench line.
    """
    import jax
    import jax.numpy as jnp

    from arts_tpu.lbl.voigt import lineshape_params, line_strengths

    pts = scene.atm.at(scene.atm.z[::-1])
    T = np.asarray(pts.t)
    P = np.asarray(pts.p)
    V = np.asarray(pts.vmr)
    cat = jax.tree_util.tree_map(np.asarray, scene.cat)
    pf = jax.tree_util.tree_map(np.asarray, scene.pf)
    fg = np.asarray(f_grid)
    anchor = fg.mean()
    tf, tl = 512, 256  # absorption_pallas defaults at this shape
    F, L = fg.shape[0], cat.f0.shape[0]
    nf, nl = -(-F // tf), -(-L // tl)
    ftile = np.pad(fg - anchor, (0, nf * tf - F), constant_values=fg[-1])
    t_lo = ftile.reshape(nf, tf)[:, 0]
    t_hi = ftile.reshape(nf, tf)[:, -1]
    # flops/pair per tier incl. load + accumulate (ops/voigt_kernel.py)
    FL_DEEP, FL_ASYM, FL_MID, FL_WEI = 22.0, 50.0, 75.0, 170.0
    inwin = 0
    visited = 0
    gflop = 0.0
    with jax.default_device(jax.devices("cpu")[0]):
        for z in range(T.shape[0]):
            ls = lineshape_params(cat, T[z], P[z], V[z])
            _, f0s, igd, zi = line_strengths(cat, pf, T[z], P[z], V[z], ls)
            f0s = np.asarray(f0s) - anchor
            igd = np.asarray(igd)
            zi = np.asarray(zi)
            cut = np.where(np.isfinite(cat.cutoff), cat.cutoff, 1e30)
            lo = np.searchsorted(fg - anchor, f0s - cut)
            hi = np.searchsorted(fg - anchor, f0s + cut)
            inwin += int((hi - lo).sum())
            pad = nl * tl - L
            f0p = np.pad(f0s, (0, pad))
            igdp = np.pad(igd, (0, pad))
            zip_ = np.pad(zi, (0, pad), constant_values=1.0)
            cutp = np.pad(cut, (0, pad), constant_values=-1.0)
            blk = lambda x: x.reshape(nl, tl)
            win_lo = blk(f0p - cutp).min(1)
            win_hi = blk(f0p + cutp).max(1)
            f0min, f0max = blk(f0p).min(1), blk(f0p).max(1)
            igdmin, zimin = blk(igdp).min(1), blk(zip_).min(1)
            visit = (win_hi[None, :] >= t_lo[:, None]) & (
                win_lo[None, :] <= t_hi[:, None]
            )
            gap = np.maximum(
                np.maximum(f0min[None, :] - t_hi[:, None],
                           t_lo[:, None] - f0max[None, :]), 0.0,
            )
            b2 = (igdmin[None, :] * gap) ** 2 + (zimin**2)[None, :]
            fl = np.where(
                b2 > 2e6, FL_DEEP,
                np.where(b2 > 1024.0, FL_ASYM,
                         np.where(b2 > 72.0, FL_MID, FL_WEI)),
            )
            visited += int(visit.sum()) * tl * tf
            gflop += float((visit * fl).sum()) * tl * tf / 1e9

    # VPU f32 peak: analytic — 8 sublanes x 128 lanes x 2 (FMA) x 2
    # VPU issue = 2048 FLOP/cycle at the ~0.94 GHz TensorCore clock
    # -> 1.93 TFLOP/s.  A VMEM-resident unrolled-FMA pallas probe
    # measured 2.18 TFLOP/s in a quiet session (consistent with the
    # analytic figure + clock boost), but the axon tunnel's execution
    # caching and async completion make the micro-probe unreliable when
    # run inside the bench, so the analytic figure is recorded.
    peak = 1.93
    achieved = gflop / 1e3 / lbl_seconds
    return {
        "lbl_inwindow_pairs": inwin,
        "lbl_visited_pairs": visited,
        "lbl_direct_gflop_est": round(gflop, 2),
        "lbl_achieved_tflops": round(achieved, 3),
        "vpu_peak_tflops_analytic": round(peak, 3),
        "lbl_roofline_frac": round(achieved / peak, 3),
    }


def _timeit_reps(fn, iters=5, reps=3):
    """Per-repetition mean times [s] of fn(i) over `reps` repetitions of
    `iters` pipelined iterations each (one warmup first).

    fn MUST vary its device inputs with i: the axon remote-execution
    tunnel deduplicates bit-identical pure executions (measured 53 us vs
    118 ms per iteration for the same jitted matmul chain), so timing a
    loop of identical calls measures RPC caching, not the TPU.

    Within a repetition the iters dispatches pipeline (block once at the
    end) so steady-state throughput is measured, not per-call tunnel
    latency; repeating gives the variance record VERDICT r4 asked for
    (a 14% headline swing could not be attributed without a re-run).
    """
    jax_block(fn(0))
    means = []
    j = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(j)
            j += 1
        jax_block(out)
        means.append((time.perf_counter() - t0) / iters)
    return means


def _median(ts):
    s = sorted(ts)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _timeit(fn, iters=5, reps=3):
    """Median repetition-mean time of fn(i) (robust to tunnel hiccups)."""
    return _median(_timeit_reps(fn, iters, reps))


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

    # anti-dedup nonce grids are prepared OUTSIDE the timed region: the
    # i-Hz shift (<1e-11 relative) exists only to defeat the tunnel's
    # execution cache, and as an eager op inside the loop it is its own
    # tunnel dispatch charged to the pipeline
    # disjoint nonce slices per timed section: replaying the SAME
    # (executable, input) pair a later section already executed would
    # re-expose the tunnel's execution dedup (53 us vs 118 ms)
    fgs_all = [f_grid + jnp.float32(i) for i in range(56)]
    jax_block(fgs_all)
    fgs = fgs_all[:20]
    fgs_lbl = fgs_all[20:40]
    fgs_x = fgs_all[40:]

    def run(i):
        # two jits: absorption and the DISORT solve compile independently
        # (the fused whole-pipeline compile is pathologically slow on the
        # remote-compile path)
        fg = fgs[i % len(fgs)]
        k_gas = gas_absorption_profile(scene, fg, backend=backend)
        out = simulate_allsky(
            scene, fg, nquad=16, nfourier=1, backend=backend,
            fast_linalg=True, k_gas=k_gas,
        )
        return out.flux_up

    head_reps = _timeit_reps(run)
    dt = _median(head_reps)
    pts_per_s = f_grid.shape[0] / dt

    extras = {"headline_rep_ms": [round(r * 1e3, 3) for r in head_reps]}
    try:  # LBL-only f32, both backends (kernel speedup ratio)
        lbl_reps = _timeit_reps(
            lambda i: gas_absorption_profile(
                scene, fgs_lbl[i % len(fgs_lbl)], backend=backend
            )
        )
        dt_p = _median(lbl_reps)
        extras["lbl_pts_per_s"] = f_grid.shape[0] / dt_p
        extras["lbl_stage_ms"] = dt_p * 1e3
        extras["lbl_rep_ms"] = [round(r * 1e3, 3) for r in lbl_reps]
        # DISORT stage timed DIRECTLY (precomputed k_gas, nonce-scaled
        # per iteration so the tunnel cannot dedup) — not as the
        # difference of two separately-timed runs (VERDICT r4 weak #1).
        # The nonce multiply lives INSIDE the jit (an eager op is its
        # own ~6 ms tunnel dispatch), and FOUR solves run per dispatch:
        # a single ~4 ms executable per iteration is dispatch-latency
        # bound under the tunnel (measured 9.8 ms/iter), while the
        # headline loop hides that latency behind its longer pipeline.
        k_gas0 = gas_absorption_profile(scene, f_grid, backend=backend)
        _DIS_BATCH = 4

        @jax.jit
        def dis_run(k0, i):
            acc = 0.0
            for j in range(_DIS_BATCH):
                acc = acc + simulate_allsky(
                    scene, f_grid, nquad=16, nfourier=1, backend=backend,
                    fast_linalg=True,
                    k_gas=k0 * (1.0 + (_DIS_BATCH * i + j) * 1e-7),
                ).flux_up
            return acc

        dis_reps = [
            r / _DIS_BATCH
            for r in _timeit_reps(lambda i: dis_run(k_gas0, jnp.float32(i)))
        ]
        extras["disort_stage_ms"] = _median(dis_reps) * 1e3
        extras["disort_rep_ms"] = [round(r * 1e3, 3) for r in dis_reps]
        # cross-check: directly-timed stages vs the headline wall time
        extras["stage_sum_ms"] = round(
            extras["lbl_stage_ms"] + extras["disort_stage_ms"], 3
        )
        if backend == "pallas":
            dt_x = _timeit(
                lambda i: gas_absorption_profile(
                    scene, fgs_x[i % len(fgs_x)], backend="xla"
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
    try:  # roofline record for the LBL stage (VERDICT r3 item 1)
        if backend == "pallas" and "lbl_stage_ms" in extras:
            extras.update(
                lbl_roofline(scene, f_grid, extras["lbl_stage_ms"] / 1e3)
            )
    except Exception as e:
        extras["roofline_error"] = str(e)[:160]
    try:  # on-chip numeric guard for the fused DISORT path: the headline
        # runs the three-kernel Mosaic artifact (fast_linalg=True on TPU);
        # compare fluxes AND the radiance field u0 (observers consume it,
        # VERDICT r3 item 7) against the CPU LAPACK solve on a frequency
        # subset — NOT the on-chip XLA path, whose f32 eigh custom call
        # is itself unreliable for radiances (u0 errors up to several
        # 100% measured on heterogeneous layers)
        if backend == "pallas":
            fsub = f_grid[:: max(1, f_grid.shape[0] // 256)]
            k_gas = gas_absorption_profile(scene, fsub, backend=backend)
            o_fused = simulate_allsky(
                scene, fsub, nquad=16, nfourier=1, backend=backend,
                fast_linalg=True, k_gas=k_gas,
            )
            cpu = jax.devices("cpu")[0]
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, cpu)
                if hasattr(x, "dtype") else x, t
            )
            o_cpu = simulate_allsky(
                put(scene), jax.device_put(fsub, cpu), nquad=16,
                nfourier=1, backend="xla", fast_linalg=False,
                k_gas=jax.device_put(k_gas, cpu),
            )
            rel = lambda a, b: float(
                np.abs(np.asarray(a) - np.asarray(b)).max()
                / np.abs(np.asarray(b)).max()
            )
            extras["disort_fused_vs_cpu_maxdiff"] = rel(
                o_fused.flux_up, o_cpu.flux_up
            )
            extras["disort_fused_vs_cpu_u0_maxdiff"] = rel(
                o_fused.u0, o_cpu.u0
            )
    except Exception as e:
        extras["disort_guard_error"] = str(e)[:160]
    # f64 probes: subprocesses with x64 enabled, XLA backend (TPU f64 is
    # emulated; Mosaic cannot compile under x64 mode).  Three INDEPENDENT
    # capped stages, each merging its own partial JSON — a wedged
    # tunnel-side x64 compile in one stage costs that stage's keys only,
    # not the whole f64 record (VERDICT r4 weak #2: the monolithic probe
    # timed out and lost everything).  Caps env-overridable via
    # BENCH_F64_TIMEOUT (all) or BENCH_F64_TIMEOUT_<STAGE>.
    import subprocess
    import sys

    base_cap = int(os.environ.get("BENCH_F64_TIMEOUT", "900"))
    for stage, keymap in (
        ("lbl", {"lbl": "lbl_f64_pts_per_s"}),
        ("pipeline", {
            "pipeline": "pipeline_f64_pts_per_s",
            "pipeline_shape": "pipeline_f64_shape",
            "pipeline_error": "pipeline_f64_error",
        }),
        ("guard", {
            "pipeline_f64_vs_cpu_maxdiff": "pipeline_f64_vs_cpu_maxdiff",
            "f64_guard_error": "f64_guard_error",
        }),
    ):
        try:
            cap = int(
                os.environ.get(f"BENCH_F64_TIMEOUT_{stage.upper()}", base_cap)
            )
            r = subprocess.run(
                [sys.executable, __file__, f"--f64-probe={stage}"],
                capture_output=True, text=True, timeout=cap,
                env={**os.environ, "JAX_ENABLE_X64": "1"},
            )
            lines_out = r.stdout.strip().splitlines()
            if not lines_out:
                raise RuntimeError(
                    f"f64 {stage} rc={r.returncode}: {r.stderr.strip()[-200:]}"
                )
            vals = json.loads(lines_out[-1])
            for src, dst in keymap.items():
                if src in vals:
                    extras[dst] = vals[src]
        except Exception as e:
            extras[f"f64_{stage}_error"] = str(e)[:200]
    if "lbl_f64_pts_per_s" in extras:
        extras["lbl_f64_backend"] = "xla"
    try:  # Zeeman polarized propmat (auto g's from the .par quanta) via
        # the parent-pole multipole path (ops/zeeman_mp_kernel.py)
        import functools

        from arts_tpu.io.hitran import zeeman_catalog_from_par
        from arts_tpu.lbl.zeeman import (
            pad_zeeman_catalog,
            tune_zeeman_profile,
            zeeman_propmat,
            zeeman_propmat_profile,
        )

        zcat = _cast_tree(
            zeeman_catalog_from_par(
                synth_par_rows(), ["H2O", "O2"], strength_option="A",
                cutoff=25e9,
            ),
            jnp.float32,
        )
        pts = scene.atm.at(scene.atm.z[::-1])
        mag = jnp.asarray([0.0, 3e-5, 3e-5], jnp.float32)
        pzcat = pad_zeeman_catalog(zcat)
        ztune = tune_zeeman_profile(f_grid, pzcat)
        zp = functools.partial(zeeman_propmat_profile, **ztune)
        ts = [pts.t + jnp.float32(i) * 1e-6 for i in range(16)]
        jax_block(ts)
        dt_z = _timeit(
            lambda i: zp(
                f_grid, pzcat, scene.pf, ts[i % len(ts)],
                pts.p, pts.vmr, mag, 180.0,
            ),
            iters=3,
        )
        extras["zeeman_pts_per_s"] = f_grid.shape[0] / dt_z
        if backend == "pallas":
            # on-chip guard for the compiled parent-pole kernel vs the
            # per-pseudo-line XLA path, at a narrow-line (top) and a
            # pressure-broadened (bottom) point
            zx_one = jax.jit(
                functools.partial(zeeman_propmat, backend="xla")
            )
            g = 0.0
            for zi_ in (0, -1):
                sl = slice(zi_, zi_ + 1) if zi_ == 0 else slice(-1, None)
                pm_p = np.asarray(
                    zp(
                        f_grid, pzcat, scene.pf, pts.t[sl], pts.p[sl],
                        pts.vmr[sl], mag, 180.0,
                    )
                )[0]
                pm_x = np.asarray(
                    zx_one(
                        f_grid, zcat, scene.pf, pts.t[zi_], pts.p[zi_],
                        pts.vmr[zi_], mag, 180.0,
                    )
                )
                g = max(g, float(np.abs(pm_p - pm_x).max() / np.abs(pm_x).max()))
            extras["zeeman_pallas_vs_xla_maxdiff"] = g
    except Exception as e:
        extras["zeeman_error"] = str(e)[:120]

    try:  # measurement pipeline at scale (VERDICT r4 item 6): y and
        # y+dy for a realistic sensor batch through dedup + level-cached
        # observer + channel contraction — the framework's actual job
        # (reference HighPerf kernel, m_rad.cc:380-467) — plus one
        # Gauss-Newton iteration of the standard T-retrieval OEM case
        import dataclasses

        from arts_tpu.fwd import ClearskyScene
        from arts_tpu.path import geometric_path_1d
        from arts_tpu.sensor import gaussian_channels
        from arts_tpu.sensor.measurement import (
            Obsel,
            measurement_vector_from_obsels,
        )
        from arts_tpu.sensor.observers import clearsky_observer_cached

        csc = ClearskyScene(
            atm=scene.atm, cat=scene.cat, pf=scene.pf,
            surface_temperature=scene.surface_temperature,
        )
        G = 64
        paths = [
            geometric_path_1d(100e3, 180.0 - 40.0 * g / G, 0.0, 80e3, 2500.0)
            for g in range(G)
        ]
        fgeo = f_grid
        centers = np.linspace(165e9, 255e9, 32)
        sensor = gaussian_channels(
            np.asarray(fgeo), centers=np.tile(centers, G), fwhm=2e9,
            geo_idx=np.repeat(np.arange(G), centers.size),
        )
        obs = clearsky_observer_cached(
            backend=("pallas" if backend == "pallas" else "xla")
        )
        obsels = [
            Obsel(sensor=sensor, f_grid=fgeo, paths=tuple(paths),
                  background="surface", observer=obs),
        ]
        atm0 = csc.atm
        atms = [
            dataclasses.replace(atm0, t=atm0.t + i * 1e-6)
            for i in range(16)
        ]
        jax_block(atms)

        # one jitted dispatch per y evaluation (the host-side dedup runs
        # at trace time): both faster and production-representative —
        # un-jitted, the pipeline's several dispatches are each charged
        # the tunnel's per-dispatch latency
        y_jit = jax.jit(
            lambda a: measurement_vector_from_obsels(
                dataclasses.replace(csc, atm=a), obsels
            )[0]
        )

        def y_of(i):
            return y_jit(atms[i % len(atms)])

        y_reps = _timeit_reps(y_of, iters=3, reps=3)
        dt_y = _median(y_reps)
        extras["measurement_geofreq_per_s"] = G * fgeo.shape[0] / dt_y
        extras["measurement_y_ms"] = round(dt_y * 1e3, 3)
        extras["measurement_rep_ms"] = [round(r * 1e3, 3) for r in y_reps]
        extras["measurement_shape"] = (
            f"{G} geometries x {fgeo.shape[0]} freqs x "
            f"{centers.size} channels/geo"
        )

        # y + dy/dx for a 2-parameter state (T offset, log-H2O scale):
        # forward-mode through the full dedup+observer+contraction chain.
        # Derivatives ride the XLA LBL path (the Pallas kernel has no
        # JVP rule — inference-only by design); y-only above keeps the
        # Pallas kernel
        obs_ad = clearsky_observer_cached(backend="xla")
        obsels_ad = [
            Obsel(sensor=sensor, f_grid=fgeo, paths=tuple(paths),
                  background="surface", observer=obs_ad),
        ]

        def fy(x):
            atm2 = dataclasses.replace(
                atm0, t=atm0.t + x[0],
                vmr=atm0.vmr * jnp.exp(x[1]),
            )
            sc = dataclasses.replace(csc, atm=atm2)
            return measurement_vector_from_obsels(sc, obsels_ad)[0]

        ydy = jax.jit(lambda x: (fy(x), jax.jacfwd(fy)(x)))
        dt_ydy = _timeit(
            lambda i: ydy(jnp.asarray([i * 1e-6, 0.0], f_grid.dtype)),
            iters=2, reps=2,
        )
        extras["measurement_ydy_ms"] = round(dt_ydy * 1e3, 3)

        # one GN iteration of the standard OEM case (T-profile retrieval,
        # tests/test_oem.py methodology) at a reduced shape
        f_oem = f_grid[::4]
        G_o = 16
        paths_o = tuple(paths[:G_o])
        cen_o = np.linspace(165e9, 255e9, 8)
        sens_o = gaussian_channels(
            np.asarray(f_oem), centers=np.tile(cen_o, G_o), fwhm=2e9,
            geo_idx=np.repeat(np.arange(G_o), cen_o.size),
        )
        obsels_o = [
            Obsel(sensor=sens_o, f_grid=f_oem, paths=paths_o,
                  background="surface", observer=obs_ad),
        ]

        def fwd_oem(x):  # x: per-level T offsets
            sc = dataclasses.replace(
                csc, atm=dataclasses.replace(atm0, t=atm0.t + x)
            )
            return measurement_vector_from_obsels(sc, obsels_o)[0]

        nz = atm0.t.shape[0]
        y_obs = fwd_oem(jnp.zeros(nz, f_grid.dtype))
        se_inv = jnp.full(y_obs.shape, 1.0 / (1e-3 * float(y_obs.max())) ** 2)
        sa_inv = jnp.full((nz,), 1.0 / 4.0)

        def gn_iter(x):
            Kj = jax.jacfwd(fwd_oem)(x)
            yv = fwd_oem(x)
            g = Kj.T @ (se_inv * (y_obs - yv)) - sa_inv * x
            H = (Kj.T * se_inv[None, :]) @ Kj + jnp.diag(sa_inv)
            return x + jnp.linalg.solve(H, g)

        gn = jax.jit(gn_iter)
        dt_gn = _timeit(
            lambda i: gn(jnp.full((nz,), i * 1e-6, f_grid.dtype)),
            iters=2, reps=2,
        )
        extras["oem_gn_iter_ms"] = round(dt_gn * 1e3, 3)
        extras["oem_gn_shape"] = (
            f"{nz} T states, {G_o} geometries x {f_oem.shape[0]} freqs x "
            f"{cen_o.size} channels/geo"
        )
    except Exception as e:
        extras["measurement_error"] = str(e)[:200]

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


def f64_probe(stage="all"):
    """Subprocess entry: f64 points/s ON CHIP — LBL-only, the full
    LBL+DISORT pipeline, and the vs-CPU guard (VERDICT r2 item 3), each
    independently invocable (`--f64-probe=lbl|pipeline|guard`) so one
    wedged tunnel-side x64 compile cannot take the others down.
    Prints one JSON line."""
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
    out = {}
    # xla_realpair: the TPU x64 rewriter cannot compile complex128 graphs
    # (CVT expansions + tuple-shape check failures), so f64-on-TPU runs
    # the complex-free formulation (identical math, tested equal on CPU)
    if stage in ("all", "lbl"):
        dt = _timeit(
            lambda i: gas_absorption_profile(
                scene, f_grid + jnp.float64(i), backend="xla_realpair"
            ),
            iters=3, reps=2,
        )
        out["lbl"] = f_grid.shape[0] / dt
    if stage in ("all", "pipeline"):
        try:
            # full pipeline at f64: Mosaic kernels are rejected under x64
            # mode, so fast_linalg=True resolves to the pure-jnp fast
            # path (Jacobi eigh + unrolled solves + structured cyclic
            # reduction).  The x64 rewriter cannot compile the CR graph
            # at the full 4096-freq extent in ONE program
            # (tpu_compile_helper exit 1) — but each 1024-freq chunk
            # compiles, so the FULL headline shape runs as 4 chunked
            # solves + concatenation (VERDICT r3 item 3).
            nchunk = 4
            fchunks = jnp.split(f_grid, nchunk)

            def run(i):
                fl = []
                for fc in fchunks:
                    fg = fc + jnp.float64(i)
                    k_gas = gas_absorption_profile(
                        scene, fg, backend="xla_realpair"
                    )
                    fl.append(
                        simulate_allsky(
                            scene, fg, nquad=16, nfourier=1,
                            backend="xla_realpair", fast_linalg=True,
                            k_gas=k_gas,
                        ).flux_up
                    )
                return jnp.concatenate(fl, axis=0)

            dt_pipe = _timeit(run, iters=2, reps=2)
            out["pipeline"] = f_grid.shape[0] / dt_pipe
            out["pipeline_shape"] = (
                f"{f_grid.shape[0]} freqs (4 x 1024 chunks)"
            )
        except Exception as e:
            out["pipeline_error"] = str(e)[:160]
    if stage in ("all", "guard"):
        try:
            # f64 correctness guard: TPU-f64 (emulated, fast-path linalg)
            # fluxes vs CPU-f64 LAPACK truth on a reduced shape (VERDICT
            # r3 item 3).  device_put pins each evaluation's placement;
            # the CPU side uses fast_linalg=False because (a) LAPACK is
            # the ground truth and (b) the unrolled x64 fast-path graph
            # takes >40 min to compile on CPU.
            fsub = f_grid[:: len(f_grid) // 256]

            def flux(dev, fast):
                put = lambda t: jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, dev)
                    if hasattr(x, "dtype") else x, t
                )
                sc = put(scene)
                fs = jax.device_put(fsub, dev)
                k_gas = gas_absorption_profile(
                    sc, fs, backend="xla_realpair"
                )
                return np.asarray(
                    simulate_allsky(
                        sc, fs, nquad=16, nfourier=1,
                        backend="xla_realpair", fast_linalg=fast,
                        k_gas=k_gas,
                    ).flux_up
                )

            f_tpu = flux(jax.devices()[0], True)
            f_cpu = flux(jax.devices("cpu")[0], False)
            out["pipeline_f64_vs_cpu_maxdiff"] = float(
                np.abs(f_tpu - f_cpu).max() / np.abs(f_cpu).max()
            )
        except Exception as e:
            out["f64_guard_error"] = str(e)[:160]
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    probe = [a for a in sys.argv if a.startswith("--f64-probe")]
    if probe:
        arg = probe[0].partition("=")[2]
        f64_probe(arg or "all")
    else:
        main()
