"""On-chip measurement: the coarse-grid far-field LBL tier vs the
round-4 multipole/direct configuration, on the bench scene.

Times gas absorption for the full 60-level profile at the bench shape
(2048 lines x 4096 freqs) across kernel configurations, and records the
accuracy of each against the XLA reference path.  Run on the TPU:

    timeout 3600 python native/lbl_coarse_sweep.py

The adopted configuration (if any wins) goes into bench.py /
absorption_pallas defaults; a loss is recorded in NOTES_ROUND5.md with
these numbers (the round-4 protocol for measured rejections).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass
    import jax.numpy as jnp

    from arts_tpu.lbl.voigt import absorption_pallas, tune_lbl_kernel
    from bench import _median, _timeit_reps, build_scene

    scene, f_grid = build_scene()
    z = scene.atm.z[::-1]
    pts = scene.atm.at(z)
    cat, pf = scene.cat, scene.pf

    def profile_fn(**kw):
        @jax.jit
        def jrun(i):
            fg = f_grid + i

            def one(t, p, v):
                return absorption_pallas(fg, cat, pf, t, p, v, **kw)

            return jax.vmap(one)(pts.t, pts.p, pts.vmr)

        return lambda i: jrun(jnp.float32(i))

    # XLA reference for accuracy
    from arts_tpu.lbl.voigt import absorption

    def xla_ref():
        def one(t, p, v):
            return absorption(f_grid, cat, pf, t, p, v, block=256)

        return jax.vmap(one)(pts.t, pts.p, pts.vmr)

    kref = np.asarray(jax.jit(xla_ref)())
    scale = np.abs(kref).max()

    import sys as _sys

    if "--tiles" in _sys.argv:
        configs = [
            dict(tag="tf512-tl256 (default)", tf=512, tl=256),
            dict(tag="tf1024-tl256", tf=1024, tl=256),
            dict(tag="tf2048-tl256", tf=2048, tl=256),
            dict(tag="tf1024-tl512", tf=1024, tl=512),
            dict(tag="tf512-tl128", tf=512, tl=128),
            dict(tag="tf2048-tl128", tf=2048, tl=128),
        ]
    else:
        configs = [
            dict(tag="r4-default", tf=512, tl=256),
            dict(tag="c2-tl64-tf512", tf=512, tl=64, coarse=2),
            dict(tag="c2-tl64-tf1024", tf=1024, tl=64, coarse=2),
            dict(tag="c2-tl128-tf1024", tf=1024, tl=128, coarse=2),
            dict(tag="c4-tl64-tf512", tf=512, tl=64, coarse=4),
            dict(tag="c2-tl64-tf512-ns4", tf=512, tl=64, coarse=2, nsub=4),
            dict(tag="c2-tl32-tf1024", tf=1024, tl=32, coarse=2),
        ]
    results = []
    for cfg in configs:
        cfg = dict(cfg)
        tag = cfg.pop("tag")
        try:
            t0 = time.perf_counter()
            tune = tune_lbl_kernel(
                f_grid, cat, pf, np.asarray(pts.t), np.asarray(pts.p),
                np.asarray(pts.vmr),
                tf=cfg.get("tf", 512), tl=cfg.get("tl", 256),
                nsub=cfg.get("nsub", 1), coarse=cfg.get("coarse", 0),
            )
            t_tune = time.perf_counter() - t0
            run = profile_fn(**tune)
            reps = _timeit_reps(run, iters=3, reps=3)
            ms = _median(reps) * 1e3
            kp = np.asarray(run(0))
            err = float(np.abs(kp - kref).max() / scale)
            results.append(
                dict(tag=tag, ms=round(ms, 3),
                     rep_ms=[round(r * 1e3, 2) for r in reps],
                     maxrel=err, max_visits=tune["max_visits"],
                     tune_s=round(t_tune, 1))
            )
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:
            print(json.dumps(dict(tag=tag, error=str(e)[:200])), flush=True)
    print(json.dumps(dict(all=results)))


if __name__ == "__main__":
    main()
