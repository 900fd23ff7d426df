"""Tracing/profiling helpers.

Parity reference: /root/reference/src/core/artstime/time_report.h — the
RAII `arts::profiler` stamping per-scope per-thread timings behind
ARTS_PROFILING, retrieved via get_report/print_report.

TPU-native: jax.profiler traces (viewable in TensorBoard/XProf) plus a
lightweight wall-clock scope report in the same spirit as the
reference's TimeReport, and a throughput meter for the driver metric
(spectral points/s).
"""

import collections
import contextlib
import time

import jax


_REPORT = collections.defaultdict(list)


@contextlib.contextmanager
def scope(name: str):
    """Named profiling scope: wall-clock recorded + jax.named_scope for
    device traces. (ARTS_TIME_REPORT parity.)"""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    _REPORT[name].append(time.perf_counter() - t0)


def get_report():
    """{scope: (count, total_s, mean_s)} — time_report.h:29 parity."""
    return {
        k: (len(v), sum(v), sum(v) / len(v)) for k, v in _REPORT.items()
    }


def print_report():
    for k, (n, tot, mean) in sorted(get_report().items()):
        print(f"{k:40s} n={n:6d} total={tot:9.3f}s mean={mean*1e3:9.3f}ms")


def clear_report():
    _REPORT.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Full device trace (jax.profiler) for XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Spectral-points-per-second meter (the driver metric)."""

    def __init__(self):
        self.points = 0
        self.t0 = time.perf_counter()

    def add(self, n_points: int):
        self.points += n_points

    @property
    def rate(self):
        dt = time.perf_counter() - self.t0
        return self.points / dt if dt > 0 else 0.0

def measured_sweep(
    fn, f_grid, chunk: int, log=None, meter: ThroughputMeter | None = None
):
    """Run a frequency sweep in chunks with the points/s meter wired in.

    fn(f_chunk) -> pytree of arrays with leading frequency axis; results
    are concatenated on axis 0.  After each chunk the meter advances by
    the chunk size and, if ``log`` is given (e.g. ``print`` or a
    logger.info), emits a structured progress line — the spectral-points/s
    observability the reference lacks (its OEM prints iteration progress
    only, m_oem.cc:185-190).  Returns (result, meter).
    """
    import jax.numpy as jnp

    meter = meter or ThroughputMeter()
    n = f_grid.shape[0]
    outs = []
    for i0 in range(0, n, chunk):
        fc = f_grid[i0 : i0 + chunk]
        with scope("sweep_chunk"):
            out = fn(fc)
            for leaf in jax.tree_util.tree_leaves(out):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        outs.append(out)
        meter.add(fc.shape[0])
        if log is not None:
            log(
                f"sweep {min(i0 + chunk, n)}/{n} freqs "
                f"({meter.rate:.1f} points/s)"
            )
    res = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs
    )
    return res, meter
