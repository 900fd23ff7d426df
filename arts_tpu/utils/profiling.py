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
