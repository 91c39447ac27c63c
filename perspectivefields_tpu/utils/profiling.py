"""Tracing / profiling / NaN-guard utilities.

The reference has no observability at all (SURVEY.md section 5 — its NaN
handling is pdb.set_trace on NaN loss, gravity_head.py:220-223). This module
provides the TPU-native equivalents:

* ``trace(name)`` — jax.profiler TraceAnnotation context (shows up in
  TensorBoard/XProf device traces).
* ``profile_to(dir)`` — capture a full device trace around a block.
* ``StageTimer`` — lightweight host-side per-stage wall timers with an
  images/sec summary (serving observability).
* ``guard_nans(fn)`` — jax.experimental.checkify wrapper that turns silent
  device NaNs into raised host errors (debug builds only; adds overhead).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


def trace(name: str):
    """Named annotation visible in device profiles."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time per named stage; .summary() gives totals and
    optional throughput."""

    def __init__(self):
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += items

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, secs in self._acc.items():
            entry = {"seconds": round(secs, 4)}
            if self._count[name]:
                entry["items_per_sec"] = round(self._count[name] / secs, 2)
            out[name] = entry
        return out


def guard_nans(fn):
    """Wrap a jit-able fn so NaN/Inf production raises on the host.

    Usage: guarded = guard_nans(model.apply); out = guarded(params, x)
    """
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
