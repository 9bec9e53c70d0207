"""Tracing / profiling hooks (SURVEY §5).

The reference has none (only throttled loss prints).  TPU-natively:
`jax.profiler` traces (viewable in TensorBoard / Perfetto), per-phase wall
timers, and NaN debugging toggles (`jax_debug_nans`; `checkify` for residual
kernels is available through `checkify_residual`)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block (Perfetto/TB)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timers for named phases of a training run."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k]}
                for k, v in self.totals.items()}


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on NaN in any jitted computation (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def checkify_residual(fn):
    """Wrap a residual function with checkify NaN/div checks.

    Returns (checked_fn); call as err, out = checked_fn(...) and
    `err.throw()` to surface failures."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)
