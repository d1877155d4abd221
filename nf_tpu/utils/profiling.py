"""Profiling / tracing utilities.

Parity+: the reference only wall-clocks train steps (main.py:328-331).
TPU-native equivalents (SURVEY.md §5.1):
  * ``trace(dir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace of device execution;
  * ``StepTimer`` — wall-clock step timing with device sync on read;
  * ``roofline_estimate`` — analytic FLOPs/bytes for a jitted function via
    XLA cost analysis, reported against the chip's peak numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer; call mark() after block_until_ready."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def mark(self) -> float:
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)


# peak numbers for roofline context (f32 dense, HBM BW), per public specs
_CHIP_PEAKS = {
    "v5e": {"flops": 197e12 / 2, "hbm_gbps": 819.0},  # bf16 197 TF/s -> f32 half
    "v5p": {"flops": 459e12 / 2, "hbm_gbps": 2765.0},
}


def cost_analysis(fn, *args):
    """XLA cost analysis dict (flops, bytes accessed) for fn(*args)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return ca or {}


def roofline_estimate(fn, *args, chip: str = "v5e",
                      measured_seconds: Optional[float] = None) -> dict:
    """Report arithmetic intensity and (if measured) peak utilization."""
    ca = cost_analysis(fn, *args)
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    peaks = _CHIP_PEAKS.get(chip, _CHIP_PEAKS["v5e"])
    out = {
        "flops": flops,
        "bytes_accessed": bytes_,
        "arithmetic_intensity": flops / bytes_ if bytes_ else float("inf"),
        "ridge_intensity": peaks["flops"] / (peaks["hbm_gbps"] * 1e9),
    }
    if measured_seconds:
        out["achieved_flops_per_s"] = flops / measured_seconds
        out["pct_of_peak_flops"] = 100.0 * out["achieved_flops_per_s"] / peaks["flops"]
        out["achieved_gbps"] = bytes_ / measured_seconds / 1e9
        out["pct_of_peak_bw"] = 100.0 * out["achieved_gbps"] / peaks["hbm_gbps"]
    return out
