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


def _acc(a: dict, b: dict, mult: float = 1.0):
    a["flops"] += mult * b.get("flops", 0.0)
    a["bytes_accessed"] += mult * b.get("bytes_accessed",
                                        b.get("bytes accessed", 0.0))


def bijector_cost(bij, var, x, ctx, method: str = "forward") -> tuple:
    """Scan-aware analytic cost of ``bij.<method>``: (cost_dict, y).

    XLA's ``cost_analysis`` counts a ``lax.scan``/while body ONCE, not
    multiplied by its trip count — which understated the committed image
    rooflines by ~the coupling count (round-4 BENCH_DETAIL reported the
    161-coupling glow-img32x3 train step at 0.16% of peak; the true
    figure is ~50x higher).  This walker descends Chain/ScannedChain
    structure, costs each distinct block once, and multiplies scanned
    blocks by their repeat count.  Runs the transform eagerly to thread
    real intermediate shapes.
    """
    import jax as _jax
    from ..core.bijector import Chain, ScannedChain

    total = {"flops": 0.0, "bytes_accessed": 0.0}
    if isinstance(bij, Chain):
        order = (range(len(bij.layers)) if method == "forward"
                 else reversed(range(len(bij.layers))))
        for i in order:
            sub = Chain._sub(var, i)
            c, x = bijector_cost(bij.layers[i], sub, x, ctx.child(i), method)
            _acc(total, c)
        return total, x
    if isinstance(bij, ScannedChain):
        # all blocks share shapes; cost block 0 once and scale
        sub0 = _jax.tree_util.tree_map(lambda a: a[0], var)
        c, _ = bijector_cost(bij.blocks[0], sub0, x, ctx.child(0), method)
        _acc(total, c, mult=bij.n)
        y, _, _ = getattr(bij, method)(var, x, ctx)
        return total, y
    ca = cost_analysis(
        lambda v, xx: getattr(bij, method)(v, xx, ctx)[:2], var, x)
    _acc(total, ca)
    y, _, _ = getattr(bij, method)(var, x, ctx)
    return total, y


def model_flops(model, var, x, ctx, method: str = "forward") -> dict:
    """Scan-aware cost of a FlowModel pass (see ``bijector_cost``)."""
    cost, _ = bijector_cost(model.bijector, var, x, ctx, method)
    return cost


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
