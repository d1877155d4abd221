"""Metric/observability writer: JSONL always, TensorBoard events if available.

Parity: the reference logs scalars and image panels to TensorBoard
(/root/reference/main.py:305, 342-346).  Host 0 writes; other processes
no-op.  The JSONL stream (metrics.jsonl) is the framework-neutral record;
TensorBoard event files are emitted too when torch.utils.tensorboard is
importable (torch is CPU-only in this image — only used for event writing).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np


class MetricWriter:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        self.is_host0 = jax.process_index() == 0
        self._jsonl = None
        self._tb = None
        if not self.is_host0:
            return
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        if not self.is_host0:
            return
        rec = {"t": time.time(), "step": step, "tag": tag, "value": float(value)}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def image(self, tag: str, hwc_uint8: np.ndarray, step: int):
        if not self.is_host0:
            return
        if self._tb is not None:
            self._tb.add_image(tag, hwc_uint8, step, dataformats="HWC")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
