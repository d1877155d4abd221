"""Persistent XLA compilation cache setup (one call, idempotent).

Deep image stacks cost minutes of XLA compile; the persistent cache makes
every process after the first load them in seconds.  main.py and bench.py
always enabled this, but the standalone scripts did not — which is how the
round-3 vardequant A/B re-paid the full flow++ image compile (plus the
double-compile fixed in train/trainer.py init_state) on every config and
concluded "16x16 takes >25 min of XLA compile".
"""
from __future__ import annotations

import os


def enable_persistent_compile_cache(
        path: str = "~/.cache/jax_comp_cache") -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # config name drift across jax versions
        pass
