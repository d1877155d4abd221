"""Multi-host launcher: ``python -m nf_tpu.parallel.launch main.py <overrides>``.

Initializes the JAX process group (auto-detected on Cloud TPU pods, or via
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), then executes
the target script in this process.  One such process runs per host.
"""
from __future__ import annotations

import os
import runpy
import sys

from .distributed import init_distributed


def main():
    if len(sys.argv) < 2:
        print("usage: python -m nf_tpu.parallel.launch <script.py> [args...]",
              file=sys.stderr)
        raise SystemExit(2)
    # honor an explicit JAX_PLATFORMS even where a sitecustomize pre-forced
    # a platform via jax.config (env alone is ignored once config is set) —
    # the launcher must come up on the operator's chosen backend BEFORE the
    # process group forms
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    init_distributed()
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
