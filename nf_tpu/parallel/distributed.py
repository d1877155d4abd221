"""Multi-host launch support.

The reference has no distributed story (SURVEY.md §2.4/§5.8); this is the
TPU-native equivalent: ``jax.distributed.initialize`` process-group setup,
per-host PRNG streams, and host-0 gating for writes.

Launch pattern (one process per host, e.g. on a TPU pod slice):

    python -m nf_tpu.parallel.launch main.py network=glow ...

or call ``init_distributed()`` at the top of a custom entry point.  On a
single host everything degrades to a no-op.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX process group when running multi-host.

    With no arguments, relies on the TPU environment's auto-detection
    (standard on Cloud TPU pods); explicit args support manual clusters.
    Safe to call on a single host: initialization is skipped when no
    coordinator is configured and auto-detection finds one process.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit:
        return
    # do NOT probe jax.process_count() here: it initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run —
    # the launcher would always crash.  Check the distributed client
    # directly instead (None until initialize has run).
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # process group already formed
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id
        or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def host_key(base_key: jax.Array) -> jax.Array:
    """Fold the process index into a PRNG key -> deterministic per-host
    stream (SURVEY.md §5.8: per-host data/eval sampling)."""
    return jax.random.fold_in(base_key, jax.process_index())


def is_host0() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "nf_tpu_barrier") -> None:
    """Cross-host sync point (e.g. before checkpoint reads)."""
    if jax.process_count() > 1:
        # tiny all-reduce doubles as a barrier without extra deps
        x = jax.numpy.ones(())
        jax.block_until_ready(
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
                x[None]))
