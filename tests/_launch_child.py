"""Child script for the launcher-driven two-process test.

Run VIA the launcher:

    JAX_COORDINATOR_ADDRESS=... JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=<pid> \
        python -m nf_tpu.parallel.launch tests/_launch_child.py

Unlike tests/_distinit_child.py this script does NOT initialize the
process group itself — if ``jax.process_count() == 2`` holds here, the
launcher's ``init_distributed()`` env path did it.  Prints a post-
``init_state`` parameter digest that must match across ranks (host-0
broadcast), proving a real training entry point works under the launcher.
"""
import os
import sys

import jax

assert jax.process_count() == 2, (
    f"launcher did not form the process group: {jax.process_count()}")
pid = jax.process_index()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nf_tpu.config import Config, NetworkConfig  # noqa: E402
from nf_tpu.models import build_model  # noqa: E402
from nf_tpu.train import Trainer  # noqa: E402

cfg = Config()
cfg.network = NetworkConfig(name="glow", layers=2, base_filters=8)
model = build_model("glow", (2,), datatype="2d", cfg=cfg.network)
batch = np.random.default_rng(100 + pid).normal(size=(64, 2)).astype(np.float32)
tr = Trainer(model, cfg.optimizer, seed=0)
ts = tr.init_state(jax.random.PRNGKey(0), batch)
digest = float(sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(ts.params)))
print(f"LAUNCHED {pid} {digest:.10f}", flush=True)
