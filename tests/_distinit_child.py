"""Child process for the two-process init-broadcast test.

Usage: python tests/_distinit_child.py <coordinator_addr> <process_id>

Builds a Glow model whose ActNorm data-dependent init sees a DIFFERENT
local batch per process, then runs Trainer.init_state — which must
broadcast host-0's state to all processes (trainer.py:84-89) so training
starts from identical parameters everywhere.  Prints two digests: RAW
(per-process dd-init, must differ across processes) and FINAL (after
init_state's broadcast, must be identical).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
addr, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nf_tpu.config import Config, NetworkConfig  # noqa: E402
from nf_tpu.models import build_model  # noqa: E402
from nf_tpu.train import Trainer  # noqa: E402


def digest(tree):
    return float(sum(float(jnp.sum(jnp.abs(l)))
                     for l in jax.tree_util.tree_leaves(tree)))


assert jax.process_count() == 2, jax.process_count()

cfg = Config()
cfg.network = NetworkConfig(name="glow", layers=2, base_filters=8)
model = build_model("glow", (2,), datatype="2d", cfg=cfg.network)

# per-process local batch -> ActNorm dd-init statistics differ
batch = np.random.default_rng(100 + pid).normal(size=(64, 2)).astype(np.float32)

var_raw = model.data_dependent_init(model.init(jax.random.PRNGKey(0)),
                                    jnp.asarray(batch))
print(f"RAW {pid} {digest(var_raw['params']):.10f}", flush=True)

tr = Trainer(model, cfg.optimizer, seed=0)
ts = tr.init_state(jax.random.PRNGKey(0), batch)
print(f"FINAL {pid} {digest(ts.params):.10f}", flush=True)
