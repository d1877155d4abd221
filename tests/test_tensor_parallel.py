"""Tensor-parallel parity: a (data x model) mesh must reproduce
single-device numerics, not just produce finite losses.

Complements test_train_realnvp.py::test_sharded_matches_single_device
(DP-only, mesh (8,1)) by exercising the model axis: conditioner matrices
get P(..., 'model') via parallel/sharding.py:tp_shardings and XLA inserts
the collectives.  The reference has no distributed story (SURVEY.md §2.4);
parity-vs-single-device is the correctness contract for ours.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.models import build_model
from nf_tpu.parallel.sharding import tp_shardings
from nf_tpu.train import Trainer


def _mesh(shape, names=("data", "model")):
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, names)


def _cfg():
    cfg = Config()
    # base_filters=64 makes the 64x64 conditioner matrices large enough
    # (>= min_size) for the TP rule to shard them over 'model'
    cfg.network = NetworkConfig(name="realnvp", layers=4, base_filters=64)
    return cfg


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_mesh_matches_single_device(rng):
    cfg = _cfg()
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    batch = np.asarray(jax.random.normal(rng, (64, 2))) * 0.7
    eval_batch = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 1), (32, 2))) * 0.7

    def run(mesh):
        tr = Trainer(model, cfg.optimizer, mesh=mesh, seed=0)
        ts = tr.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(3):
            ts, loss = tr.train_step(ts, batch)
            losses.append(float(loss))
        logp = np.asarray(tr.log_prob(ts, eval_batch))
        return losses, logp

    losses_tp, logp_tp = run(_mesh((4, 2)))
    losses_1, logp_1 = run(None)

    np.testing.assert_allclose(losses_tp, losses_1, atol=1e-4)
    np.testing.assert_allclose(logp_tp, logp_1, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_rule_actually_shards(rng):
    """Guard against the TP parity test passing vacuously: the sharding
    rule must place at least one matrix over the 'model' axis."""
    cfg = _cfg()
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    var = model.init(jax.random.PRNGKey(0))
    mesh = _mesh((4, 2))
    specs = tp_shardings(var["params"], mesh)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "spec"))
        if "model" in str(s.spec)]
    assert sharded, "TP rule sharded nothing — parity test would be vacuous"


# ---------------------------------------------------------------------------
# The round-2 TP coverage was realnvp-MLP-only; these rows exercise the
# param families most likely to carry a wrong PartitionSpec: conv
# conditioners + PLU 1x1 (glow image), attention/LayerNorm/gated nets
# (flow++), and spectral-norm state (resflow).

def _build(name):
    cfg = Config()
    if name == "glow-image":
        cfg.network = NetworkConfig(name="glow", layers=2, base_filters=32)
        model = build_model("glow", (8, 8, 1), datatype="image",
                            cfg=cfg.network)
        dims = (8, 8, 1)
    elif name == "flow++":
        cfg.network = NetworkConfig(name="flow++", layers=2, mixtures=4,
                                    base_filters=64)
        model = build_model("flow++", (2,), datatype="2d", cfg=cfg.network)
        dims = (2,)
    else:  # resflow: spectral-norm u/v state rides in var["state"]
        cfg.network = NetworkConfig(name="resflow", layers=2,
                                    base_filters=64, logdet="exact",
                                    spnorm_coeff=0.9)
        model = build_model("resflow", (2,), datatype="2d", cfg=cfg.network)
        dims = (2,)
    return model, cfg, dims


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("name", ["glow-image", "flow++", "resflow"])
def test_tp_hard_families_match_single_device(rng, name):
    model, cfg, dims = _build(name)
    bshape = (32,) + dims
    if dims == (2,):
        batch = np.asarray(jax.random.normal(rng, bshape)) * 0.7
    else:
        batch = np.asarray(
            jax.random.uniform(rng, bshape, minval=0.05, maxval=0.95))
    ebatch = batch[:16]

    def run(mesh):
        tr = Trainer(model, cfg.optimizer, mesh=mesh, seed=0)
        ts = tr.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(2):
            ts, loss = tr.train_step(ts, batch)
            losses.append(float(loss))
        logp = np.asarray(tr.log_prob(ts, ebatch))
        return losses, logp

    losses_tp, logp_tp = run(_mesh((4, 2)))
    losses_1, logp_1 = run(None)

    np.testing.assert_allclose(losses_tp, losses_1, rtol=0, atol=2e-4)
    # per-sample logp accumulates f32 reduction-order noise over D dims
    # (post-2-Adam-step param noise amplified through the stack): scale
    # the tolerance with dimensionality (glow-image D=64 showed ~3e-3)
    d = int(np.prod(dims))
    np.testing.assert_allclose(logp_tp, logp_1, rtol=0, atol=2e-3 * max(1, d // 8))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("name", ["glow-image", "flow++"])
def test_tp_rule_shards_hard_families(name):
    model, cfg, dims = _build(name)
    var = model.init(jax.random.PRNGKey(0))
    mesh = _mesh((4, 2))
    specs = tp_shardings(var["params"], mesh)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "spec"))
        if "model" in str(s.spec)]
    assert sharded, f"TP rule sharded nothing for {name}"
