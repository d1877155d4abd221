"""Mixed-precision (compute_dtype=bfloat16) conditioner path.

The opt-in runs conditioner convs/matmuls in bf16 while keeping master
params, batch-norm statistics, and all flow/logdet math in f32
(NetworkConfig.compute_dtype).  These tests pin the contract:
  * params stay f32 and the checkpoint pytree is unchanged;
  * forward/inverse still round-trip (bf16-level tolerance);
  * logdet antisymmetry holds;
  * a bf16 model's forward agrees with the f32 model's to bf16 accuracy
    when given identical params;
  * a train step runs and produces finite loss/grads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.train import Trainer

DIMS = (16, 16, 2)


def _build(name, dtype, scan=False):
    cfg = Config()
    cfg.network = NetworkConfig(name=name, layers=2, base_filters=8,
                                compute_dtype=dtype, scan=scan)
    return cfg, build_model(name, DIMS, datatype="image", cfg=cfg.network)


def _data(rng, n=4):
    return jax.random.uniform(rng, (n,) + DIMS, minval=0.05, maxval=0.95)


@pytest.mark.parametrize("name", ["realnvp", "glow"])
def test_bf16_params_stay_f32(name, rng):
    _, model = _build(name, "bfloat16")
    var = model.init(rng)
    for leaf in jax.tree_util.tree_leaves(var["params"]):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("name", ["realnvp", "glow"])
def test_bf16_roundtrip_and_antisymmetry(name, rng):
    _, model = _build(name, "bfloat16")
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = _data(jax.random.fold_in(rng, 1))
    z, ld_f, _ = model.forward(var, x, ctx)
    assert z.dtype == jnp.float32 and ld_f.dtype == jnp.float32
    x2, ld_i, _ = model.inverse(var, z, ctx)
    # bf16 conditioner outputs feed an exp(); tolerance is bf16-scale
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-2)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("name", ["realnvp", "glow"])
def test_bf16_matches_f32_model(name, rng):
    """Same params, bf16 vs f32 compute: outputs agree to bf16 accuracy."""
    _, m32 = _build(name, "float32")
    _, m16 = _build(name, "bfloat16")
    var = m32.init(rng)  # pytrees identical by construction
    ctx = Ctx(train=False)
    x = _data(jax.random.fold_in(rng, 1))
    z32, ld32, _ = m32.forward(var, x, ctx)
    z16, ld16, _ = m16.forward(var, x, ctx)
    np.testing.assert_allclose(np.asarray(z16), np.asarray(z32), atol=5e-2)
    # logdet is a sum over ~hundreds of bf16-rounded scales
    np.testing.assert_allclose(np.asarray(ld16), np.asarray(ld32),
                               rtol=5e-2, atol=2.0)


def test_bf16_scan_train_step(rng):
    cfg, model = _build("glow", "bfloat16", scan=True)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = np.asarray(_data(rng, 8))
    ts = tr.init_state(rng, batch)
    ts, loss1 = tr.train_step(ts, batch)
    ts, loss2 = tr.train_step(ts, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert leaf.dtype == jnp.float32
