"""Data pipeline: toy samplers, loader contract, per-host sharding."""
import numpy as np
import pytest

from nf_tpu.data import FlowDataLoader
from nf_tpu.data.toy import TOY_SAMPLERS


@pytest.mark.parametrize("name", sorted(TOY_SAMPLERS))
def test_toy_sampler_shapes(name, np_rng):
    fn, dims, dtype = TOY_SAMPLERS[name]
    x = fn(1000, np_rng)
    assert x.shape == (1000,) + dims
    assert x.dtype == np.float32
    assert np.isfinite(x).all()
    # reference post-scalings keep toys roughly within the unit box
    assert np.abs(x).max() < 2.5


def test_loader_iterates_and_reshuffles():
    dl = FlowDataLoader("moons", batch_size=256, total_steps=300, seed=1)
    seen = 0
    first = None
    for batch in dl:
        assert batch.shape == (256, 2)
        if first is None:
            first = batch.copy()
        seen += 1
    assert seen == 300  # > one epoch of 65536/256 = 256 steps -> regenerated


def test_loader_sharding_partitions_epoch():
    a = FlowDataLoader("circles", batch_size=128, total_steps=4,
                       seed=7, shard_id=0, num_shards=2)
    b = FlowDataLoader("circles", batch_size=128, total_steps=4,
                       seed=7, shard_id=1, num_shards=2)
    # different host shards draw from different PRNG streams -> disjoint data
    assert not np.allclose(a.next_batch(), b.next_batch())


def test_image_fallback_synthetic(tmp_path):
    dl = FlowDataLoader("mnist", batch_size=8, total_steps=2,
                        data_root=str(tmp_path))
    batch = dl.next_batch()
    assert batch.shape == (8, 32, 32, 1)
    assert batch.dtype == np.float32
    assert 0.0 <= batch.min() and batch.max() <= 1.0
