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


def test_synthetic_images_are_quantized():
    from nf_tpu.data.images import synthetic_images
    x = synthetic_images("mnist", 16, seed=0)
    assert x.min() >= 0.0 and x.max() <= 1.0
    np.testing.assert_allclose(np.round(x * 255.0) / 255.0, x, atol=1e-7)


def test_loader_dequantize_contract():
    from nf_tpu.data import FlowDataLoader
    dl_raw = FlowDataLoader("mnist", batch_size=32, total_steps=1, seed=3)
    dl_deq = FlowDataLoader("mnist", batch_size=32, total_steps=1, seed=3,
                            dequantize=True)
    raw = dl_raw.next_batch()
    deq = dl_deq.next_batch()
    # same underlying pixels: dequantized value is inside the raw pixel's
    # 1/256 bin, y = (255x + u)/256 with u in [0,1)
    lo = raw * 255.0 / 256.0
    assert np.all(deq >= lo - 1e-6)
    assert np.all(deq < lo + 1.0 / 256.0 + 1e-6)
    # dequantization is stochastic, not the identity
    assert not np.allclose(deq, lo)


def test_subsampled_image_variants(tmp_path):
    # mnist16/cifar16: 2x pixel subsample of the 32x32 sources, still on
    # the 8-bit grid, resolvable through the loader end to end
    from nf_tpu.data.images import load_images
    for name, dims in (("mnist16", (16, 16, 1)), ("cifar16", (16, 16, 3))):
        x, is_real = load_images(name, str(tmp_path), seed=1, synthetic_n=8)
        assert x.shape == (8,) + dims and not is_real
        np.testing.assert_allclose(np.round(x * 255.0) / 255.0, x, atol=1e-7)
        dl = FlowDataLoader(name, batch_size=4, total_steps=1,
                            data_root=str(tmp_path))
        assert dl.dims == dims and dl.dtype == "image"
        assert dl.next_batch().shape == (4,) + dims
    # subsample of the same seed's 32x32 pool == the 16x16 pool rows
    full, _ = load_images("mnist", str(tmp_path), seed=1, synthetic_n=8)
    sub, _ = load_images("mnist16", str(tmp_path), seed=1, synthetic_n=8)
    np.testing.assert_allclose(full[:, ::2, ::2, :], sub)
