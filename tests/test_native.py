"""Native (C++) data-tier: build, ABI, statistical parity with numpy."""
import numpy as np
import pytest

from nf_tpu.data import native
from nf_tpu.data.toy import TOY_SAMPLERS


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("no g++ / native build unavailable")
    return native.load()


def test_abi_version(lib):
    assert lib.nf_tpu_native_abi_version() == 1


@pytest.mark.parametrize("name", sorted(native.NATIVE_SAMPLERS))
def test_native_matches_numpy_statistics(name, lib, np_rng):
    n = 20000
    nat = native.NATIVE_SAMPLERS[name](n, seed=7)
    ref_fn, dims, _ = TOY_SAMPLERS[name]
    ref = ref_fn(n, np_rng)

    assert nat.shape == (n,) + dims
    assert nat.dtype == np.float32
    assert np.isfinite(nat).all()
    # distribution parity: first/second moments within MC tolerance
    np.testing.assert_allclose(nat.mean(0), ref.mean(0), atol=0.03)
    np.testing.assert_allclose(nat.std(0), ref.std(0), atol=0.03)


def test_native_deterministic(lib):
    a = native.native_moons(512, seed=3)
    b = native.native_moons(512, seed=3)
    c = native.native_moons(512, seed=4)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_shuffled_indices_is_permutation(lib):
    idx = native.shuffled_indices(1000, seed=1)
    assert sorted(idx.tolist()) == list(range(1000))
    idx2 = native.shuffled_indices(1000, seed=2)
    assert not np.array_equal(idx, idx2)


def test_loader_uses_native_when_available(lib):
    from nf_tpu.data import FlowDataLoader

    dl = FlowDataLoader("circles", batch_size=64, total_steps=2, seed=0)
    assert dl._native is not None
    batch = dl.next_batch()
    assert batch.shape == (64, 2)
    # radii concentrate near 0.6 and 0.3
    r = np.linalg.norm(batch, axis=1)
    assert 0.1 < r.mean() < 0.7
