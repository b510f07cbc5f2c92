"""Input pipeline: cube store, sampler epoch arithmetic (remainder drop,
cyclic indexing), reproducibility, prefetcher delivery + error propagation."""

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.data.datasets import CubeStore, PatchSampler, Prefetcher
from tests.conftest import make_synthetic_dataset


def _store(tmp_path, rng, n=3, h=40, w=48, c=6):
    d = tmp_path / "cubes"
    d.mkdir()
    for i in range(n):
        sio.savemat(d / f"c{i}.mat", {"data": (rng.rand(h, w, c) * 4000).astype(np.float32)})
    return CubeStore(str(d), normalization="global_normalization",
                     global_min=0.0, global_max=4095.0)


def test_store_loads_sorted(tmp_path, rng):
    store = _store(tmp_path, rng)
    assert len(store) == 3
    assert store.channels == 6
    assert store.basenames() == ["c0.mat", "c1.mat", "c2.mat"]
    assert all(c.dtype == np.float32 for c in store.cubes)


def test_sampler_epoch_arithmetic(tmp_path, rng):
    store = _store(tmp_path, rng, n=5)
    s = PatchSampler(store, batch_size=2, patch_size=16, seed=0)
    # reference model.py:253 — remainder dropped
    assert s.num_batches == 2
    batches = list(s.epoch())
    assert len(batches) == 2
    assert batches[0].shape == (2, 16, 16, 6)


def test_sampler_reproducible(tmp_path, rng):
    store = _store(tmp_path, rng)
    a = PatchSampler(store, 2, 16, seed=7).sample_batch(0)
    b = PatchSampler(store, 2, 16, seed=7).sample_batch(0)
    np.testing.assert_array_equal(a, b)
    c = PatchSampler(store, 2, 16, seed=8).sample_batch(0)
    assert not np.array_equal(a, c)


def test_sampler_patch_too_large(tmp_path, rng):
    store = _store(tmp_path, rng, h=12, w=12)
    with pytest.raises(ValueError):
        PatchSampler(store, 1, 16)


def test_sampler_patches_come_from_cubes(tmp_path, rng):
    store = _store(tmp_path, rng, n=1)
    s = PatchSampler(store, 1, 16, seed=3)
    batch = s.sample_batch(0)
    # Augmented crop values must be a subset of the source cube's values.
    assert np.isin(batch, store.cubes[0]).all()


def test_prefetcher_delivers_all(tmp_path, rng):
    store = _store(tmp_path, rng, n=4)
    s = PatchSampler(store, 2, 16, seed=0)
    got = list(Prefetcher(s.epoch(), depth=2))
    assert len(got) == s.num_batches
    assert all(g.shape == (2, 16, 16, 6) for g in got)


def test_prefetcher_propagates_errors():
    def bad():
        yield np.zeros((1, 4, 4, 2), np.float32)
        raise RuntimeError("boom")

    it = Prefetcher(bad(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
