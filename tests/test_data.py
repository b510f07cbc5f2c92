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


def test_store_threaded_load_matches_serial(tmp_path, rng, monkeypatch):
    """Threaded up-front load (multi-core hosts) must be order-preserving and
    bit-identical to the serial path (divide-by-max is per-cube, PARITY #1 —
    no cross-file coupling to race on)."""
    import sshslie_tpu.data.datasets as ds

    d = tmp_path / "cubes"
    d.mkdir()
    for i in range(5):
        sio.savemat(d / f"c{i}.mat",
                    {"data": (rng.rand(24, 24, 4) * 4000).astype(np.float32)})
    kw = dict(normalization="global_normalization", global_min=0.0,
              global_max=4095.0)
    monkeypatch.setattr(ds.os, "cpu_count", lambda: 1)
    serial = CubeStore(str(d), **kw)
    monkeypatch.setattr(ds.os, "cpu_count", lambda: 4)
    threaded = CubeStore(str(d), **kw)
    assert threaded.files == serial.files
    for a, b in zip(threaded.cubes, serial.cubes):
        np.testing.assert_array_equal(a, b)


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


def test_prefetcher_close_releases_blocked_worker():
    """An abandoned consumer (step raised mid-epoch) must be able to release
    the worker via close(); unguarded, the worker blocks in queue.put()
    forever, pinning staged device batches."""
    def stream():
        for _ in range(100):
            yield np.zeros((1, 4, 4, 2), np.float32)

    pf = Prefetcher(stream(), depth=1)
    first = next(pf)  # worker now blocked staging further batches
    assert first.shape == (1, 4, 4, 2)
    pf.close()
    assert not pf._thread.is_alive()
    with pytest.raises(StopIteration):  # closed ⇒ exhausted, not hung
        next(pf)


def test_prefetcher_next_after_exhaustion_raises():
    """A second next() after StopIteration must raise again, not block
    forever on the empty queue (the single _DONE sentinel is consumed)."""
    pf = Prefetcher(iter([np.zeros((1, 4, 4, 2), np.float32)]), depth=1)
    assert len(list(pf)) == 1
    with pytest.raises(StopIteration):
        next(pf)


def test_prefetcher_propagates_errors():
    def bad():
        yield np.zeros((1, 4, 4, 2), np.float32)
        raise RuntimeError("boom")

    it = Prefetcher(bad(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


class TestLazyCubeStore:
    @staticmethod
    def _make_dir(tmp_path, rng, n=5, shape=(24, 24, 4)):
        import scipy.io as sio

        d = tmp_path / "lazy_cubes"
        d.mkdir(exist_ok=True)
        cubes = []
        for i in range(n):
            c = (rng.rand(*shape) * 100).astype(np.float32)
            sio.savemat(d / f"c{i}.mat", {"data": c})
            cubes.append(c)
        return str(d), cubes

    def test_shapes_without_loading(self, tmp_path, rng):
        from sshslie_tpu.data.datasets import LazyCubeStore

        d, _ = self._make_dir(tmp_path, rng)
        store = LazyCubeStore(d, normalization=None)
        assert store.shapes == [(24, 24, 4)] * 5
        assert store.channels == 4
        assert store.load_count == 0  # headers only

    def test_lru_eviction_and_reload(self, tmp_path, rng):
        from sshslie_tpu.data.datasets import LazyCubeStore

        d, cubes = self._make_dir(tmp_path, rng)
        store = LazyCubeStore(d, normalization=None, cache_size=2)
        np.testing.assert_array_equal(store[0], cubes[0])
        np.testing.assert_array_equal(store[1], cubes[1])
        assert store.load_count == 2
        _ = store[0]                       # cache hit, refreshes LRU order
        assert store.load_count == 2
        _ = store[2]                       # evicts 1 (LRU)
        assert store.load_count == 3
        _ = store[0]                       # still cached
        assert store.load_count == 3
        _ = store[1]                       # was evicted → reload
        assert store.load_count == 4

    def test_lazy_iteration_matches_eager(self, tmp_path, rng):
        from sshslie_tpu.data.datasets import CubeStore, LazyCubeStore

        d, _ = self._make_dir(tmp_path, rng)
        eager = CubeStore(d, normalization="self")
        lazy = LazyCubeStore(d, normalization="self", cache_size=2)
        assert len(lazy.cubes) == len(eager.cubes)
        for a, b in zip(lazy.cubes, eager.cubes):
            np.testing.assert_array_equal(a, b)

    def test_sampler_and_fused_fallback(self, tmp_path, rng):
        from sshslie_tpu.data.datasets import LazyCubeStore, PatchSampler
        from sshslie_tpu.data.native_sampler import make_sampler
        from sshslie_tpu.train import stack_cubes

        d, _ = self._make_dir(tmp_path, rng)
        store = LazyCubeStore(d, normalization=None, cache_size=2)
        sampler = make_sampler(store, batch_size=2, patch_size=16)
        assert isinstance(sampler, PatchSampler)  # native path refused
        batch = sampler.sample_batch(0)
        assert batch.shape == (2, 16, 16, 4)
        assert stack_cubes(store) is None         # fused pipeline refused

    def test_trainer_fit_lazy(self, tmp_path, rng, monkeypatch):
        from sshslie_tpu.config import Config
        from sshslie_tpu.data.datasets import store_from_config
        from sshslie_tpu.train import Trainer

        monkeypatch.chdir(tmp_path)
        d, _ = self._make_dir(tmp_path, rng, n=4)
        cfg = Config(channels=4, patch_size=16, batch_size=2, epoch=2,
                     eval_every_epoch=100, plot_every_epoch=100,
                     attention_impl="xla", normalization="self",
                     lazy_loading=True, cube_cache_size=2)
        cfg.finalize()
        store = store_from_config(cfg, d)
        trainer = Trainer(cfg, channels=4)
        trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
        assert len(trainer.all_epoch_losses["total_loss"]) == 2
        assert all(np.isfinite(v) for v in trainer.all_epoch_losses["total_loss"])
        assert store.load_count > 0

    def test_v73_header_fallback(self, tmp_path, rng):
        from sshslie_tpu.data.datasets import LazyCubeStore
        from sshslie_tpu.utils.io_hsi import save_hsi

        d = tmp_path / "v73"
        d.mkdir()
        cube = rng.rand(12, 10, 3).astype(np.float32)
        save_hsi(str(d / "a.mat"), cube, fmt="v7.3")
        store = LazyCubeStore(str(d), normalization=None)
        assert store.shapes == [(12, 10, 3)]
        assert store.load_count == 0  # shape came from the HDF5 header
        np.testing.assert_array_equal(store[0], cube)


def test_sampler_skip_epochs_replays_exactly(tmp_path, rng):
    """Resume must draw epoch k's patches: skip_epochs(k) on a fresh sampler
    lands the RNG exactly where an uninterrupted run's epoch k starts (the
    integer draws are bound-dependent, so the skip replays the call
    sequence)."""
    store = _store(tmp_path, rng, n=4)
    full = PatchSampler(store, 2, 16, seed=9)
    for _ in range(2):  # epochs 0 and 1
        list(full.epoch())
    expected = list(full.epoch())  # epoch 2

    resumed = PatchSampler(store, 2, 16, seed=9)
    resumed.skip_epochs(2)
    got = list(resumed.epoch())
    for a, b in zip(got, expected):
        np.testing.assert_array_equal(a, b)


def test_native_sampler_skip_epochs(tmp_path, rng):
    """Native sampler resume: the stream is keyed on (seed, epoch, batch),
    so skip_epochs must advance the epoch counter."""
    from sshslie_tpu.data.native_sampler import NativePatchSampler, _load_lib

    if _load_lib() is None:
        pytest.skip("native sampler library not built")
    store = _store(tmp_path, rng, n=4)
    full = NativePatchSampler(store, 2, 16, seed=9)
    for _ in range(2):
        list(full.epoch())
    expected = list(full.epoch())
    resumed = NativePatchSampler(store, 2, 16, seed=9)
    resumed.skip_epochs(2)
    got = list(resumed.epoch())
    for a, b in zip(got, expected):
        np.testing.assert_array_equal(a, b)
