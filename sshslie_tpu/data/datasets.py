"""Input pipeline: in-RAM HSI cube store, seeded patch sampler, device prefetch.

The reference loads every cube into RAM up front (model.py:241-251), then per
batch crops a random patch_size² window and applies one of 8 augmentation modes
using the *global* numpy RNG (model.py:300-310). We keep the in-RAM store (HSI
datasets are a handful of ~512²×64 cubes — tens of MB) but:

  * sampling uses an explicit ``np.random.Generator`` so runs are reproducible
    regardless of call order (SURVEY.md §2.4.10);
  * batches are staged to the device asynchronously by a background thread, so
    host-side cropping overlaps with TPU compute (the reference crops
    synchronously inside the step loop);
  * with a mesh, batches are placed with a batch-axis NamedSharding so each
    data-parallel shard receives only its slice.

Reference batch semantics preserved: ``num_batches = len(cubes) // batch_size``
per epoch (drops the remainder, model.py:253) and cubes are indexed cyclically
``(batch_id*B + i) % len(cubes)`` (model.py:304).
"""

from __future__ import annotations

import os
import queue
import threading
from collections import OrderedDict
from glob import glob
from typing import Iterator, List, Optional

import jax
import numpy as np

from sshslie_tpu.utils.augment import data_augmentation
from sshslie_tpu.utils.io_hsi import load_hsi


class CubeStore:
    """All cubes of a directory loaded to RAM as float32 (H, W, C) arrays."""

    def __init__(
        self,
        data_path: str,
        mat_key: str = "data",
        normalization: Optional[str] = "global_normalization",
        global_min: Optional[float] = None,
        global_max: Optional[float] = None,
        pattern: str = "*.mat",
    ):
        self.files: List[str] = sorted(glob(os.path.join(data_path, pattern)))

        def _load(f: str) -> np.ndarray:
            return load_hsi(
                f,
                mat_key=mat_key,
                normalization=normalization,
                max_val=global_max,
                min_val=global_min,
            )

        # Order-preserving threaded load: scipy's .mat read (fread + zlib
        # inflate) releases the GIL, so up-front dataset load scales with
        # host cores (TPU-VM hosts have dozens; the reference loads serially,
        # model.py:241-251). Serial fallback below 2 files or 2 cores.
        workers = min(8, len(self.files), os.cpu_count() or 1)
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                self.cubes: List[np.ndarray] = list(pool.map(_load, self.files))
        else:
            self.cubes = [_load(f) for f in self.files]
        # (H, W, C) per cube; LazyCubeStore fills this from headers instead.
        self.shapes: List[tuple] = [c.shape for c in self.cubes]

    def __len__(self) -> int:
        return len(self.cubes)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.cubes[idx]

    @property
    def channels(self) -> int:
        if not self.cubes:
            raise ValueError("empty cube store")
        return self.cubes[0].shape[-1]

    def basenames(self) -> List[str]:
        return [os.path.basename(f) for f in self.files]


class LazyCubeStore(CubeStore):
    """Disk-backed cube store with an LRU cache — for datasets too large for
    RAM (e.g. hundreds of 512²×224 cubes ≈ 235 MB each).

    Net-new vs the reference, which loads everything up front
    (model.py:241-251) and therefore caps dataset size at host RAM. Shapes
    come from the .mat headers (``scipy.io.whosmat``) without reading pixel
    data, so samplers can validate sizes cheaply; cubes load on first access
    and the least-recently-used entries are evicted past ``cache_size``.

    ``.cubes`` iterates lazily (loading each cube as it is yielded); code
    that needs the whole dataset resident (the fused pipeline's
    ``stack_cubes``) detects this store and falls back to the host pipeline.
    """

    def __init__(
        self,
        data_path: str,
        mat_key: str = "data",
        normalization: Optional[str] = "global_normalization",
        global_min: Optional[float] = None,
        global_max: Optional[float] = None,
        pattern: str = "*.mat",
        cache_size: int = 8,
    ):
        import scipy.io as sio

        self.files = sorted(glob(os.path.join(data_path, pattern)))
        self._load_kwargs = dict(
            mat_key=mat_key, normalization=normalization,
            max_val=global_max, min_val=global_min,
        )
        self.cache_size = max(int(cache_size), 1)
        # OrderedDict doubles as the LRU order: move_to_end on hit, popitem
        # (FIFO side) to evict — O(1) where a list.remove scan is O(n).
        # The lock makes the store safe to share across streams (e.g. a
        # Prefetcher worker and the main thread): unguarded, a popitem
        # racing a move_to_end KeyErrors mid-training.
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self.load_count = 0  # observability: total disk loads incl. re-loads
        self.shapes: List[tuple] = []
        for f in self.files:
            if f.lower().endswith(".hdr"):
                # ENVI: shape comes straight from the text header.
                from sshslie_tpu.utils.io_envi import read_envi_header

                h = read_envi_header(f)
                self.shapes.append((int(str(h["lines"])),
                                    int(str(h["samples"])),
                                    int(str(h["bands"]))))
                continue
            try:
                entries = {n: s for n, s, _ in sio.whosmat(f)}
                if mat_key not in entries:
                    # Same diagnosable message as the eager load_hsi path —
                    # a bare KeyError from a valid v5 file would lose the
                    # filename and the available-variables list.
                    raise KeyError(
                        f"{f}: variable {mat_key!r} not found; available: "
                        f"{sorted(entries)}"
                    )
                self.shapes.append(tuple(entries[mat_key]))
            except (NotImplementedError, ValueError):
                # v7.3 (HDF5): the dataset shape is in the header — read it
                # without touching pixel data (axes arrive reversed).
                import h5py

                if not h5py.is_hdf5(f):
                    raise
                with h5py.File(f, "r") as fh:
                    self.shapes.append(tuple(reversed(fh[mat_key].shape)))

    def _load(self, idx: int) -> np.ndarray:
        return load_hsi(self.files[idx], **self._load_kwargs)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        if idx < 0:
            idx += len(self)
        with self._cache_lock:
            if idx in self._cache:
                self._cache.move_to_end(idx)
                return self._cache[idx]
            self.load_count += 1
        # Disk read outside the lock — concurrent misses may double-load a
        # cube (benign: last writer wins), but never serialize on I/O.
        cube = self._load(idx)
        with self._cache_lock:
            self._cache[idx] = cube
            while len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        return cube

    @property
    def cubes(self):  # type: ignore[override]
        """Lazy iteration — each cube is loaded (through the cache) as
        yielded; nothing is pinned beyond the LRU window."""
        return _LazyCubesView(self)

    @cubes.setter
    def cubes(self, _value):  # CubeStore.__init__ is bypassed; ignore sets
        raise AttributeError("LazyCubeStore.cubes is derived from disk")

    @property
    def channels(self) -> int:
        if not self.files:
            raise ValueError("empty cube store")
        return self.shapes[0][-1]


class _LazyCubesView:
    def __init__(self, store: "LazyCubeStore"):
        self._store = store

    def __len__(self) -> int:
        return len(self._store)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self._store[idx]

    def __iter__(self):
        for i in range(len(self._store)):
            yield self._store[i]


class PatchSampler:
    """Random crop + 8-mode augmentation batches from a CubeStore.

    Yields (B, patch, patch, C) float32 batches with the reference's epoch
    arithmetic. The RNG is an owned ``np.random.Generator`` seeded from the
    run seed, so shuffling other host code does not perturb the sample stream.
    """

    def __init__(
        self,
        store: CubeStore,
        batch_size: int,
        patch_size: int,
        seed: int = 41,
    ):
        if len(store) == 0:
            raise ValueError("PatchSampler needs a non-empty CubeStore")
        self.store = store
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)
        # Shape validation without loading pixels — every store type exposes
        # .shapes (LazyCubeStore reads them from the file headers).
        for i, (h, w, *_rest) in enumerate(store.shapes):
            if h < patch_size or w < patch_size:
                raise ValueError(
                    f"cube {store.files[i]} ({h}×{w}) is smaller than "
                    f"patch_size={patch_size}"
                )

    @property
    def num_batches(self) -> int:
        """Batches per epoch — drops the remainder (reference model.py:253)."""
        return len(self.store) // self.batch_size

    def sample_batch(self, batch_id: int = 0) -> np.ndarray:
        b, p = self.batch_size, self.patch_size
        out = np.empty((b, p, p, self.store.channels), dtype=np.float32)
        n = len(self.store)
        for i in range(b):
            cube = self.store[(batch_id * b + i) % n]
            h, w, _ = cube.shape
            # randint high is exclusive in Generator; reference's
            # np.random.randint(0, h - p) never reaches h - p either.
            x = int(self.rng.integers(0, max(h - p, 1)))
            y = int(self.rng.integers(0, max(w - p, 1)))
            mode = int(self.rng.integers(0, 8))
            out[i] = data_augmentation(cube[x : x + p, y : y + p, :], mode)
        return out

    def epoch(self) -> Iterator[np.ndarray]:
        for batch_id in range(self.num_batches):
            yield self.sample_batch(batch_id)

    def skip_epochs(self, n: int) -> None:
        """Fast-forward the RNG past ``n`` epochs without loading pixels.

        Resume support: a resumed run must draw epoch k's crops, not restart
        at epoch 0's (the fused pipeline gets this for free by folding on
        the absolute step id). Generator.integers consumes a bound-dependent
        amount of state (Lemire rejection), so the skip replays the exact
        call sequence of ``sample_batch`` — same bounds, shapes only.
        """
        b, p = self.batch_size, self.patch_size
        shapes = self.store.shapes
        n_cubes = len(self.store)
        for _ in range(max(int(n), 0)):
            for batch_id in range(self.num_batches):
                for i in range(b):
                    h, w, *_rest = shapes[(batch_id * b + i) % n_cubes]
                    self.rng.integers(0, max(h - p, 1))
                    self.rng.integers(0, max(w - p, 1))
                    self.rng.integers(0, 8)


class Prefetcher:
    """Background-thread pipeline staging host batches onto the device.

    ``sharding`` (a ``jax.sharding.Sharding``) controls placement; with a
    batch-axis NamedSharding over a data mesh each device receives its slice.
    Depth 2 is enough to hide host crop latency behind the TPU step.

    Multi-host: pass ``process_slice`` (this process's sample range from
    :func:`sshslie_tpu.parallel.distributed.process_batch_slice`) plus ``mesh``.
    Each host keeps only its slice of the sampled batch and the global array is
    assembled with ``jax.make_array_from_process_local_data`` — every host
    draws the same RNG stream (sampling semantics identical to single-host)
    but only transfers its shard to its devices.
    """

    _DONE = object()

    def __init__(self, iterator, sharding=None, depth: int = 2,
                 process_slice: Optional[slice] = None, mesh=None,
                 data_axis: str = "data", space_axis: str = ""):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._exhausted = False
        if process_slice is not None and mesh is None:
            raise ValueError("process_slice requires a mesh")

        def put(item) -> bool:
            # Bounded-wait put so an abandoned consumer (step raised, epoch
            # loop unwound) can release the worker via close() instead of
            # leaving it blocked forever holding device-resident batches.
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in iterator:
                    if self._stop.is_set():
                        return
                    if process_slice is not None:
                        from sshslie_tpu.parallel.distributed import (
                            host_local_batch_to_global,
                        )

                        batch = host_local_batch_to_global(
                            np.ascontiguousarray(batch[process_slice]),
                            mesh, data_axis, space_axis,
                        )
                    elif self._sharding is not None:
                        batch = jax.device_put(batch, self._sharding)
                    else:
                        batch = jax.device_put(batch)
                    if not put(batch):
                        return
            except BaseException as e:  # surface in consumer thread
                self._err = e
            finally:
                put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._exhausted:
            # The single _DONE sentinel was already consumed; without this a
            # second next() would block forever on the empty queue.
            raise StopIteration
        item = self._queue.get()
        if item is self._DONE:
            self._exhausted = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Release the worker and drop any staged batches. Idempotent; call
        from a finally around the consuming loop (Trainer.fit does)."""
        self._stop.set()
        while True:  # drain so a put()-blocked worker can observe _stop
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)
        self._exhausted = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def store_from_config(cfg, data_path: str, pattern: Optional[str] = None) -> CubeStore:
    """Build the configured store type: in-RAM (default) or disk-backed LRU
    (``lazy_loading: true`` for datasets larger than host RAM).

    ``pattern`` None → the ``data_pattern`` config key ("*.mat" default;
    "*.hdr" selects ENVI pairs via utils/io_envi.py)."""
    if pattern is None:
        pattern = getattr(cfg, "data_pattern", "*.mat") or "*.mat"
    kwargs = dict(
        mat_key=cfg.mat_key, normalization=cfg.normalization,
        global_min=cfg.global_min, global_max=cfg.global_max, pattern=pattern,
    )
    if cfg.lazy_loading:
        return LazyCubeStore(data_path, cache_size=cfg.cube_cache_size, **kwargs)
    return CubeStore(data_path, **kwargs)


def load_cubes(
    data_path: str,
    mat_key: str = "data",
    normalization: Optional[str] = "global_normalization",
    global_min: Optional[float] = None,
    global_max: Optional[float] = None,
) -> CubeStore:
    """Convenience wrapper mirroring the reference's train/eval/test loads."""
    return CubeStore(
        data_path,
        mat_key=mat_key,
        normalization=normalization,
        global_min=global_min,
        global_max=global_max,
    )
