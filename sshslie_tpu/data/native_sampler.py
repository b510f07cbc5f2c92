"""ctypes bridge to the native (C++) patch sampler.

The Python sampler (data/datasets.py) crops and augments one sample at a time
under the GIL; at TPU step rates the host becomes the bottleneck. The native
library fills the whole (B, P, P, C) batch with a thread pool in one call.

Falls back transparently to the Python path when the shared library hasn't
been built (``native/build.sh``) — same API, same cube store.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

from sshslie_tpu.data.datasets import CubeStore

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libpatch_sampler.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sample_batch.restype = ctypes.c_int
    lib.sample_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),                  # cubes
        ctypes.POINTER(ctypes.c_int64),                   # heights
        ctypes.POINTER(ctypes.c_int64),                   # widths
        ctypes.c_int64,                                   # num_cubes
        ctypes.c_int64,                                   # channels
        ctypes.c_int64,                                   # batch
        ctypes.c_int64,                                   # patch
        ctypes.c_int64,                                   # batch_start
        ctypes.c_uint64,                                  # seed
        ctypes.c_void_p,                                  # out
        ctypes.c_int,                                     # num_threads
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativePatchSampler:
    """Drop-in alternative to PatchSampler backed by the C++ library.

    The RNG stream differs from the Python sampler (xoshiro vs PCG64), but is
    deterministic per (seed, epoch, batch_id), so runs remain reproducible.
    """

    def __init__(self, store: CubeStore, batch_size: int, patch_size: int,
                 seed: int = 41, num_threads: Optional[int] = None):
        if num_threads is None:
            # One worker per core, capped: on a 1-core host a second thread
            # measurably HURTS (62 vs 27 ms/batch — pure contention), while
            # real TPU-VM hosts have dozens of cores to feed from.
            num_threads = max(1, min(os.cpu_count() or 1, 8, batch_size))
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                f"native sampler library not built: {_LIB_PATH} "
                "(run native/build.sh)"
            )
        if len(store) == 0:
            raise ValueError("NativePatchSampler needs a non-empty CubeStore")
        self._lib = lib
        self.store = store
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.seed = seed
        self.num_threads = num_threads
        self._epoch_counter = 0

        # Keep cubes pinned as C-contiguous float32 and build pointer tables.
        self._cubes = [np.ascontiguousarray(c, dtype=np.float32) for c in store.cubes]
        n = len(self._cubes)
        self._ptrs = (ctypes.c_void_p * n)(
            *[c.ctypes.data_as(ctypes.c_void_p).value for c in self._cubes]
        )
        self._heights = (ctypes.c_int64 * n)(*[c.shape[0] for c in self._cubes])
        self._widths = (ctypes.c_int64 * n)(*[c.shape[1] for c in self._cubes])
        self._channels = self._cubes[0].shape[2]
        for i, c in enumerate(self._cubes):
            if c.shape[0] < patch_size or c.shape[1] < patch_size:
                raise ValueError(
                    f"cube {store.files[i]} smaller than patch_size={patch_size}"
                )
            if c.shape[2] != self._channels:
                # The C library indexes every cube with ONE shared channel
                # count — a mismatched cube would be read out of bounds
                # (heap over-read), not caught like the Python sampler's
                # broadcast error. Fail loudly here instead.
                raise ValueError(
                    f"cube {store.files[i]} has {c.shape[2]} channels but "
                    f"{store.files[0]} has {self._channels}; the native "
                    "sampler needs a uniform channel count"
                )

    @property
    def num_batches(self) -> int:
        return len(self.store) // self.batch_size

    def sample_batch(self, batch_id: int = 0, epoch: Optional[int] = None) -> np.ndarray:
        if epoch is None:
            epoch = self._epoch_counter
        out = np.empty(
            (self.batch_size, self.patch_size, self.patch_size, self._channels),
            dtype=np.float32,
        )
        # Mix (seed, epoch, batch_id) into one 64-bit stream id.
        mask = (1 << 64) - 1
        seed = ((self.seed * 0x9E3779B97F4A7C15) & mask
                ^ (epoch * 0xBF58476D1CE4E5B9) & mask
                ^ batch_id) & mask
        rc = self._lib.sample_batch(
            self._ptrs, self._heights, self._widths,
            ctypes.c_int64(len(self._cubes)), ctypes.c_int64(self._channels),
            ctypes.c_int64(self.batch_size), ctypes.c_int64(self.patch_size),
            ctypes.c_int64(batch_id * self.batch_size), ctypes.c_uint64(int(seed)),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(self.num_threads),
        )
        if rc != 0:
            raise RuntimeError(f"native sample_batch failed with code {rc}")
        return out

    def epoch(self) -> Iterator[np.ndarray]:
        e = self._epoch_counter
        self._epoch_counter += 1
        for batch_id in range(self.num_batches):
            yield self.sample_batch(batch_id, epoch=e)

    def skip_epochs(self, n: int) -> None:
        """Resume support: the stream is keyed on (seed, epoch, batch_id),
        so skipping is just advancing the epoch counter — a resumed run
        replays exactly the batches the uninterrupted run would have drawn."""
        self._epoch_counter += max(int(n), 0)


def make_sampler(store: CubeStore, batch_size: int, patch_size: int,
                 seed: int = 41, prefer_native: bool = True,
                 mode: str = "auto"):
    """Select the host patch sampler (config key ``sampler``).

    * ``auto``   — native if built, else the Python PatchSampler (the
      round-1 default). NOTE: the two samplers draw from different RNG
      streams (xoshiro vs PCG64), so 'auto' runs are only bit-reproducible
      on machines with the same build state — the caller should log the
      choice (Trainer.fit does; see docs/PARITY.md).
    * ``native`` — require the C++ sampler; raise if native/build.sh wasn't
      run or the store is disk-backed.
    * ``python`` — force the Python PatchSampler (PCG64 stream).

    Disk-backed stores (LazyCubeStore) always use the Python sampler — the
    native library pins every cube in RAM, which defeats lazy loading.
    ``prefer_native=False`` is a legacy alias for mode='python'."""
    from sshslie_tpu.data.datasets import LazyCubeStore, PatchSampler

    if mode not in ("auto", "native", "python"):
        raise ValueError(f"sampler mode must be auto|native|python, got {mode!r}")
    if not prefer_native and mode == "auto":
        mode = "python"
    lazy = isinstance(store, LazyCubeStore)
    if mode == "native":
        if lazy:
            raise ValueError(
                "sampler='native' is incompatible with lazy_loading: the "
                "native sampler pins every cube in RAM"
            )
        return NativePatchSampler(store, batch_size, patch_size, seed)
    if mode == "auto" and native_available() and not lazy:
        return NativePatchSampler(store, batch_size, patch_size, seed)
    return PatchSampler(store, batch_size, patch_size, seed)
