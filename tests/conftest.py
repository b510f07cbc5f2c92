"""Test bootstrap: force the CPU backend with a virtual 8-device mesh.

Must run before any jax backend initialization. The container's sitecustomize
registers the axon TPU plugin and snapshots JAX_PLATFORMS at interpreter
start, so the env var alone is not enough — we use jax.config.update, which
wins as long as no backend has been touched yet. torch is imported first
because importing it after the TPU client initializes deadlocks.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import torch  # noqa: F401  (must precede jax/TPU init; see module docstring)
import jax

# Opt-in real-backend smoke run (tests/test_tpu_smoke.py):
#   SSHSLIE_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
# leaves the backend alone so the axon TPU plugin wins; everything else in
# the suite skips itself when it sees a non-CPU backend requirement fail.
_TPU_SMOKE = bool(os.environ.get("SSHSLIE_TPU_SMOKE"))
if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles ~100 graphs on a 1-CPU box;
# caching cuts repeat runs from ~12 min to ~3.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


@pytest.fixture(scope="session", autouse=True)
def _verify_cpu_backend():
    if _TPU_SMOKE:
        yield  # real-backend smoke run: test_tpu_smoke.py gates itself
        return
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
    yield


def pytest_collection_modifyitems(config, items):
    if not _TPU_SMOKE:
        return
    skip = pytest.mark.skip(reason="SSHSLIE_TPU_SMOKE run: only test_tpu_smoke.py executes")
    for item in items:
        if "test_tpu_smoke" not in str(item.fspath):
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def make_synthetic_dataset(root, rng, n_train=2, h=40, w=48, c=12, lo=200.0, hi=3800.0):
    """Write a tiny synthetic .mat dataset tree under ``root``."""
    import scipy.io as sio

    dirs = {}
    for sub in ("low/train", "low/eval", "low/test", "high/test", "high/eval"):
        d = os.path.join(root, "data", sub)
        os.makedirs(d, exist_ok=True)
        dirs[sub] = d
    for i in range(n_train):
        cube = (rng.rand(h, w, c) * (hi - lo) + lo).astype(np.float32)
        sio.savemat(os.path.join(dirs["low/train"], f"c{i}.mat"), {"data": cube})
    for name, sub in (("t0", "low/test"), ("t0", "high/test"), ("e0", "low/eval"), ("e0", "high/eval")):
        cube = (rng.rand(h, w, c) * (hi - lo) + lo).astype(np.float32)
        sio.savemat(os.path.join(dirs[sub], f"{name}.mat"), {"data": cube})
    return dirs
