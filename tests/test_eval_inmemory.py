"""In-memory eval metrics (``eval_metric_source: memory``) vs the legacy
disk round-trip: bit-identical scores, async artifact writes, GT device
cache.

VERDICT r4 #1: the reference's save-then-reread eval design
(reference model.py:390-397) is redesigned — metrics come from the in-memory
S while the .mat artifacts save asynchronously. These tests pin the redesign
to the disk path bit-for-bit (same denormalization rounding, same jitted
metric programs, same float64 accumulation order)."""

import os

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.config import Config
from sshslie_tpu.data.datasets import CubeStore
from sshslie_tpu.evaluate import (
    _GT_CACHE,
    _OverlappedSaver,
    _cached_gt,
    evaluate_model,
)
from sshslie_tpu.train import Trainer

GMIN, GMAX = 100.0, 4095.0


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("inmem")
    rng = np.random.RandomState(7)
    low, gt = d / "low", d / "gt"
    os.makedirs(low)
    os.makedirs(gt)
    # Two GT-paired cubes + one orphan (exercises the skip-and-print path).
    for name in ("a.mat", "b.mat", "orphan.mat"):
        sio.savemat(str(low / name),
                    {"data": (rng.rand(20, 24, 6) * 3000 + 200).astype(np.float32)})
    for name in ("a.mat", "b.mat"):
        sio.savemat(str(gt / name),
                    {"data": (rng.rand(20, 24, 6) * 4000).astype(np.float32)})
    return str(low), str(gt)


def _store(low):
    return CubeStore(low, normalization="global_normalization",
                     global_min=GMIN, global_max=GMAX)


@pytest.fixture(scope="module")
def trainer():
    cfg = Config(channels=6, patch_size=16, batch_size=1, attention_impl="xla",
                 global_min=GMIN, global_max=GMAX)
    cfg.finalize()
    return Trainer(cfg, channels=6)


def test_inmemory_matches_disk_bitexact(data, trainer, tmp_path):
    """The headline contract: in-memory scores == save-then-reread scores
    EXACTLY (float equality, not allclose) — the non-trivial global_min/max
    makes the denormalization rounding part of what's pinned."""
    low, gt = data
    store = _store(low)
    trainer.cfg.eval_metric_source = "memory"
    sm = evaluate_model(trainer, store, str(tmp_path / "mem"), 1, gt)
    trainer.cfg.eval_metric_source = "disk"
    try:
        sd = evaluate_model(trainer, store, str(tmp_path / "disk"), 1, gt)
    finally:
        trainer.cfg.eval_metric_source = "memory"
    assert sm is not None and sd is not None
    for k in ("psnr", "ssim", "sam"):
        assert sm[k] == sd[k], (k, sm[k], sd[k])


def test_inmemory_artifacts_still_written(data, trainer, tmp_path, capsys):
    """The .mat outputs (the reference's eval artifact contract) still land,
    the orphan cube still prints the skip, and the per-file score lines keep
    calc_metrics' format."""
    low, gt = data
    scores = evaluate_model(trainer, _store(low), str(tmp_path / "out"), 2, gt)
    assert scores is not None
    out_dir = tmp_path / "out" / "epoch_2"
    assert sorted(os.listdir(out_dir)) == ["a.mat", "b.mat", "orphan.mat"]
    out = capsys.readouterr().out
    assert "orphan.mat | no ground truth" in out
    assert "===> a.mat | PSNR :" in out
    # Written prediction == denormalized S (the artifact is what the disk
    # path would have scored).
    pred = sio.loadmat(str(out_dir / "a.mat"))["data"]
    assert pred.dtype == np.float32
    assert float(pred.max()) > 1.0  # denormalized back to sensor range


def test_no_gt_pairs_returns_none(data, trainer, tmp_path, capsys):
    low, _ = data
    empty = tmp_path / "empty_gt"
    empty.mkdir()
    scores = evaluate_model(trainer, _store(low), str(tmp_path / "nogt"), 3,
                            str(empty))
    assert scores is None
    out = capsys.readouterr().out
    assert "Eval metrics skipped for epoch 3" in out


def test_gt_cache_hit_and_invalidation(tmp_path):
    p = tmp_path / "g.mat"
    sio.savemat(str(p), {"data": np.ones((4, 4, 2), np.float32)})
    a = _cached_gt(str(p), "data")
    assert _cached_gt(str(p), "data") is a  # cache hit: same device array
    sio.savemat(str(p), {"data": np.zeros((4, 4, 2), np.float32)})
    st = os.stat(str(p))
    os.utime(str(p), ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    b = _cached_gt(str(p), "data")
    assert b is not a
    assert float(np.asarray(b).max()) == 0.0
    assert len(_GT_CACHE) <= 4  # bounded LRU


def test_persistent_saver_cross_epoch(data, trainer, tmp_path):
    """A Trainer-owned saver lets writes outlive evaluate_model; scores are
    available immediately and the files land by close()."""
    low, gt = data
    trainer.eval_saver = _OverlappedSaver(depth=8)
    try:
        scores = evaluate_model(trainer, _store(low), str(tmp_path / "pers"),
                                4, gt)
        assert scores is not None
    finally:
        trainer.eval_saver.close()
        trainer.eval_saver = None
    assert sorted(os.listdir(tmp_path / "pers" / "epoch_4")) == [
        "a.mat", "b.mat", "orphan.mat"]


def test_disk_source_with_persistent_saver_drains_first(data, trainer, tmp_path):
    """eval_metric_source='disk' + persistent saver: the glob walk must see
    this epoch's files (the explicit drain), and scores match memory."""
    low, gt = data
    sm = evaluate_model(trainer, _store(low), str(tmp_path / "m5"), 5, gt)
    trainer.cfg.eval_metric_source = "disk"
    trainer.eval_saver = _OverlappedSaver(depth=8)
    try:
        sd = evaluate_model(trainer, _store(low), str(tmp_path / "d5"), 5, gt)
    finally:
        trainer.eval_saver.close()
        trainer.eval_saver = None
        trainer.cfg.eval_metric_source = "memory"
    assert sd == sm
