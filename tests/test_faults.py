"""Fault handling: torn/corrupt/foreign files must fail with actionable
errors, and atomic writes must never leave a torn 'latest'.

The reference has no failure story beyond a catch-all traceback
(main.py:266-276); these pin the framework's own guarantees.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sshslie_tpu import checkpoints


@pytest.fixture
def tree():
    return {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}


def test_corrupt_checkpoint_names_path(tmp_path, tree):
    p = tmp_path / "model_epoch_latest.ckpt"
    p.write_bytes(b"\x00garbage not msgpack" * 7)
    with pytest.raises(ValueError, match="not a readable checkpoint"):
        checkpoints.load_checkpoint(str(p), tree, tree)
    with pytest.raises(ValueError, match="not a readable checkpoint"):
        checkpoints.load_pretrained_params(str(p), tree)


def test_wrong_payload_checkpoint(tmp_path, tree):
    """A valid msgpack file that is not a training checkpoint."""
    from flax import serialization

    p = tmp_path / "foreign.ckpt"
    p.write_bytes(serialization.msgpack_serialize({"weights": np.ones(3)}))
    with pytest.raises(ValueError, match="no 'params'"):
        checkpoints.load_checkpoint(str(p), tree, tree)


def test_load_raw_params_refuses_paramsless_checkpoint(tmp_path, tree):
    """A checkpoint-shaped blob (metadata keys) without a params subtree must
    be refused by the template-free loader, not exported as a params tree —
    while a genuine bare-params file still passes through."""
    from flax import serialization

    p = tmp_path / "torn.ckpt"
    p.write_bytes(serialization.msgpack_serialize(
        {"format_version": 1, "epoch": 3}))
    with pytest.raises(ValueError, match="no 'params'"):
        checkpoints.load_raw_params(str(p))

    bare = tmp_path / "bare.ckpt"
    bare.write_bytes(serialization.msgpack_serialize(
        {"Dense_0": {"kernel": np.ones((2, 2), np.float32)}}))
    out = checkpoints.load_raw_params(str(bare))
    np.testing.assert_array_equal(out["Dense_0"]["kernel"], np.ones((2, 2)))


def test_atomic_write_leaves_no_torn_latest(tmp_path, tree, monkeypatch):
    """A crash mid-write (simulated by failing the tmp write) must leave the
    previous 'latest' checkpoint untouched and loadable."""
    path = str(tmp_path / "model_epoch_latest")
    checkpoints.save_checkpoint(path, tree, tree, epoch=1)

    real_open = open

    def exploding_open(file, mode="r", *a, **kw):
        if str(file).endswith(".tmp") and "w" in mode:
            fh = real_open(file, mode, *a, **kw)
            fh.write(b"torn")
            fh.close()
            raise OSError("disk full (simulated)")
        return real_open(file, mode, *a, **kw)

    import builtins

    monkeypatch.setattr(builtins, "open", exploding_open)
    with pytest.raises(OSError, match="disk full"):
        checkpoints.save_checkpoint(path, tree, tree, epoch=2)
    monkeypatch.undo()

    params, _, epoch = checkpoints.load_checkpoint(
        path + checkpoints.CKPT_SUFFIX, tree, tree
    )
    assert epoch == 1
    np.testing.assert_array_equal(np.asarray(params["w"]), np.ones((3, 3)))


def test_truncated_mat_raises(tmp_path):
    import scipy.io as sio

    from sshslie_tpu.utils.io_hsi import load_hsi

    p = tmp_path / "cube.mat"
    sio.savemat(str(p), {"data": np.ones((4, 4, 2), np.float32)})
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) // 3])
    with pytest.raises(Exception):  # scipy raises ValueError/EOFError variants
        load_hsi(str(p))


def test_missing_mat_key_lists_available(tmp_path):
    import scipy.io as sio

    from sshslie_tpu.utils.io_hsi import load_hsi

    p = tmp_path / "cube.mat"
    sio.savemat(str(p), {"other": np.ones((4, 4, 2), np.float32)})
    with pytest.raises(KeyError, match="other"):
        load_hsi(str(p), mat_key="data")


def _store(tmp_path, rng, h=20, w=20, c=4, n=1):
    import scipy.io as sio

    from sshslie_tpu.data.datasets import CubeStore

    d = tmp_path / "train"
    d.mkdir(exist_ok=True)
    for i in range(n):
        sio.savemat(str(d / f"c{i}.mat"),
                    {"data": (rng.rand(h, w, c) * 100).astype(np.float32)})
    return CubeStore(str(d), normalization="self")


def test_fit_rejects_oversized_patch(tmp_path, rng):
    """patch_size > smallest cube side fails at fit start with a clear
    message, not steps later inside a gather (reference crashes at
    model.py:306-307)."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.train import Trainer

    cfg = Config(channels=4, patch_size=64, batch_size=1, epoch=1,
                 attention_impl="xla")
    cfg.finalize()
    trainer = Trainer(cfg, channels=4)
    with pytest.raises(ValueError, match="patch_size 64 exceeds"):
        trainer.fit(_store(tmp_path, rng), ckpt_dir=str(tmp_path / "ck"))


def test_fit_rejects_channel_mismatch(tmp_path, rng):
    """Explicit channels that contradict the data fail at fit start naming
    both values and the file (not a flax ScopeParamShapeError)."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.train import Trainer

    cfg = Config(channels=9, patch_size=8, batch_size=1, epoch=1,
                 attention_impl="xla")
    cfg.finalize()
    trainer = Trainer(cfg, channels=9)
    with pytest.raises(ValueError, match="9 channels.*has 4"):
        trainer.fit(_store(tmp_path, rng), ckpt_dir=str(tmp_path / "ck"))


def test_params_only_checkpoint_actionable_resume_error(tmp_path, tree):
    """A params-only warm-start file copied over model_epoch_latest must fail
    resume with guidance toward pretrained_model, not KeyError('opt_state')."""
    from flax import serialization

    p = tmp_path / "model_epoch_latest.ckpt"
    p.write_bytes(serialization.msgpack_serialize(
        {"params": serialization.to_state_dict(tree)}
    ))
    with pytest.raises(ValueError, match="params-only"):
        checkpoints.load_checkpoint(str(p), tree, tree)
    # ...while the warm-start path accepts exactly this file.
    params, epoch = checkpoints.load_pretrained_params(str(p), tree)
    assert epoch is None


def test_fit_rejects_indivisible_batch_on_mesh(tmp_path, rng):
    """batch_size not divisible by the data mesh axis fails at fit start
    with the shard_batch_size message, not a GSPMD error in the prefetch
    thread."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.parallel.mesh import make_mesh
    from sshslie_tpu.train import Trainer

    cfg = Config(channels=4, patch_size=16, batch_size=3, epoch=1,
                 fused_pipeline="off", attention_impl="xla")
    cfg.finalize()
    trainer = Trainer(cfg, channels=4, mesh=make_mesh("2"))
    with pytest.raises(ValueError, match="not divisible by data-parallel"):
        # n=3 cubes: one full batch per epoch, so the zero-step guard
        # (PARITY #23) stays quiet and the mesh check is what fires.
        trainer.fit(_store(tmp_path, rng, n=3), ckpt_dir=str(tmp_path / "ck"))


def test_make_mesh_rejects_3d_without_names():
    from sshslie_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="1-D or 2-D"):
        make_mesh("2x2x2")
    with pytest.raises(ValueError, match="does not match"):
        make_mesh("4x2", axis_names=("data",))


def test_checkpoint_format_versioning(tmp_path, tree):
    """Checkpoints carry a format_version (VERDICT r3): current files
    round-trip, pre-versioning files (no field) still load, and a
    future-version file is refused with a versioned error, not a msgpack
    traceback."""
    from flax import serialization

    path = str(tmp_path / "model_epoch_latest")
    checkpoints.save_checkpoint(path, tree, tree, epoch=3)
    full = path + checkpoints.CKPT_SUFFIX
    with open(full, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    assert int(np.asarray(raw["format_version"])) == checkpoints.FORMAT_VERSION
    _, _, epoch = checkpoints.load_checkpoint(full, tree, tree)
    assert epoch == 3

    # Pre-versioning layout (rounds 1-3 wrote no format_version) still loads.
    legacy = raw.copy()
    del legacy["format_version"]
    p_old = tmp_path / "legacy.ckpt"
    p_old.write_bytes(serialization.msgpack_serialize(legacy))
    _, _, epoch = checkpoints.load_checkpoint(str(p_old), tree, tree)
    assert epoch == 3

    # A future format is refused with a clear, versioned message.
    future = raw.copy()
    future["format_version"] = np.asarray(99, dtype=np.int64)
    p_new = tmp_path / "future.ckpt"
    p_new.write_bytes(serialization.msgpack_serialize(future))
    with pytest.raises(ValueError, match="format v99.*reads up to v1"):
        checkpoints.load_checkpoint(str(p_new), tree, tree)
    with pytest.raises(ValueError, match="format v99"):
        checkpoints.load_pretrained_params(str(p_new), tree)
