"""Sharded inference must match single-device inference — XLA SPMD handles
the conv halos / channel-mixing collectives; we verify numerics on the
8-device CPU mesh for both the spatial (height) and spectral (band) layouts."""

import numpy as np
import pytest

import jax

from sshslie_tpu.config import Config
from sshslie_tpu.evaluate import (
    BandShardedInferencer,
    Inferencer,
    ShardedInferencer,
)
from sshslie_tpu.parallel.mesh import make_mesh
from sshslie_tpu.train import build_model, init_params


@pytest.fixture(scope="module")
def model_and_params():
    cfg = Config(channels=6, patch_size=32, attention_impl="xla")
    model = build_model(cfg, 6)
    params = init_params(model, 0, 32)
    return model, params


def test_sharded_matches_single_device(model_and_params, rng):
    model, params = model_and_params
    cube = rng.rand(128, 64, 6).astype(np.float32)
    single = Inferencer(model)
    R1, I1, Id1, S1 = single(params, cube)
    mesh = make_mesh("8")
    sharded = ShardedInferencer(model, mesh)
    R8, I8, Id8, S8 = sharded(params, cube)
    np.testing.assert_allclose(np.asarray(S8), np.asarray(S1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=5e-5)


def test_sharded_handles_unaligned_height(model_and_params, rng):
    """H not divisible by 8·n_devices — edge-pad + crop path.

    Padding changes the global function slightly (attention sees the padded
    tokens), so the oracle is a single-device run with the SAME padding.
    """
    model, params = model_and_params
    cube = rng.rand(100, 64, 6).astype(np.float32)  # W already aligned
    single_padded = Inferencer(model, pad_multiple=64)  # 8 devices × 8
    _, _, _, S1 = single_padded(params, cube)
    sharded = ShardedInferencer(model, make_mesh("8"))
    _, _, _, S8 = sharded(params, cube)
    assert S8.shape == S1.shape
    np.testing.assert_allclose(np.asarray(S8), np.asarray(S1), atol=5e-5)


def test_band_sharded_matches_single_device(rng):
    """Spectral sharding (C across 8 devices): exact vs the dense forward —
    band sharding has no halo effects, only channel-mixing collectives."""
    cfg = Config(channels=16, patch_size=32, attention_impl="xla")
    model = build_model(cfg, 16)
    params = init_params(model, 0, 32)
    cube = rng.rand(40, 48, 16).astype(np.float32)
    R1, I1, Id1, S1 = Inferencer(model)(params, cube)
    banded = BandShardedInferencer(model, make_mesh("8"), band_axis="data")
    R8, I8, Id8, S8 = banded(params, cube)
    assert S8.shape == cube.shape
    np.testing.assert_allclose(np.asarray(S8), np.asarray(S1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Id8), np.asarray(Id1), atol=5e-5)


def test_band_sharded_rejects_uneven_channels():
    """C=6 over 8 devices (non-divisible): pjit cannot shard the axis —
    must fail fast with guidance instead of a cryptic pjit error."""
    cfg = Config(channels=6, patch_size=32, attention_impl="xla")
    model = build_model(cfg, 6)
    with pytest.raises(ValueError, match="divisible"):
        BandShardedInferencer(model, make_mesh("8"), band_axis="data")


def test_evaluate_model_sharded_optin_matches_single_device(tmp_path, rng):
    """eval_sharded: true + a mesh runs spatially-sharded eval. With a cube
    height already divisible by 8·n (no padding) the outputs match the
    single-device path; the flag stays OFF by default because padding a
    non-divisible cube perturbs every output through the global attention."""
    import scipy.io as sio

    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import CubeStore
    from sshslie_tpu.evaluate import (
        Inferencer, ShardedInferencer, _make_inferencer, evaluate_model,
    )
    from sshslie_tpu.parallel.mesh import make_mesh
    from sshslie_tpu.train import Trainer

    d = tmp_path / "eval"
    d.mkdir()
    # H = 64 = 8 devices x 8 → the sharded path needs no padding
    sio.savemat(str(d / "e0.mat"),
                {"data": (rng.rand(64, 24, 4) * 100).astype(np.float32)})
    store = CubeStore(str(d), normalization="self")

    cfg = Config(channels=4, patch_size=16, attention_impl="xla",
                 global_min=0.0, global_max=4095.0)
    cfg.finalize()
    single = Trainer(cfg, channels=4)
    # default: a mesh alone does NOT switch the eval path
    meshed_default = Trainer(cfg, channels=4, mesh=make_mesh("8"))
    assert isinstance(_make_inferencer(single), Inferencer)
    assert isinstance(_make_inferencer(meshed_default), Inferencer)

    cfg_sh = Config(channels=4, patch_size=16, attention_impl="xla",
                    global_min=0.0, global_max=4095.0, eval_sharded=True)
    cfg_sh.finalize()
    meshed = Trainer(cfg_sh, channels=4, mesh=make_mesh("8"))
    meshed.state = meshed.state.replace(params=single.state.params)
    assert isinstance(_make_inferencer(meshed), ShardedInferencer)

    out_s, out_m = tmp_path / "out_s", tmp_path / "out_m"
    evaluate_model(single, store, str(out_s), epoch=1, label_dir=None)
    evaluate_model(meshed, store, str(out_m), epoch=1, label_dir=None)
    a = sio.loadmat(str(out_s / "epoch_1" / "e0.mat"))["data"]
    b = sio.loadmat(str(out_m / "epoch_1" / "e0.mat"))["data"]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


def test_evaluate_model_band_sharded_optin(tmp_path, rng):
    """eval_shard_mode: band dispatches to BandShardedInferencer and the
    eval outputs match the single-device path (channels divisible by the
    mesh axis; band sharding needs no spatial padding beyond /8)."""
    import scipy.io as sio

    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import CubeStore
    from sshslie_tpu.evaluate import (
        BandShardedInferencer, _make_inferencer, evaluate_model,
    )
    from sshslie_tpu.parallel.mesh import make_mesh
    from sshslie_tpu.train import Trainer

    d = tmp_path / "eval"
    d.mkdir()
    sio.savemat(str(d / "e0.mat"),
                {"data": (rng.rand(40, 24, 8) * 100).astype(np.float32)})
    store = CubeStore(str(d), normalization="self")

    cfg = Config(channels=8, patch_size=16, attention_impl="xla",
                 global_min=0.0, global_max=4095.0)
    cfg.finalize()
    single = Trainer(cfg, channels=8)

    cfg_b = Config(channels=8, patch_size=16, attention_impl="xla",
                   global_min=0.0, global_max=4095.0, eval_sharded=True,
                   eval_shard_mode="band")
    cfg_b.finalize()
    meshed = Trainer(cfg_b, channels=8, mesh=make_mesh("8"))
    meshed.state = meshed.state.replace(params=single.state.params)
    assert isinstance(_make_inferencer(meshed), BandShardedInferencer)

    out_s, out_b = tmp_path / "out_s", tmp_path / "out_b"
    evaluate_model(single, store, str(out_s), epoch=1, label_dir=None)
    evaluate_model(meshed, store, str(out_b), epoch=1, label_dir=None)
    a = sio.loadmat(str(out_s / "epoch_1" / "e0.mat"))["data"]
    b = sio.loadmat(str(out_b / "epoch_1" / "e0.mat"))["data"]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


def test_make_inferencer_memoized(rng):
    """Repeated evals must reuse one jitted Inferencer — jit caches on the
    function object, so a fresh lambda per eval epoch re-traces (and fully
    recompiles where the persistent cache is off). Async-eval snapshot views
    share the trainer's model and must hit the same cache entry."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.evaluate import _make_inferencer
    from sshslie_tpu.train import Trainer, _SnapshotView

    cfg = Config(channels=4, patch_size=8, batch_size=1, attention_impl="xla")
    trainer = Trainer(cfg, channels=4)
    inf1 = _make_inferencer(trainer)
    assert _make_inferencer(trainer) is inf1
    view = _SnapshotView(trainer, jax.device_get(trainer.state.params))
    assert _make_inferencer(view) is inf1
