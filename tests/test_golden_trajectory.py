"""Golden-trajectory regression net.

The cross-builder equality tests (plain vs fused vs multistep) can't catch a
change that shifts ALL pipelines at once — e.g. someone "fixing" a reproduced
reference quirk (PARITY #1/#9/#11), reweighting a loss term, or altering the
threefry sampling fold. This pins the absolute loss trajectory of a fixed
config+seed+dataset on the CPU backend.

If this fails after an INTENTIONAL semantic change: re-derive the constants
with the generator below, and record the decision in docs/PARITY.md first.

Generator (run on the CPU test backend):
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=5,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="on", seed_value=41)
    + 4 cubes of RandomState(20260816).rand(24,24,6)*100, normalization='self'
"""

import numpy as np
import pytest

from sshslie_tpu.config import Config
from sshslie_tpu.data.datasets import CubeStore
from sshslie_tpu.train import Trainer

GOLDEN_TOTAL = [4.271433, 3.978681, 3.584191, 3.636757, 3.493603]
GOLDEN_RECON = [0.307095, 0.285751, 0.259929, 0.264429, 0.256835]
# host pipeline, sampler='python' (PCG64 stream — a different trajectory
# from the fused threefry one by design, PARITY #19)
GOLDEN_HOST_TOTAL = [4.275645, 3.852007, 3.565185, 3.58645, 3.462177]


@pytest.fixture
def dataset(tmp_path):
    import scipy.io as sio

    rng = np.random.RandomState(20260816)
    for i in range(4):
        sio.savemat(str(tmp_path / f"c{i}.mat"),
                    {"data": (rng.rand(24, 24, 6) * 100).astype(np.float32)})
    return str(tmp_path)


def test_fused_trajectory_matches_golden(dataset, tmp_path):
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=5,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="on", seed_value=41)
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(CubeStore(dataset, normalization="self"),
                ckpt_dir=str(tmp_path / "ck"))
    # rel 2e-4: same backend and graph, tolerance only for XLA version drift
    # in f32 reduction/fusion choices.
    np.testing.assert_allclose(
        trainer.all_epoch_losses["total_loss"], GOLDEN_TOTAL, rtol=2e-4)
    np.testing.assert_allclose(
        trainer.all_epoch_losses["L_reconstruction"], GOLDEN_RECON, rtol=2e-4)


def test_host_pipeline_trajectory_matches_golden(dataset, tmp_path):
    """Same net, host pipeline + Python sampler: pins the PCG64 crop/augment
    stream and the Prefetcher path."""
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=5,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", fused_pipeline="off",
                 sampler="python", seed_value=41)
    cfg.finalize()
    trainer = Trainer(cfg, channels=6)
    trainer.fit(CubeStore(dataset, normalization="self"),
                ckpt_dir=str(tmp_path / "ck_host"))
    np.testing.assert_allclose(
        trainer.all_epoch_losses["total_loss"], GOLDEN_HOST_TOTAL, rtol=2e-4)
