#!/usr/bin/env python
"""Library quickstart: train, infer, quantize, and score WITHOUT the CLI.

Runs on CPU in ~2 minutes on synthetic cubes; swap `device="cpu"` for the
default TPU backend and point the stores at real data for actual runs.
Companion to docs/API.md; the CLI equivalent of all of this is
`python main.py --config <yml>` (see README.md).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import scipy.io as sio

# Repo-checkout convenience; unnecessary once `pip install sshslie-tpu`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_train: int = 3, size: int = 48, bands: int = 12):
    """Reference-layout synthetic data: dim 'low' cubes + bright 'high' GT."""
    rng = np.random.RandomState(0)
    for sub in ("low/train", "low/eval", "high/eval"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n_train):
        bright = rng.rand(size, size, bands).astype(np.float32) * 3800 + 200
        sio.savemat(os.path.join(root, f"low/train/c{i}.mat"),
                    {"data": bright * 0.12})
    bright = rng.rand(size, size, bands).astype(np.float32) * 3800 + 200
    sio.savemat(os.path.join(root, "low/eval/e0.mat"), {"data": bright * 0.12})
    sio.savemat(os.path.join(root, "high/eval/e0.mat"), {"data": bright})


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any jax use (docs/API.md)

    from sshslie_tpu import checkpoints, metrics
    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import store_from_config
    from sshslie_tpu.evaluate import Inferencer
    from sshslie_tpu.ops.quant import QuantizedInferencer, quantize_tree
    from sshslie_tpu.train import Trainer

    workdir = tempfile.mkdtemp(prefix="sshslie_quickstart_")
    os.chdir(workdir)  # run dirs (checkpoint/ results/ logs/) land here
    make_dataset("data")

    cfg = Config(
        channels=12, patch_size=24, batch_size=2, epoch=4,
        eval_every_epoch=2, plot_every_epoch=10,
        global_min=200.0, global_max=4095.0,
        train_data="./data/low/train", eval_data="./data/low/eval",
        label_dir="./data/high/eval",
        model_name="quickstart", attention_impl="xla", device="cpu",
    ).finalize()  # derive timestamp + run dirs (load_config does this for YAML)

    # -- train ------------------------------------------------------------
    trainer = Trainer(cfg, channels=cfg.channels)
    train_store = store_from_config(cfg, cfg.train_data)
    trainer.fit(train_store)  # eval_store/evaluator optional — pure training

    # -- checkpoint round-trip --------------------------------------------
    ckpt_dir = os.path.join(cfg.model_ckpt_dir, "Decomposition_" + cfg.timestamp)
    params, _, epoch = checkpoints.load_checkpoint(
        checkpoints.latest_path(ckpt_dir),
        trainer.state.params, trainer.state.opt_state,
    )
    print(f"restored epoch {epoch} from {ckpt_dir}")

    # -- full-cube inference ----------------------------------------------
    eval_store = store_from_config(cfg, cfg.eval_data)
    cube = eval_store.cubes[0]
    infer = Inferencer(trainer.model, pad_multiple=8)
    _, _, _, S = infer(params, cube)

    # -- quantized inference (weight-only int8) ---------------------------
    qparams, _ = quantize_tree(params, fmt="int8")
    qinfer = QuantizedInferencer(trainer.model, qparams, pad_multiple=8)
    _, _, _, S_q = qinfer(None, cube)
    quant_psnr = float(metrics.psnr(S_q, S, data_range=float(np.asarray(S).max())))
    print(f"int8 vs fp32 enhanced-output PSNR: {quant_psnr:.1f} dB")

    # -- score vs ground truth (denormalized, reference semantics) --------
    from sshslie_tpu.utils.io_hsi import inverse_global_normalization

    gt = sio.loadmat("data/high/eval/e0.mat")["data"].astype(np.float32)
    S_den = inverse_global_normalization(
        np.asarray(S), cfg.global_min, cfg.global_max)
    psnr = float(metrics.psnr(S_den, gt, data_range=cfg.global_max))
    print(f"enhanced vs GT: PSNR {psnr:.2f} dB  (raw input was darkened 8.3x)")
    print(f"workdir: {workdir}")


if __name__ == "__main__":
    main()
