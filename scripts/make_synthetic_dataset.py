#!/usr/bin/env python
"""Generate a synthetic low-light HSI dataset in the reference's layout.

Creates smooth random spectral scenes, darkens them with a spatially-varying
low illumination (the Retinex generative model the network assumes), adds
sensor noise, and writes train/eval/test splits plus bright ground truth:

  <out>/low/train/*.mat   <out>/low/eval/*.mat   <out>/low/test/*.mat
  <out>/high/eval/*.mat   <out>/high/test/*.mat

plus a ready-to-run ``<out>/config.yml``. Try the framework end-to-end:

  python scripts/make_synthetic_dataset.py --out ./synth
  python main.py --config ./synth/config.yml
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import scipy.io as sio
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scene(rng, size, channels, data_max):
    """Smooth spectral scene (bilinear-upsampled random low-res cube)."""
    import scipy.ndimage as ndi

    low = rng.rand(max(size // 16, 2), max(size // 16, 2), channels)
    zoom = (size / low.shape[0], size / low.shape[1], 1)
    scene = ndi.zoom(low, zoom, order=1)[:size, :size]
    return np.clip(scene * data_max, 0, data_max)


def darken(rng, scene, data_max, noise):
    """Low-light observation: scene × smooth low illumination + noise."""
    import scipy.ndimage as ndi

    h, w, _ = scene.shape
    illum = 0.05 + 0.15 * ndi.zoom(rng.rand(max(h // 32, 2), max(w // 32, 2)),
                                   (h / max(h // 32, 2), w / max(w // 32, 2)),
                                   order=1)[:h, :w, None]
    obs = scene * illum + rng.randn(h, w, 1) * noise
    return np.clip(obs, 0, data_max).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./synth")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--train", type=int, default=4)
    ap.add_argument("--eval", type=int, default=1)
    ap.add_argument("--test", type=int, default=2)
    ap.add_argument("--data_max", type=float, default=4095.0)
    ap.add_argument("--noise", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    for sub in ("low/train", "low/eval", "low/test", "high/eval", "high/test"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    def write(split, n, with_gt):
        for i in range(n):
            scene = make_scene(rng, args.size, args.channels, args.data_max)
            name = f"{split.split('/')[-1]}{i}.mat"
            sio.savemat(os.path.join(args.out, "low", split.split("/")[-1], name),
                        {"data": darken(rng, scene, args.data_max, args.noise)})
            if with_gt:
                sio.savemat(os.path.join(args.out, "high", split.split("/")[-1], name),
                            {"data": scene.astype(np.float32)})
                if split == "eval":
                    # Mid-training eval scores against label_dir (one GT dir
                    # for both phases, reference semantics) — the eval GT
                    # must ALSO sit there, or every eval epoch logs
                    # 'metrics skipped: no pairs'.
                    sio.savemat(os.path.join(args.out, "high", "test", name),
                                {"data": scene.astype(np.float32)})

    write("train", args.train, with_gt=False)
    write("eval", args.eval, with_gt=True)
    write("test", args.test, with_gt=True)

    cfg = dict(
        channels=args.channels, global_min=0.0, global_max=args.data_max,
        batch_size=2, patch_size=min(128, args.size // 2),
        epoch=args.epochs, eval_every_epoch=max(args.epochs // 2, 1),
        plot_every_epoch=max(args.epochs // 2, 1), phase="train_and_test",
        train_data=os.path.join(args.out, "low", "train"),
        eval_data=os.path.join(args.out, "low", "eval"),
        test_data=os.path.join(args.out, "low", "test"),
        label_dir=os.path.join(args.out, "high", "test"),
        model_name="synth", start_lr=1e-3,
    )
    cfg_path = os.path.join(args.out, "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    print(f"Wrote {args.train}+{args.eval}+{args.test} cubes "
          f"({args.size}²×{args.channels}) and {cfg_path}")
    print(f"Run: python main.py --config {cfg_path}")


if __name__ == "__main__":
    main()
