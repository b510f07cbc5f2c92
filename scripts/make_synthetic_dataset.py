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


def make_scene(rng, size, channels, data_max, kind="smooth"):
    """Synthetic spectral scene.

    'smooth'  bilinear-upsampled random low-res cube (round-1 default; no
              spatial structure — trains, but the enhanced output shows the
              brightness-plateau effect, docs/PERFORMANCE.md).
    'blocks'  piecewise scene: ~12 overlapping rectangles, each with its own
              smooth spectrum (2-3 Gaussian bumps over the band axis) on a
              textured albedo — gives the self-supervised losses real
              reflectance structure to latch onto, so galleries/demos show
              recognizable regions instead of noise."""
    import scipy.ndimage as ndi

    if kind == "smooth":
        low = rng.rand(max(size // 16, 2), max(size // 16, 2), channels)
        zoom = (size / low.shape[0], size / low.shape[1], 1)
        scene = ndi.zoom(low, zoom, order=1)[:size, :size]
        return np.clip(scene * data_max, 0, data_max)

    bands = np.arange(channels, dtype=np.float64)

    def spectrum():
        s = np.full(channels, 0.08 + 0.12 * rng.rand())
        for _ in range(rng.randint(2, 4)):
            c = rng.rand() * channels
            wdt = channels * (0.08 + 0.25 * rng.rand())
            s = s + (0.3 + 0.7 * rng.rand()) * np.exp(
                -0.5 * ((bands - c) / wdt) ** 2)
        return np.clip(s / s.max(), 0.02, 1.0)

    scene = np.ones((size, size, 1)) * spectrum()[None, None, :] * 0.35
    for _ in range(12):
        x0, y0 = rng.randint(0, size, 2)
        wdt, hgt = rng.randint(size // 8, size // 2, 2)
        scene[y0:y0 + hgt, x0:x0 + wdt, :] = spectrum()[None, None, :]
    # gentle spatial texture so reflectance isn't piecewise-constant
    tex = ndi.zoom(rng.rand(max(size // 8, 2), max(size // 8, 2)),
                   (size / max(size // 8, 2),) * 2, order=1)[:size, :size]
    scene = scene * (0.75 + 0.5 * tex[..., None])
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
    ap.add_argument("--scene", default="smooth", choices=["smooth", "blocks"])
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    for sub in ("low/train", "low/eval", "low/test", "high/eval", "high/test"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    def write(split, n, with_gt):
        for i in range(n):
            scene = make_scene(rng, args.size, args.channels, args.data_max,
                               kind=args.scene)
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
