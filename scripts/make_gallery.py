#!/usr/bin/env python
"""Build the before/after results gallery (VERDICT r3 missing #1).

The reference demonstrates its output with committed false-color PNG pairs
(/root/reference/results/before/*.png, /root/reference/results/after/*.png).
This script produces the equivalent from a finished run of THIS framework:
for every (low input, enhanced output) cube pair it writes

  <out>/before/<name>.png       false-color composite of the raw low cube
  <out>/after/<name>.png        false-color composite of the enhanced cube
  <out>/grid_<name>.png         side-by-side (+ GT when --gt_dir is given)
  <out>/spectra_<name>.png      probe-point spectra low vs enhanced (vs GT)

Both composites share ONE normalization (default divideGlobalMax with
--data_max) so the enhancement is visible instead of being normalized away
— per-image zeroOne would rescale the dark input to full range.

Usage (after a train_and_test run):
  python scripts/make_gallery.py \
      --low_dir data/low/test --enhanced_dir results/test_results_<name>/<ts> \
      [--gt_dir data/high/test] --out docs/gallery \
      --wave_start 414.63 --wave_end 985.05 --data_max 4095 \
      [--preset jyu|indoor|true] [--points 30,40 90,120] [--gamma 1.8]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sshslie_tpu.utils.io_hsi import load_hsi  # noqa: E402
from sshslie_tpu import viz  # noqa: E402


def _pairs(low_dir: str, enhanced_dir: str):
    lows = {}
    for p in sorted(glob.glob(os.path.join(low_dir, "*.mat")) +
                    glob.glob(os.path.join(low_dir, "*.hdr"))):
        lows[os.path.splitext(os.path.basename(p))[0]] = p
    out = []
    for p in sorted(glob.glob(os.path.join(enhanced_dir, "*.mat"))):
        base = os.path.splitext(os.path.basename(p))[0]
        key = base
        # test outputs may carry suffixes like `_S` / `_epoch`; match prefix.
        # Longest match wins so `test10_S` pairs with `test10`, not `test1`;
        # warn instead of silently dropping when nothing matches.
        if key not in lows:
            hits = [k for k in lows if base.startswith(k)]
            if not hits:
                print(f"make_gallery: no low input matches enhanced cube "
                      f"{os.path.basename(p)!r} — skipped")
                continue
            key = max(hits, key=len)
        out.append((key, lows[key], p))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--low_dir", required=True)
    ap.add_argument("--enhanced_dir", required=True)
    ap.add_argument("--gt_dir", default="")
    ap.add_argument("--out", default="docs/gallery")
    ap.add_argument("--wave_start", type=float, default=414.63)
    ap.add_argument("--wave_end", type=float, default=985.05)
    ap.add_argument("--data_max", type=float, default=4095.0,
                    help="shared normalization ceiling (dataset global max)")
    ap.add_argument("--preset", default="jyu",
                    choices=["indoor", "jyu", "true"])
    ap.add_argument("--gamma", type=float, default=1.8,
                    help="display gamma on both composites (1.0 = linear)")
    ap.add_argument("--points", nargs="*", default=["40,40"],
                    help="probe points 'x,y' for the spectra figures")
    ap.add_argument("--mat_key", default="data")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    targets = {"indoor": viz.FALSE_COLOR_INDOOR, "jyu": viz.FALSE_COLOR_JYU,
               "true": viz.TRUE_COLOR}[args.preset]
    points = [tuple(int(v) for v in p.split(",")) for p in args.points]

    pairs = _pairs(args.low_dir, args.enhanced_dir)
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        raise SystemExit("no (low, enhanced) cube pairs found")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for sub in ("before", "after"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    def composite(cube):
        rgb = viz.false_color(
            cube, args.wave_start, args.wave_end, targets_nm=targets,
            normalization="divideGlobalMax", global_max=args.data_max)
        if args.gamma != 1.0:
            rgb = np.clip(rgb, 0.0, 1.0) ** (1.0 / args.gamma)
        return np.clip(rgb, 0.0, 1.0)

    written = []
    for name, low_path, enh_path in pairs:
        low = np.asarray(load_hsi(low_path, args.mat_key), np.float32)
        enh = np.asarray(load_hsi(enh_path, args.mat_key), np.float32)
        rgb_lo, rgb_en = composite(low), composite(enh)
        for sub, rgb in (("before", rgb_lo), ("after", rgb_en)):
            p = os.path.join(args.out, sub, f"{name}.png")
            plt.imsave(p, rgb)
            written.append(p)

        grid = {"low input": rgb_lo, "enhanced (ours)": rgb_en}
        cubes = {"low input": low, "enhanced (ours)": enh}
        if args.gt_dir:
            gt_path = os.path.join(args.gt_dir, os.path.basename(low_path))
            if os.path.exists(gt_path):
                gt = np.asarray(load_hsi(gt_path, args.mat_key), np.float32)
                grid["ground truth"] = composite(gt)
                cubes["ground truth"] = gt
        viz.comparison_grid(grid, os.path.join(args.out, f"grid_{name}.png"))
        written.append(os.path.join(args.out, f"grid_{name}.png"))

        paths = viz.plot_spectra_at_points(
            cubes, points, args.out, prefix=f"spectra_{name}")
        written.extend(paths)

    print(f"gallery: {len(written)} files under {args.out}")
    for p in written:
        print(" ", p)
    return written


if __name__ == "__main__":
    main()
