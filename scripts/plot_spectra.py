#!/usr/bin/env python
"""False-color composites + windowed-mean spectra at probe points across
algorithm outputs — CLI replacement for the reference's hardcoded-path
``plot_spectra.py`` (and the interactive MATLAB drag*.m inspectors).

Example:
  python scripts/plot_spectra.py --out out/spectra \\
      --cube "Ground Truth=data/high/test/486.mat" \\
      --cube "SS-HSLIE (Ours)=results/test_results_x/486.mat" \\
      --cube "Low-light=data/low/test/486.mat" \\
      --point 272,149 --point 110,71 \\
      --wave_start 414.63 --wave_end 985.05
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.io as sio


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--cube", action="append", required=True,
                    help="label=path.mat[:mat_key]; first is rendered as the composite")
    ap.add_argument("--point", action="append", required=True,
                    help="x,y probe location; repeatable")
    ap.add_argument("--out", required=True)
    ap.add_argument("--wave_start", type=float, required=True)
    ap.add_argument("--wave_end", type=float, required=True)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--palette", default="indoor", choices=["indoor", "jyu", "true"])
    ap.add_argument("--fmt", default="png", choices=["png", "eps", "pdf"])
    args = ap.parse_args(argv)

    from sshslie_tpu import viz

    from sshslie_tpu.utils.io_hsi import load_hsi, split_cube_spec

    cubes = {}
    for spec in args.cube:
        # Shared label/path splitting (handles bare paths and '=' inside
        # directory names); the trailing ':key' is this script's extension.
        label, rest = split_cube_spec(spec)
        path, _, key = rest.partition(":")
        if not path:
            raise SystemExit(f"--cube {spec!r}: empty path")
        label = label or os.path.splitext(os.path.basename(path))[0]
        while label in cubes:  # duplicates stay visible, never overwrite
            label += "_"
        # load_hsi, not raw loadmat: reads v7.3/HDF5 too (save_hsi auto-emits
        # v7.3 for cubes ≥ 2 GiB — results must stay plottable).
        cubes[label] = np.asarray(
            load_hsi(path, mat_key=key or "data", normalization=None),
            dtype=np.float64,
        )

    points = [tuple(int(v) for v in p.split(",")) for p in args.point]
    os.makedirs(args.out, exist_ok=True)

    targets = {"indoor": viz.FALSE_COLOR_INDOOR, "jyu": viz.FALSE_COLOR_JYU,
               "true": viz.TRUE_COLOR}[args.palette]
    first_label, first_cube = next(iter(cubes.items()))
    rgb = viz.false_color(first_cube, args.wave_start, args.wave_end,
                          targets_nm=targets, normalization="zeroOne")
    img_path = viz.save_false_color_figure(
        rgb, os.path.join(args.out, f"composite.{args.fmt}"), points=points,
        title=first_label,
    )
    print("wrote", img_path)

    highlight = {}
    for label in cubes:
        if "Ours" in label:
            highlight[label] = dict(linewidth=3.5, color="r", linestyle="-")
        elif "Ground Truth" in label:
            highlight[label] = dict(linewidth=3.5, color="b", linestyle="-")
        elif "Low" in label:
            highlight[label] = dict(linewidth=3.5, color="g", linestyle="--")
    for p in viz.plot_spectra_at_points(cubes, points, args.out,
                                        window_size=args.window,
                                        highlight=highlight, fmt=args.fmt):
        print("wrote", p)


if __name__ == "__main__":
    main()
