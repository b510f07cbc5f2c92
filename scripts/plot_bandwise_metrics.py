#!/usr/bin/env python
"""Per-wavelength MPSNR/MSSIM comparison curves across algorithm output dirs.

CLI replacement for the reference's ``plot_psnr_ssim.py`` (hardcoded-path
``__main__`` script): each ``--algo label=dir[:key]`` contributes one curve of
dataset-averaged per-band PSNR/SSIM, plotted against the wavelength axis from
``select_hsi_wavelengths``. The reference's random perturbation of competitor
metric vectors (plot_psnr_ssim.py:230-245) is deliberately NOT reproduced
(SURVEY.md §2 P17: document-only).

Example:
  python scripts/plot_bandwise_metrics.py \\
      --label_dir data/high/test --out out/bandwise \\
      --algo "SS-HSLIE (Ours)=results/test_results_x" \\
      --algo "Low-light=data/low/test" \\
      --wave_start 414.63 --wave_end 985.05 --data_max 4095
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def parse_algo(spec: str):
    label, sep, rest = spec.partition("=")
    if not sep or not rest:
        # Without this, a forgotten 'Label=' prefix made path='' and the
        # metrics silently globbed *.mat in the CWD under a wrong label.
        raise SystemExit(
            f"--algo {spec!r} must be 'Label=pred_dir[:mat_key]'"
        )
    path, _, key = rest.partition(":")
    return label, path, (key or "data")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--label_dir", required=True, help="ground-truth .mat dir")
    ap.add_argument("--label_key", default="data")
    ap.add_argument("--algo", action="append", required=True,
                    help="label=pred_dir[:mat_key]; repeatable")
    ap.add_argument("--out", required=True, help="output dir for figures")
    ap.add_argument("--data_max", type=float, default=None)
    ap.add_argument("--wave_start", type=float, default=None)
    ap.add_argument("--wave_end", type=float, default=None)
    ap.add_argument("--fmt", default="png", choices=["png", "eps", "pdf"])
    args = ap.parse_args(argv)

    from sshslie_tpu.metrics import multi_img_bandwise_metrics

    curves = {}
    for spec in args.algo:
        label, path, key = parse_algo(spec)
        psnr_vec, ssim_vec = multi_img_bandwise_metrics(
            path, args.label_dir, data_max=args.data_max,
            mat_key_prediction=key, mat_key_gt=args.label_key,
        )
        curves[label] = (psnr_vec, ssim_vec)
        print(f"{label}: MPSNR={psnr_vec.mean():.3f} dB  MSSIM={ssim_vec.mean():.4f}")

    n_bands = len(next(iter(curves.values()))[0])
    if args.wave_start is not None and args.wave_end is not None:
        x = np.linspace(args.wave_start, args.wave_end, n_bands)
        xlabel = "Wavelength (nm)"
    else:
        x = np.arange(n_bands)
        xlabel = "Band Number"

    os.makedirs(args.out, exist_ok=True)
    for metric_idx, (name, ylabel) in enumerate([("mpsnr", "MPSNR (dB)"),
                                                 ("mssim", "MSSIM")]):
        # Fresh cycle per figure: a shared one left each algorithm with
        # DIFFERENT linestyles in the paired MPSNR/MSSIM plots.
        styles = itertools.cycle(["-", "--", "-.", ":"])
        plt.figure(figsize=(12, 7))
        for (label, vecs), ls in zip(curves.items(), styles):
            lw = 3.0 if "Ours" in label else 1.8
            plt.plot(x, vecs[metric_idx], linestyle=ls, linewidth=lw, label=label)
        plt.xlabel(xlabel)
        plt.ylabel(ylabel)
        plt.grid(True, alpha=0.4)
        plt.legend(loc="best", ncol=2, fontsize=9)
        plt.tight_layout()
        path = os.path.join(args.out, f"{name}_bandwise.{args.fmt}")
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close()
        print("wrote", path)


if __name__ == "__main__":
    main()
