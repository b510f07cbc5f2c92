#!/usr/bin/env python
"""Quantization impact report: PSNR of int8/fp8/int4 weight-only inference vs fp32.

Usage:
  python scripts/quant_report.py --checkpoint checkpoint/m/Decomposition_TS/model_epoch_latest.ckpt \
      --data ./data/test/low --channels 64 --global_max 4095 [--fmt int8,fp8,int4] [--device cpu]

Prints one JSON document: per-format compression ratio and per-cube PSNR of
the quantized output against the fp32 output (data_range 1.0, normalized
domain).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data", required=True, help="directory of .mat cubes")
    ap.add_argument("--channels", type=int, required=True)
    ap.add_argument("--mat_key", default="data")
    ap.add_argument("--normalization", default="global_normalization")
    ap.add_argument("--global_min", type=float, default=0.0)
    ap.add_argument("--global_max", type=float, default=4095.0)
    ap.add_argument("--fmt", default="int8,fp8,int4")
    ap.add_argument("--calibration", default="auto",
                    choices=["auto", "absmax", "mse", "output"],
                    help="clip-scale calibration (auto = output-aware for "
                         "int4, absmax otherwise)")
    ap.add_argument("--calib_data", default="",
                    help="held-out cubes for output-aware calibration "
                         "(default: the --data cubes)")
    ap.add_argument("--use_transformer", default="true",
                    help="must match the checkpoint's architecture")
    ap.add_argument("--use_attention", default="false",
                    help="SEBlock variant; must match the checkpoint")
    ap.add_argument("--device", default="")
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from sshslie_tpu import checkpoints
    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import CubeStore
    from sshslie_tpu.ops.quant import quantization_impact
    from sshslie_tpu.train import build_model, init_params

    from sshslie_tpu.config import parse_bool_flag

    cfg = Config(channels=args.channels, attention_impl="xla",
                 use_transformer=parse_bool_flag(
                     "--use_transformer", args.use_transformer),
                 use_attention=parse_bool_flag(
                     "--use_attention", args.use_attention))
    model = build_model(cfg, args.channels)
    params = init_params(model, cfg.seed_value, cfg.patch_size)
    params, _ = checkpoints.load_pretrained_params(args.checkpoint, params)
    store = CubeStore(
        args.data, mat_key=args.mat_key, normalization=args.normalization,
        global_min=args.global_min, global_max=args.global_max,
    )
    calib_cubes = None
    if args.calib_data:
        calib_cubes = CubeStore(
            args.calib_data, mat_key=args.mat_key,
            normalization=args.normalization,
            global_min=args.global_min, global_max=args.global_max,
        ).cubes
    report = {"checkpoint": args.checkpoint, "files": store.basenames()}
    for fmt in args.fmt.split(","):
        fmt = fmt.strip()
        r = quantization_impact(model, params, store.cubes, fmt,
                                calibration=args.calibration,
                                calib_cubes=calib_cubes)
        report[fmt] = {k: v for k, v in r.items() if k != "fmt"}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
