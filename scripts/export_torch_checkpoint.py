#!/usr/bin/env python
"""Export a TPU-trained checkpoint to the reference's PyTorch ``.pth`` format.

Usage:
  python scripts/export_torch_checkpoint.py --checkpoint checkpoint/m/Decomposition_TS/model_epoch_latest.ckpt \
      --channels 64 --out model_epoch_latest.pth

The output loads directly into the reference ``LowLightEnhance`` via its
``load_checkpoint`` / pretrained paths (reference model.py:603-607,
main.py:196-212), so models trained here can be evaluated or fine-tuned in
the original repo.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="our .ckpt file")
    ap.add_argument("--channels", type=int, required=True)
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--use_transformer", default="true")
    ap.add_argument("--use_attention", default="false",
                    help="SEBlock variant; must match the checkpoint")
    args = ap.parse_args(argv)

    import torch  # noqa: F401  (must import before jax on shared hosts)

    from sshslie_tpu import checkpoints
    from sshslie_tpu.config import Config
    from sshslie_tpu.interop import export_torch_checkpoint
    from sshslie_tpu.train import build_model, init_params

    from sshslie_tpu.config import parse_bool_flag

    # A typo ('ture') silently built the wrong template and failed later on
    # a confusing param-structure mismatch — validate both arch flags.
    cfg = Config(
        channels=args.channels, attention_impl="xla",
        use_transformer=parse_bool_flag(
            "--use_transformer", args.use_transformer),
        use_attention=parse_bool_flag("--use_attention", args.use_attention),
    )
    model = build_model(cfg, args.channels)
    template = init_params(model, cfg.seed_value, cfg.patch_size)
    params, epoch = checkpoints.load_pretrained_params(args.checkpoint, template)
    export_torch_checkpoint(params, args.out, epoch=epoch)


if __name__ == "__main__":
    main()
