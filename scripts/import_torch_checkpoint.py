#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into this framework's
msgpack params file, usable as ``pretrained_model`` for warm starts or placed
as ``model_epoch_latest.ckpt`` for the test phase.

Example:
  python scripts/import_torch_checkpoint.py \\
      checkpoint_ref/model_epoch_latest.pth out/imported.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth_path")
    ap.add_argument("out_path")
    args = ap.parse_args(argv)
    # torch must be imported before jax (TPU client deadlock otherwise)
    import torch  # noqa: F401

    from sshslie_tpu.interop import import_torch_checkpoint

    import_torch_checkpoint(args.pth_path, args.out_path)


if __name__ == "__main__":
    main()
