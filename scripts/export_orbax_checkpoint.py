#!/usr/bin/env python
"""Export a sshslie checkpoint's params as an Orbax StandardCheckpoint
directory — the JAX ecosystem's common on-disk format, restorable by any
orbax-based stack without this package.

Example:
  python scripts/export_orbax_checkpoint.py \\
      checkpoint/m/Decomposition_TS/model_epoch_latest.ckpt out/orbax_params
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_path")
    ap.add_argument("out_dir", help="must not already exist (Orbax atomicity)")
    args = ap.parse_args(argv)
    # torch must be imported before jax (TPU client deadlock otherwise);
    # pure host IO — never claim the TPU.
    import torch  # noqa: F401
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sshslie_tpu.interop import export_orbax_checkpoint

    export_orbax_checkpoint(args.ckpt_path, args.out_dir)


if __name__ == "__main__":
    main()
