#!/usr/bin/env python
"""Convert an Orbax StandardCheckpoint directory (of this model's parameter
tree) into the msgpack params file usable as ``pretrained_model`` for warm
starts or placed as ``model_epoch_latest.ckpt`` for the test phase.

Example:
  python scripts/import_orbax_checkpoint.py out/orbax_params out/imported.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("orbax_dir")
    ap.add_argument("out_path")
    args = ap.parse_args(argv)
    # torch must be imported before jax (TPU client deadlock otherwise);
    # pure host IO — never claim the TPU.
    import torch  # noqa: F401
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sshslie_tpu.interop import import_orbax_checkpoint

    import_orbax_checkpoint(args.orbax_dir, args.out_path)


if __name__ == "__main__":
    main()
