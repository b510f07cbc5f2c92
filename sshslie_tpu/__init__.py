"""sshslie_tpu — TPU-native self-supervised low-light hyperspectral image enhancement.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of SS-HSLIE
(medemirhan/Self-supervised-Image-Enhancement-Network-Training-With-Low-Light-Images-Only):
Retinex decomposition + Transformer-based illumination adjustment trained with a
six-term self-supervised loss suite on low-light HSI cubes only.

Design principles (TPU-first, not a port):
  * NHWC layout end to end — cubes are stored (H, W, C) on the host and enter the
    device without a transpose (the reference permutes to NCHW for cuDNN,
    reference model.py:312; we don't need to).
  * Everything in the hot path is a pure function under ``jax.jit``; losses are
    computed on device and fetched once per epoch (the reference syncs seven
    scalars per *batch*, reference model.py:567-574).
  * Parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding; the
    reference is single-device only (no counterpart to cite).
  * Hot kernels (spatial self-attention at full-cube resolution) have Pallas
    implementations in :mod:`sshslie_tpu.ops.attention`.
"""

__version__ = "0.3.0"

from sshslie_tpu.config import Config, load_config  # noqa: F401
