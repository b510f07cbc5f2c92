"""Compute-path ops: attention kernels and the self-supervised loss suite."""

from sshslie_tpu.ops.attention import multi_head_attention  # noqa: F401
from sshslie_tpu.ops.losses import (  # noqa: F401
    reconstruction_loss,
    structure_aware_loss,
    smooth_loss,
    fourier_spectrum_loss,
    spectral_smoothness_loss,
    total_loss,
)
