"""Flax model definitions (NHWC, TPU-native layout)."""

from sshslie_tpu.models.decomposition import DecompositionNet  # noqa: F401
from sshslie_tpu.models.illum_adjust import (  # noqa: F401
    IllumAdjustmentNet,
    SEBlock,
    TransformerBlock,
)
from sshslie_tpu.models.enhance import LowLightEnhanceNet  # noqa: F401
