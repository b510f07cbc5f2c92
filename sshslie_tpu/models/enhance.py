"""Top-level enhancement model: S = R_low·I_delta + R_low·I_low.

Combines DecompositionNet and IllumAdjustmentNet exactly as the reference
forward (model.py:229-234). The training objective additionally re-decomposes
S (model.py:545-546); that composition lives in
:func:`LowLightEnhanceNet.forward_with_redecomposition` so the whole loss
forward is one jitted graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sshslie_tpu.models.decomposition import DecompositionNet
from sshslie_tpu.models.illum_adjust import IllumAdjustmentNet


class LowLightEnhanceNet(nn.Module):
    """Retinex decomposition + illumination adjustment (reference model.py:177-234)."""

    input_channels: int = 64
    channel: int = 64
    use_attention: bool = False
    use_transformer: bool = True
    attention_impl: str = "auto"
    conv_impl: str = "xla"
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        # remat: rematerialize each sub-network's activations in the backward
        # pass instead of keeping them live across the whole step. The three
        # applications (decom(low) → illum → decom(S)) are sequential, so
        # per-sub-network checkpointing caps live residuals at one
        # sub-network's worth (measured 1.3-1.9x lower XLA-assigned temp for
        # 1.2-1.3x step time — a co-residency headroom knob, NOT a
        # fit-unlock: docs/PERFORMANCE.md r4 scale sweep). Lifted transform:
        # the parameter tree is
        # unchanged (tests/test_train.py enforces), so checkpoints are
        # interchangeable across the flag.
        decom_cls = nn.remat(DecompositionNet) if self.remat else DecompositionNet
        illum_cls = nn.remat(IllumAdjustmentNet) if self.remat else IllumAdjustmentNet
        self.decomposition_net = decom_cls(
            in_channels=self.input_channels, channel=self.channel,
            dtype=self.dtype, conv_impl=self.conv_impl,
        )
        self.illum_adjust_net = illum_cls(
            in_channels=self.input_channels,
            channel=self.channel,
            use_attention=self.use_attention,
            use_transformer=self.use_transformer,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
        )

    def __call__(
        self, input_low: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """input_low: (B, H, W, C) → (R_low, I_low, I_delta, S)."""
        R_low, I_low = self.decomposition_net(input_low)
        I_delta = self.illum_adjust_net(I_low, R_low)
        S = R_low * I_delta + R_low * I_low
        return R_low, I_low, I_delta, S

    def forward_with_redecomposition(self, input_low: jnp.ndarray):
        """Forward plus the second decomposition of S used by the loss
        (reference model.py:545-546). Returns (R_low, I_low, I_delta, S, R_enh)."""
        R_low, I_low, I_delta, S = self(input_low)
        R_enh, _I_enh = self.decomposition_net(S)
        return R_low, I_low, I_delta, S, R_enh
