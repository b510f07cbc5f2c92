"""Retinex decomposition network (reference model.py:25-70), in Flax/NHWC.

Architecture (channel counts for default channel=64, C = spectral bands):

    x (B,H,W,C)
    ├─ conv0:    3×3 conv → 32, ReLU                  (skip to tail)
    └─ shallow:  9×9 conv → 64, linear
       conv1:    3×3 conv → 64, ReLU                  (skip to mid)
       conv2:    3×3 conv s2 → 128, ReLU              (H/2, W/2)
       conv3:    3×3 conv → 128, ReLU
       deconv:   3×3 transpose-conv s2 → 64, ReLU     (back to H, W)
       concat(deconv, conv1) → conv5: 3×3 → 64, ReLU
       concat(conv5, conv0)  → conv7: 3×3 → 64, linear
       recon:    3×3 conv → C+1
    sigmoid split → R (B,H,W,C), L (B,H,W,1)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sshslie_tpu.models.layers import Conv2d, ConvTranspose2d


class DecompositionNet(nn.Module):
    """Two-scale CNN splitting a low-light cube into reflectance R and illumination L."""

    in_channels: int
    channel: int = 64
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None
    conv_impl: str = "xla"  # 'pallas': hand-written shallow-conv kernels
                            # (ops/conv_pallas.py) where shapes allow

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ch, k = self.channel, self.kernel_size
        conv0 = Conv2d(ch // 2, k, use_relu=True, dtype=self.dtype, name="conv0")(x)
        shallow = Conv2d(ch, k * 3, use_relu=False, dtype=self.dtype,
                         impl=self.conv_impl, name="shallow_conv")(x)
        conv1 = Conv2d(ch, k, use_relu=True, dtype=self.dtype, name="conv1")(shallow)
        conv2 = Conv2d(ch * 2, k, stride=2, use_relu=True, dtype=self.dtype, name="conv2")(conv1)
        conv3 = Conv2d(ch * 2, k, use_relu=True, dtype=self.dtype, name="conv3")(conv2)
        deconv = ConvTranspose2d(ch, k, stride=2, output_padding=1, use_relu=True,
                                 dtype=self.dtype, name="deconv")(conv3)
        # The transpose conv yields 2·ceil(H/2); crop to the skip's size so odd
        # inputs work (the reference crashes on odd H/W — torch.cat shape
        # mismatch at model.py:59). No-op for even sizes, so parity holds.
        deconv = deconv[:, : conv1.shape[1], : conv1.shape[2], :]

        concat1 = jnp.concatenate([deconv, conv1], axis=-1)
        conv5 = Conv2d(ch, k, use_relu=True, dtype=self.dtype, name="conv5")(concat1)
        concat2 = jnp.concatenate([conv5, conv0], axis=-1)
        conv7 = Conv2d(ch, k, use_relu=False, dtype=self.dtype, name="conv7")(concat2)
        recon = Conv2d(self.in_channels + 1, k, use_relu=False, dtype=self.dtype,
                       name="recon")(conv7)

        # Sigmoid in float32 for numerical parity even under bfloat16 compute.
        recon = recon.astype(jnp.float32)
        R = jax.nn.sigmoid(recon[..., : self.in_channels])
        L = jax.nn.sigmoid(recon[..., self.in_channels :])
        return R, L
