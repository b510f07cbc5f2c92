"""Illumination adjustment network + attention blocks (reference model.py:72-175).

TransformerBlock quirks reproduced deliberately (SURVEY.md §2.4.9): no
positional encoding, no LayerNorm, and the residual adds the FF output to the
*input* sequence (the attention output reaches the residual only through the
FF), exactly as reference model.py:99-119.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sshslie_tpu.models.layers import Conv2d, Dense, nearest_resize
from sshslie_tpu.ops.attention import multi_head_attention


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel gate (reference model.py:72-85)."""

    channels: int
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        squeeze = jnp.mean(x, axis=(1, 2))  # (B, C)
        excitation = jax.nn.relu(
            Dense(self.channels // self.reduction, dtype=self.dtype, name="fc1")(squeeze)
        )
        excitation = jax.nn.sigmoid(
            Dense(self.channels, dtype=self.dtype, name="fc2")(excitation)
        )
        return x * excitation[:, None, None, :]


class TransformerBlock(nn.Module):
    """Spatial self-attention over flattened H·W tokens (reference model.py:87-119)."""

    channels: int
    num_heads: int = 4
    head_dim: int = 16
    ff_dim: int = 64
    attention_impl: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C) — tokens are pixels, features are channels.
        b, h, w, c = x.shape
        if c != self.channels:
            # Trace-time check (zero runtime cost): the field otherwise
            # silently diverges from the runtime width.
            raise ValueError(
                f"TransformerBlock built for {self.channels} channels, "
                f"got {c}"
            )
        seq_len = h * w
        total_dim = self.num_heads * self.head_dim
        x_flat = x.reshape(b, seq_len, c)

        q = Dense(total_dim, dtype=self.dtype, name="q_linear")(x_flat)
        k = Dense(total_dim, dtype=self.dtype, name="k_linear")(x_flat)
        v = Dense(total_dim, dtype=self.dtype, name="v_linear")(x_flat)

        def split_heads(t):
            return t.reshape(b, seq_len, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        attn = multi_head_attention(
            split_heads(q), split_heads(k), split_heads(v), impl=self.attention_impl
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, seq_len, total_dim)

        ff = jax.nn.relu(Dense(self.ff_dim, dtype=self.dtype, name="ff_linear1")(attn))
        ff = Dense(c, dtype=self.dtype, name="ff_linear2")(ff)
        # Residual adds FF output to the *input* tokens (reference model.py:117).
        out = x_flat + ff
        return out.reshape(b, h, w, c)


class IllumAdjustmentNet(nn.Module):
    """U-shaped illumination corrector with attention at H/8 (model.py:121-175).

    Forward: concat(R, I) → conv0 → 3× stride-2 down → attention →
    3× (nearest-up + conv + additive skip) → multi-scale gather → 1×1 fuse →
    final 3×3 conv → I_delta (B, H, W, 1).
    """

    in_channels: int
    channel: int = 64
    kernel_size: int = 3
    use_attention: bool = False     # SEBlock variant
    use_transformer: bool = True    # TransformerBlock variant (default)
    attention_impl: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, I: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
        if R.shape[-1] != self.in_channels:
            # Trace-time check: the reference sizes conv0 from in_channels+1
            # and errors on mismatch (model.py:125); deriving widths from
            # the runtime shape must not silently accept a wrong R.
            raise ValueError(
                f"IllumAdjustmentNet built for {self.in_channels}-band R, "
                f"got {R.shape[-1]}"
            )
        ch, k = self.channel, self.kernel_size
        x = jnp.concatenate([R, I], axis=-1)  # (B, H, W, C+1)
        conv0 = Conv2d(ch, k, use_relu=False, dtype=self.dtype, name="conv0")(x)
        conv1 = Conv2d(ch, k, stride=2, use_relu=True, dtype=self.dtype, name="conv1")(conv0)
        conv2 = Conv2d(ch, k, stride=2, use_relu=True, dtype=self.dtype, name="conv2")(conv1)
        conv3 = Conv2d(ch, k, stride=2, use_relu=True, dtype=self.dtype, name="conv3")(conv2)

        if self.use_attention:
            conv3 = SEBlock(ch, dtype=self.dtype, name="attn")(conv3)
        elif self.use_transformer:
            conv3 = TransformerBlock(
                ch, attention_impl=self.attention_impl, dtype=self.dtype, name="attn"
            )(conv3)

        up1 = nearest_resize(conv3, conv2.shape[1:3])
        deconv1 = Conv2d(ch, k, use_relu=True, dtype=self.dtype, name="deconv1")(up1) + conv2
        up2 = nearest_resize(deconv1, conv1.shape[1:3])
        deconv2 = Conv2d(ch, k, use_relu=True, dtype=self.dtype, name="deconv2")(up2) + conv1
        up3 = nearest_resize(deconv2, conv0.shape[1:3])
        deconv3 = Conv2d(ch, k, use_relu=True, dtype=self.dtype, name="deconv3")(up3) + conv0

        deconv1_rs = nearest_resize(deconv1, deconv3.shape[1:3])
        deconv2_rs = nearest_resize(deconv2, deconv3.shape[1:3])
        gather = jnp.concatenate([deconv1_rs, deconv2_rs, deconv3], axis=-1)
        fused = Conv2d(ch, 1, use_relu=False, dtype=self.dtype, name="feature_fusion")(gather)
        out = Conv2d(1, 3, use_relu=False, dtype=self.dtype, name="final_conv")(fused)
        return out.astype(jnp.float32)
