"""Building-block ops with exact PyTorch-default semantics, in NHWC for TPU.

The reference nets are plain ``nn.Conv2d``/``nn.ConvTranspose2d``/``nn.Linear``
stacks (reference model.py:17-47,87-141). For metric parity we reproduce three
things PyTorch decides implicitly:

  * Kaiming-uniform(a=√5) default init — weights and biases ~ U(-1/√fan_in,
    1/√fan_in), with ConvTranspose2d's quirky fan_in = out_ch·k·k.
  * ConvTranspose2d(k, stride=2, padding=(k-1)//2, output_padding=1) output
    geometry — expressed as an input-dilated ``lax.conv_general_dilated`` so
    XLA maps it onto the MXU like any other conv.
  * ``F.interpolate(mode='nearest')`` index math (src = floor(dst·in/out)),
    which differs from ``jax.image.resize`` at non-integer ratios.

Everything is NHWC with HWIO kernels — the TPU-native layout — so cubes come
off the host without a transpose (the reference permutes NHWC→NCHW per batch,
reference model.py:312).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# NHWC activations, HWIO kernels.
_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def torch_uniform_init(fan_in: int):
    """U(-1/√fan_in, 1/√fan_in) — PyTorch's default conv/linear init envelope."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """NHWC conv matching ``nn.Conv2d(k, stride, padding=(k-1)//2)`` defaults.

    PyTorch's symmetric zero padding of (k-1)//2 equals XLA 'SAME' padding for
    odd kernels at stride 1; at stride 2 PyTorch computes out=floor((in+2p-k)/2)+1
    which for p=(k-1)//2 and odd k equals ceil(in/2) when in is even and also
    ceil(in/2) when odd — we pass the explicit pad pair to be exact for any size.
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_relu: bool = False
    dtype: Optional[jnp.dtype] = None
    impl: str = "xla"  # 'pallas' routes supported shapes to ops/conv_pallas

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * k * k
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        dtype = self.dtype or x.dtype
        if self.impl in ("pallas", "pallas_dgrad") and self.stride == 1:
            from sshslie_tpu.ops.conv_pallas import conv9_supported, shallow_conv

            if conv9_supported(x.shape, k, in_ch, self.features):
                y = shallow_conv(
                    x.astype(dtype), kernel.astype(dtype),
                    bias.astype(dtype), impl=self.impl,
                )
                return jax.nn.relu(y) if self.use_relu else y
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=_CONV_DIMS,
        )
        y = y + bias.astype(dtype)
        if self.use_relu:
            y = jax.nn.relu(y)
        return y


class ConvTranspose2d(nn.Module):
    """NHWC transposed conv matching ``nn.ConvTranspose2d(k, stride=2,
    padding=(k-1)//2, output_padding=1)`` (reference model.py:40-42).

    Expressed as the equivalent forward conv on an input dilated by the stride:
    out = conv(dilate(x, s), flip(W)) with pad (k-1-p, k-1-p+op) on each spatial
    axis. Output size = in·s exactly, as in PyTorch with these arguments.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    output_padding: int = 1
    use_relu: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, op = self.kernel_size, self.stride, self.output_padding
        p = (k - 1) // 2
        in_ch = x.shape[-1]
        # PyTorch ConvTranspose2d weight is (in, out, k, k) and its default
        # init uses fan_in = weight.size(1) * k * k = out_ch * k * k.
        fan_in = self.features * k * k
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        dtype = self.dtype or x.dtype
        # Spatial flip turns correlation into the transpose-conv kernel.
        kernel_flipped = kernel[::-1, ::-1, :, :]
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel_flipped.astype(dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=_CONV_DIMS,
        )
        y = y + bias.astype(dtype)
        if self.use_relu:
            y = jax.nn.relu(y)
        return y


class Dense(nn.Module):
    """Linear layer with PyTorch default init (U(-1/√in, 1/√in))."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_uniform_init(in_features), (in_features, self.features)
        )
        bias = self.param("bias", torch_uniform_init(in_features), (self.features,))
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        return y + bias.astype(dtype)


def nearest_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """``F.interpolate(x, size, mode='nearest')`` for NHWC tensors.

    PyTorch 'nearest' maps dst index d to src index floor(d * in / out)
    (asymmetric, no pixel-center alignment). Exact for the reference's
    upsample-by-resize path (reference model.py:156-169).
    """
    in_h, in_w = x.shape[1], x.shape[2]
    out_h, out_w = size
    if (in_h, in_w) == (out_h, out_w):
        return x
    if out_h % in_h == 0 and out_w % in_w == 0:
        # Integer upscale (every use in the nets: ×2 ups, ×2/×4 multi-scale
        # gather): floor(d·in/out) = d // k, i.e. each source pixel repeats k
        # times contiguously. repeat lowers to broadcast+reshape whose VJP is
        # a reshape+sum — measurably cheaper on TPU than the gather form
        # below, whose VJP is a scatter-add (~0.8 ms/step at b8 p128).
        return jnp.repeat(
            jnp.repeat(x, out_h // in_h, axis=1), out_w // in_w, axis=2
        )
    idx_h = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    return x[:, idx_h][:, :, idx_w]
