"""Spatial self-attention kernels for the TransformerBlock.

The reference materializes the full (S, S) attention matrix with torch.matmul
(reference model.py:110-113). At training patch size that is 256×256 — trivial
— but at full-cube inference S = (H/8)·(W/8) reaches 4096+ and the dense
S×S×heads logits tensor dominates memory. Three implementations:

  * :func:`sdpa_xla` — dense einsum attention. Fastest for small S; XLA fuses
    the softmax chain. Used for training patches.
  * :func:`sdpa_chunked` — lax.scan over key blocks with an online softmax.
    O(S·block) memory, runs on any backend. Used as the autodiff path and the
    CPU fallback for long sequences.
  * :func:`flash_attention` — Pallas TPU kernel: blockwise Q×Kᵀ on the MXU with
    online softmax accumulation in VMEM, never materializing S×S in HBM.

:func:`multi_head_attention` dispatches between them ('auto' picks by sequence
length and backend) and wires the Pallas forward to a chunked-attention VJP so
the whole model stays differentiable.

All entry points take (B, num_heads, S, head_dim) tensors, softmax scale
1/√head_dim — exactly the reference's scaled-dot-product (model.py:110-113).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Dense scaled-dot-product attention. q,k,v: (B, H, S, D) → (B, H, S, D)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", weights, v, preferred_element_type=jnp.float32).astype(q.dtype)


def sdpa_chunked(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_k: int = 512
) -> jnp.ndarray:
    """Online-softmax attention scanning over key blocks; O(S·block_k) memory."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s)
    num_blocks = -(-s // block_k)
    s_pad = num_blocks * block_k
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        valid = jnp.arange(s_pad) < s
    else:
        valid = None
    k_blocks = k.reshape(b, h, num_blocks, block_k, d)
    v_blocks = v.reshape(b, h, num_blocks, block_k, d)

    def step(carry, blk):
        m_prev, l_prev, acc = carry
        k_blk, v_blk, mask_blk = blk
        logits = (
            jnp.einsum("bhsd,bhtd->bhst", q, k_blk, preferred_element_type=jnp.float32)
            * scale
        )
        if mask_blk is not None:
            logits = jnp.where(mask_blk[None, None, None, :], logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new[..., None])
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[..., None] + jnp.einsum(
            "bhst,bhtd->bhsd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc), None

    m0 = jnp.full((b, h, s), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, s), dtype=jnp.float32)
    acc0 = jnp.zeros((b, h, s, d), dtype=jnp.float32)
    if valid is not None:
        mask_blocks = valid.reshape(num_blocks, block_k)
        (m, l, acc), _ = jax.lax.scan(
            lambda c, xs: step(c, (xs[0], xs[1], xs[2])),
            (m0, l0, acc0),
            (
                jnp.moveaxis(k_blocks, 2, 0),
                jnp.moveaxis(v_blocks, 2, 0),
                mask_blocks,
            ),
        )
    else:
        (m, l, acc), _ = jax.lax.scan(
            lambda c, xs: step(c, (xs[0], xs[1], None)),
            (m0, l0, acc0),
            (jnp.moveaxis(k_blocks, 2, 0), jnp.moveaxis(v_blocks, 2, 0)),
        )
    return (acc / l[..., None]).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, seq_len: int, scale: float):
    """Streaming flash-attention step for one (bh, q-block, k-block) cell.

    Grid: (batch*heads, num_q_blocks, num_k_blocks) with k innermost, so the
    Pallas pipeline double-buffers the K/V block DMAs from HBM while the MXU
    works — VMEM holds only one (block_q, d) Q tile and one (block_k, d) K/V
    tile at a time, never the full sequence. Online-softmax running stats
    (m, l, acc) persist across the k dimension in VMEM scratch; the output
    block is written once on the last k step.

    Keys beyond ``seq_len`` (zero padding) are masked with -inf.
    """
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)            # (bq, d_pad)
    k_blk = k_ref[0].astype(jnp.float32)        # (bk, d_pad)
    v_blk = v_ref[0].astype(jnp.float32)
    bq = q.shape[0]

    logits = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # (bq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + kb * block_k
    logits = jnp.where(col < seq_len, logits, _NEG_INF)

    m_prev = m_scr[:, 0]
    l_prev = l_scr[:, 0]
    m_cur = jnp.max(logits, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new[:, None])
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1)
    acc_new = acc_scr[:] * corr[:, None] + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_new
    l_scr[:, 0] = l_new
    acc_scr[:] = acc_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0][:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas blockwise attention. q,k,v: (B, H, S, D) → (B, H, S, D).

    Memory: O(block_q·d + block_k·d) VMEM regardless of S — full-cube
    inference at 1024²+ (S ≥ 16384) runs without materializing S×S or
    resident K/V. Head dim is zero-padded to the 128-lane tile; zero key
    and query lanes do not change Q·Kᵀ and zero value lanes are sliced
    away, so the result is exact.
    """
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    d_pad = _round_up(max(d, 128), 128)
    block_q = min(block_q, _round_up(s, 8))
    block_k = min(block_k, _round_up(s, 8))
    s_pad_q = _round_up(s, block_q)
    s_pad_k = _round_up(s, block_k)

    def prep(x, s_pad):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qp, kp, vp = prep(q, s_pad_q), prep(k, s_pad_k), prep(v, s_pad_k)
    num_q_blocks = s_pad_q // block_q
    num_k_blocks = s_pad_k // block_k

    kernel = functools.partial(_flash_kernel, seq_len=s, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad_q, d_pad), q.dtype),
        grid=(b * h, num_q_blocks, num_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),      # running max m
            pltpu.VMEM((block_q, 1), jnp.float32),      # running sum l
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad_q * s_pad_k * d_pad,
            bytes_accessed=4 * b * h * (2 * s_pad_q + 2 * s_pad_k * num_q_blocks) * d_pad,
            transcendentals=b * h * s_pad_q * s_pad_k,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s, :d].reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_ad(q, k, v, interpret=False):
    return flash_attention(q, k, v, interpret=interpret)


def _flash_fwd(q, k, v, interpret):
    return flash_attention(q, k, v, interpret=interpret), (q, k, v)


def _flash_bwd(interpret, residuals, g):
    # Recompute with the chunked implementation for the backward pass — the
    # sequence lengths where the Pallas kernel matters are inference-side, and
    # chunked attention keeps backward memory at O(S·block).
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: sdpa_chunked(q_, k_, v_), q, k, v)
    return vjp(g)


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch attention over (B, H, S, D) tensors.

    'auto': dense XLA attention for short sequences (the S×S tensor is small
    and XLA's fusion wins), flash/chunked beyond 2048 tokens depending on
    backend.
    """
    s = q.shape[2]
    if impl == "auto":
        if s <= 2048:
            impl = "xla"
        else:
            impl = "pallas" if jax.default_backend() == "tpu" else "chunked"
    if impl == "xla":
        return sdpa_xla(q, k, v)
    if impl == "chunked":
        return sdpa_chunked(q, k, v)
    if impl == "pallas":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _flash_attention_ad(q, k, v, interpret)
    raise ValueError(f"unknown attention impl {impl!r}")
