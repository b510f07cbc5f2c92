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

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int, scale: float):
    """One (q-block × full-K) flash attention pass.

    Grid: (batch*heads, num_q_blocks). Refs are VMEM blocks:
      q_ref (1, block_q, d_pad), k_ref/v_ref (1, S_pad, d_pad), o_ref like q_ref.
    Keys beyond ``seq_len`` are masked with -inf before the online softmax.
    """
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    bq = q.shape[0]
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
        logits = jnp.where(col < seq_len, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new[:, None])
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    d_pad = q.shape[1]
    m0 = jnp.full((bq,), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq,), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d_pad), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


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

    Head dim is zero-padded to the 128-lane tile; zero key/query lanes do not
    change Q·Kᵀ and zero value lanes are sliced away, so the result is exact.
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

    kernel = functools.partial(
        _flash_kernel, block_k=block_k, seq_len=s, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad_q, d_pad), q.dtype),
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad_k, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad_k, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
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
