"""Attention kernel tests: cross-implementation agreement (XLA dense, chunked
online-softmax, Pallas flash in interpreter mode), torch SDPA as the external
oracle, gradient correctness of the custom-VJP flash path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sshslie_tpu.ops.attention import (
    _flash_attention_ad,
    flash_attention,
    multi_head_attention,
    sdpa_chunked,
    sdpa_xla,
)


@pytest.fixture
def qkv(rng):
    B, H, S, D = 2, 4, 100, 16
    mk = lambda: jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    return mk(), mk(), mk()


def test_xla_matches_torch_sdpa(qkv):
    q, k, v = qkv
    out = np.asarray(sdpa_xla(q, k, v))
    qt, kt, vt = (torch.tensor(np.asarray(t)) for t in qkv)
    want = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt).numpy()
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_chunked_matches_xla(qkv):
    q, k, v = qkv
    # block not dividing S exercises the masked-padding path
    out = np.asarray(sdpa_chunked(q, k, v, block_k=32))
    want = np.asarray(sdpa_xla(q, k, v))
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_flash_interpret_matches_xla(qkv):
    q, k, v = qkv
    out = np.asarray(flash_attention(q, k, v, block_q=32, block_k=32, interpret=True))
    want = np.asarray(sdpa_xla(q, k, v))
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_flash_exact_blocks(rng):
    # S divisible by both block sizes — no masking path
    q = jnp.asarray(rng.randn(1, 2, 64, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 64, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 64, 16).astype(np.float32))
    out = np.asarray(flash_attention(q, k, v, block_q=32, block_k=32, interpret=True))
    np.testing.assert_allclose(out, np.asarray(sdpa_xla(q, k, v)), atol=2e-5)


def test_flash_vjp_matches_xla_grads(rng):
    q = jnp.asarray(rng.randn(1, 2, 48, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 48, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 48, 16).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(_flash_attention_ad(q, k, v, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(sdpa_xla(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dispatch(qkv):
    q, k, v = qkv
    for impl in ("xla", "chunked"):
        out = multi_head_attention(q, k, v, impl=impl)
        assert out.shape == q.shape
    out = multi_head_attention(q, k, v, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa_xla(q, k, v)), atol=2e-5)
    with pytest.raises(ValueError):
        multi_head_attention(q, k, v, impl="nope")


def test_auto_uses_dense_for_short_seq(qkv):
    q, k, v = qkv
    out = multi_head_attention(q, k, v, impl="auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa_xla(q, k, v)), atol=1e-6)
