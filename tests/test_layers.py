"""Layer-level parity against PyTorch: conv, transpose-conv, nearest resize,
dense — the implicit semantics the reference nets rely on (model.py:17-47)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sshslie_tpu.models.layers import Conv2d, ConvTranspose2d, Dense, nearest_resize


def _nhwc(t):
    return t.transpose(0, 2, 3, 1)


def _nchw(t):
    return t.transpose(0, 3, 1, 2)


def test_conv2d_matches_torch(rng):
    for stride, k, h, w in [(1, 3, 8, 8), (2, 3, 7, 9), (1, 9, 12, 12), (2, 3, 8, 8)]:
        x = rng.randn(2, h, w, 5).astype(np.float32)
        wgt = rng.randn(k, k, 5, 6).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        mod = Conv2d(features=6, kernel_size=k, stride=stride)
        y = np.asarray(mod.apply({"params": {"kernel": jnp.array(wgt), "bias": jnp.array(b)}},
                                 jnp.array(x)))
        yt = F.conv2d(torch.tensor(_nchw(x)), torch.tensor(wgt.transpose(3, 2, 0, 1)),
                      torch.tensor(b), stride=stride, padding=(k - 1) // 2).numpy()
        np.testing.assert_allclose(y, _nhwc(yt), rtol=1e-4, atol=1e-4)


def test_conv2d_relu(rng):
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    mod = Conv2d(features=3, kernel_size=3, use_relu=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x))
    y = mod.apply(params, jnp.array(x))
    assert (np.asarray(y) >= 0).all()


def test_conv_transpose_matches_torch(rng):
    for h, w in [(8, 8), (7, 9), (5, 5)]:
        x = rng.randn(2, h, w, 4).astype(np.float32)
        wgt = rng.randn(3, 3, 4, 6).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        mod = ConvTranspose2d(features=6, kernel_size=3, stride=2, output_padding=1)
        y = np.asarray(mod.apply({"params": {"kernel": jnp.array(wgt), "bias": jnp.array(b)}},
                                 jnp.array(x)))
        yt = F.conv_transpose2d(torch.tensor(_nchw(x)), torch.tensor(wgt.transpose(2, 3, 0, 1)),
                                torch.tensor(b), stride=2, padding=1, output_padding=1).numpy()
        assert y.shape == _nhwc(yt).shape == (2, 2 * h, 2 * w, 6)
        np.testing.assert_allclose(y, _nhwc(yt), rtol=1e-4, atol=1e-4)


def test_nearest_resize_matches_torch(rng):
    for (ih, iw), (oh, ow) in [((5, 7), (9, 13)), ((4, 4), (8, 8)), ((3, 5), (5, 9)),
                               ((8, 8), (8, 8))]:
        x = rng.randn(2, ih, iw, 3).astype(np.float32)
        y = np.asarray(nearest_resize(jnp.array(x), (oh, ow)))
        yt = F.interpolate(torch.tensor(_nchw(x)), size=(oh, ow), mode="nearest").numpy()
        np.testing.assert_array_equal(y, _nhwc(yt))


def test_dense_matches_torch(rng):
    x = rng.randn(3, 10).astype(np.float32)
    wgt = rng.randn(10, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    y = np.asarray(Dense(features=4).apply(
        {"params": {"kernel": jnp.array(wgt), "bias": jnp.array(b)}}, jnp.array(x)))
    yt = (torch.tensor(x) @ torch.tensor(wgt) + torch.tensor(b)).numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-5)


def test_torch_init_envelope():
    """Weights must land in U(-1/√fan_in, 1/√fan_in) like PyTorch defaults."""
    mod = Conv2d(features=64, kernel_size=3)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))["params"]
    fan_in = 16 * 9
    bound = 1.0 / np.sqrt(fan_in)
    k = np.asarray(params["kernel"])
    assert np.abs(k).max() <= bound
    # Spread should fill a good part of the envelope, not collapse near zero.
    assert np.abs(k).max() >= 0.9 * bound
    assert np.abs(np.asarray(params["bias"])).max() <= bound

    # ConvTranspose uses PyTorch's quirky fan_in = out_ch·k² (not in_ch·k²).
    modt = ConvTranspose2d(features=4, kernel_size=3)
    pt = modt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))["params"]
    bound_t = 1.0 / np.sqrt(4 * 9)
    assert np.abs(np.asarray(pt["kernel"])).max() <= bound_t
    assert np.abs(np.asarray(pt["kernel"])).max() >= 0.9 * bound_t
