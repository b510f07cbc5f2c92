"""Loss-suite parity: every term checked against an independent PyTorch
transcription of the reference formulas (model.py:445-575) on random tensors,
plus hand-computed values on tiny tensors."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sshslie_tpu.ops.losses import (
    fourier_highpass_mask,
    fourier_spectrum_loss,
    reconstruction_loss,
    smooth_loss,
    spectral_smoothness_loss,
    structure_aware_loss,
    total_loss,
)


def _nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


@pytest.fixture
def tensors(rng):
    B, H, W, C = 2, 12, 14, 5
    R = rng.rand(B, H, W, C).astype(np.float32)
    R_enh = rng.rand(B, H, W, C).astype(np.float32)
    I = rng.rand(B, H, W, 1).astype(np.float32)
    Id = rng.rand(B, H, W, 1).astype(np.float32)
    S = rng.rand(B, H, W, C).astype(np.float32)
    inp = rng.rand(B, H, W, C).astype(np.float32)
    return R, R_enh, I, Id, S, inp


def test_reconstruction_loss(tensors):
    R, _, I, _, _, inp = tensors
    got = float(reconstruction_loss(jnp.array(R), jnp.array(I), jnp.array(inp)))
    want = float(torch.mean(torch.abs(_nchw(R) * _nchw(I) - _nchw(inp))))
    assert got == pytest.approx(want, rel=1e-5)


def test_smooth_loss_vs_torch(tensors):
    R, _, _, Id, _, _ = tensors
    alpha = 10.0
    got = float(smooth_loss(jnp.array(Id), jnp.array(R), alpha))
    It, Rt = _nchw(Id), _nchw(R)
    gIx = torch.abs(It[:, :, :, 1:] - It[:, :, :, :-1])
    gIy = torch.abs(It[:, :, 1:, :] - It[:, :, :-1, :])
    gRx = torch.abs(Rt[:, :, :, 1:] - Rt[:, :, :, :-1])
    gRy = torch.abs(Rt[:, :, 1:, :] - Rt[:, :, :-1, :])
    want = float(torch.mean(gIx * torch.exp(-alpha * gRx))
                 + torch.mean(gIy * torch.exp(-alpha * gRy)))
    assert got == pytest.approx(want, rel=1e-5)


def test_structure_aware_loss_vs_torch(tensors):
    R, R_enh, I, _, _, _ = tensors
    alpha, beta = 1.0, 0.5
    i_loss, r_loss = structure_aware_loss(
        jnp.array(R), jnp.array(I), jnp.array(R_enh), alpha=alpha, beta=beta
    )
    Rt, It, Et = _nchw(R), _nchw(I), _nchw(R_enh)
    gx = lambda x: x[..., :, 1:] - x[..., :, :-1]
    gy = lambda x: x[..., 1:, :] - x[..., :-1, :]
    wx = torch.exp(-alpha * gx(Rt).abs().mean(dim=1, keepdim=True))
    wy = torch.exp(-alpha * gy(Rt).abs().mean(dim=1, keepdim=True))
    want_i = float(torch.mean(wx * gx(It).abs()) + torch.mean(wy * gy(It).abs()))
    want_r = float(
        torch.mean(torch.abs(Rt - Et))
        + beta * (torch.mean(torch.abs(gx(Rt) - gx(Et)))
                  + torch.mean(torch.abs(gy(Rt) - gy(Et))))
    )
    assert float(i_loss) == pytest.approx(want_i, rel=1e-5)
    assert float(r_loss) == pytest.approx(want_r, rel=1e-5)


def test_fourier_mask_center_zero():
    """The excluded disk sits at the array center — unshifted-layout quirk
    reproduced from reference model.py:460-464."""
    m = np.asarray(fourier_highpass_mask(32, 32, cutoff=0.1))
    # linspace(-1,1,32) crosses zero between indices 15 and 16
    assert m[15, 15] == 0.0 and m[16, 16] == 0.0
    assert m[0, 0] == 1.0 and m[31, 31] == 1.0
    assert m.sum() < 32 * 32  # some bins excluded


def test_fourier_loss_vs_torch(tensors):
    _, _, _, _, S, inp = tensors
    got = float(fourier_spectrum_loss(jnp.array(inp), jnp.array(S)))
    it, st = _nchw(inp), _nchw(S)
    fft_i = torch.fft.fft2(it)
    fft_s = torch.fft.fft2(st)
    N, C, H, W = it.shape
    y = torch.linspace(-1, 1, H)
    x = torch.linspace(-1, 1, W)
    Y, X = torch.meshgrid(y, x, indexing="ij")
    mask = ((X**2 + Y**2).sqrt() >= 0.1).float()[None, None]
    want = float(torch.mean(torch.abs(torch.abs(fft_i * mask) - torch.abs(fft_s * mask))))
    assert got == pytest.approx(want, rel=1e-4)


def test_spectral_smoothness_vs_torch(tensors):
    _, _, _, _, S, _ = tensors
    got = float(spectral_smoothness_loss(jnp.array(S)))
    st = _nchw(S)
    want = float(torch.mean(torch.abs(st[:, 1:] - st[:, :-1])))
    assert got == pytest.approx(want, rel=1e-5)
    got2 = float(spectral_smoothness_loss(jnp.array(S), loss_type="l2"))
    want2 = float(torch.mean((st[:, 1:] - st[:, :-1]) ** 2))
    assert got2 == pytest.approx(want2, rel=1e-5)


def test_total_loss_weighting(tensors):
    R, R_enh, I, Id, S, inp = tensors
    coeffs = {
        "c_loss_reconstruction": 10.0, "c_loss_r_fidelity": 1.0,
        "c_loss_i_smooth_low": 1.0, "c_loss_i_smooth_delta": 20.0,
        "c_loss_fourier": 0.2, "c_loss_spectral_cons": 1.0,
        "alpha_i_smooth_low": 1.0, "alpha_i_smooth_delta": 10.0,
    }
    total, terms = total_loss(
        jnp.array(inp), jnp.array(R), jnp.array(I), jnp.array(Id),
        jnp.array(S), jnp.array(R_enh), coeffs,
    )
    manual = (
        10.0 * float(terms["L_reconstruction"])
        + 1.0 * float(terms["L_R_fidelity"])
        + 1.0 * float(terms["L_I_smooth_low"])
        + 20.0 * float(terms["L_I_smooth_delta"])
        + 0.2 * float(terms["L_fourier"])
        + 1.0 * float(terms["L_spectral_cons"])
    )
    assert float(total) == pytest.approx(manual, rel=1e-5)
    assert float(terms["total_loss"]) == pytest.approx(float(total), rel=1e-6)


def test_smooth_loss_constant_image_zero():
    I = jnp.ones((1, 8, 8, 1))
    R = jnp.ones((1, 8, 8, 3))
    assert float(smooth_loss(I, R)) == 0.0
    assert float(spectral_smoothness_loss(R)) == 0.0


@pytest.mark.parametrize("H,W", [(13, 15), (13, 14), (17, 17), (16, 15)])
def test_fourier_loss_odd_sizes_vs_torch(rng, H, W):
    """SURVEY §7 hard part: the radial high-pass mask must match the
    reference's linspace(-1,1) construction under odd AND mixed-parity
    sizes (odd linspaces include an exact 0 sample, changing the excluded
    disk)."""
    B, C = 2, 3
    inp = rng.rand(B, H, W, C).astype(np.float32)
    S = rng.rand(B, H, W, C).astype(np.float32)
    got = float(fourier_spectrum_loss(jnp.array(inp), jnp.array(S)))
    it, st = _nchw(inp), _nchw(S)
    fft_i = torch.fft.fft2(it)
    fft_s = torch.fft.fft2(st)
    y = torch.linspace(-1, 1, H)
    x = torch.linspace(-1, 1, W)
    Y, X = torch.meshgrid(y, x, indexing="ij")
    mask = ((X**2 + Y**2).sqrt() >= 0.1).float()[None, None]
    want = float(torch.mean(torch.abs(torch.abs(fft_i * mask) - torch.abs(fft_s * mask))))
    assert got == pytest.approx(want, rel=1e-4)
    # odd axes sample frequency 0 exactly → the zero bin must be masked out
    if H % 2 == 1 and W % 2 == 1:
        m = np.asarray(fourier_highpass_mask(H, W, cutoff=0.1))
        assert m[H // 2, W // 2] == 0.0
