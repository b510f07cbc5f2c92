"""Metric parity: PSNR against the closed form, SSIM against an independent
PyTorch transcription of the torchmetrics algorithm (gaussian 11×11 σ=1.5,
valid conv, interior mean), SAM against the angle formula; plus the reference's
quirky SSIM orientation and the calc_metrics directory walker."""

import numpy as np
import pytest
import scipy.io as sio
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sshslie_tpu.metrics import (
    calc_metrics,
    multi_img_bandwise_metrics,
    psnr,
    psnr_bandwise,
    sam,
    ssim,
    ssim_bandwise,
    ssim_spatial,
)


def _torch_ssim(pred_nchw, target_nchw, data_range, kernel_size=11, sigma=1.5):
    """Independent transcription of torchmetrics' SSIM algorithm."""
    coords = torch.arange(kernel_size, dtype=torch.float32) - (kernel_size - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = (g / g.sum())
    kern = (g[:, None] @ g[None, :])[None, None]
    n, c, h, w = pred_nchw.shape
    p = pred_nchw.reshape(n * c, 1, h, w)
    t = target_nchw.reshape(n * c, 1, h, w)
    blur = lambda x: F.conv2d(x, kern)
    mu_p, mu_t = blur(p), blur(t)
    s_p = blur(p * p) - mu_p**2
    s_t = blur(t * t) - mu_t**2
    s_pt = blur(p * t) - mu_p * mu_t
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * s_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (s_p + s_t + c2)
    return float((num / den).mean())


def test_psnr_closed_form(rng):
    a = rng.rand(16, 16, 4).astype(np.float32)
    b = rng.rand(16, 16, 4).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    want = 10 * np.log10(4095.0**2 / mse)
    assert float(psnr(jnp.array(a), jnp.array(b), 4095.0)) == pytest.approx(want, rel=1e-5)


def test_psnr_range_tuple_clamps(rng):
    a = (rng.rand(8, 8, 2) * 2 - 0.5).astype(np.float32)  # exceeds [0,1]
    b = rng.rand(8, 8, 2).astype(np.float32)
    got = float(psnr(jnp.array(a), jnp.array(b), (0.0, 1.0)))
    ac = np.clip(a, 0, 1)
    want = 10 * np.log10(1.0 / np.mean((ac - b) ** 2))
    assert got == pytest.approx(want, rel=1e-5)


def test_ssim_identity_is_one(rng):
    a = rng.rand(32, 32, 16).astype(np.float32)
    assert float(ssim(jnp.array(a), jnp.array(a), 1.0)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_torch_reference_orientation(rng):
    """Reference orientation: (H,W,C) → NCHW with H as channels
    (reference metrics.py:16-19)."""
    a = rng.rand(20, 24, 16).astype(np.float32)
    b = rng.rand(20, 24, 16).astype(np.float32)
    got = float(ssim(jnp.array(a), jnp.array(b), 1.0))
    want = _torch_ssim(torch.tensor(a)[None], torch.tensor(b)[None], 1.0)
    assert got == pytest.approx(want, rel=1e-4)


def test_ssim_spatial_matches_torch(rng):
    a = rng.rand(24, 20, 3).astype(np.float32)
    b = rng.rand(24, 20, 3).astype(np.float32)
    got = float(ssim_spatial(jnp.array(a), jnp.array(b), 1.0))
    want = _torch_ssim(
        torch.tensor(a.transpose(2, 0, 1))[None],
        torch.tensor(b.transpose(2, 0, 1))[None], 1.0
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_sam_formula(rng):
    a = rng.rand(6, 7, 5).astype(np.float32) + 0.1
    b = rng.rand(6, 7, 5).astype(np.float32) + 0.1
    got = float(sam(jnp.array(a), jnp.array(b)))
    dots = (a * b).sum(-1)
    want = np.mean(np.arccos(np.clip(
        dots / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)), -1, 1)))
    assert got == pytest.approx(want, rel=1e-5)
    assert float(sam(jnp.array(a), jnp.array(a))) == pytest.approx(0.0, abs=1e-3)


def test_bandwise_metrics(rng):
    a = rng.rand(24, 24, 6).astype(np.float32)
    b = rng.rand(24, 24, 6).astype(np.float32)
    pv = np.asarray(psnr_bandwise(jnp.array(a), jnp.array(b), 1.0))
    assert pv.shape == (6,)
    for i in range(6):
        want = float(psnr(jnp.array(a[..., i:i+1]), jnp.array(b[..., i:i+1]), 1.0))
        assert pv[i] == pytest.approx(want, rel=1e-4)
    sv = np.asarray(ssim_bandwise(jnp.array(a), jnp.array(b), 1.0))
    assert sv.shape == (6,)
    for i in range(6):
        want = _torch_ssim(torch.tensor(a[..., i])[None, None],
                           torch.tensor(b[..., i])[None, None], 1.0)
        assert sv[i] == pytest.approx(want, rel=1e-3, abs=1e-5)


def test_calc_metrics_walker(tmp_path, rng):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir(); gt_dir.mkdir()
    scores = []
    for name in ("a", "b"):
        p = rng.rand(16, 16, 12).astype(np.float32)
        g = rng.rand(16, 16, 12).astype(np.float32)
        sio.savemat(pred_dir / f"{name}.mat", {"data": p})
        sio.savemat(gt_dir / f"{name}.mat", {"data": g})
        scores.append(float(psnr(jnp.array(p), jnp.array(g), 1.0)))
    # one unpaired prediction must be skipped, not crash
    sio.savemat(pred_dir / "orphan.mat", {"data": rng.rand(16, 16, 12).astype(np.float32)})
    avg_psnr, avg_ssim, avg_sam = calc_metrics(
        str(pred_dir / "*.mat"), str(gt_dir), data_max=1.0, verbose=False
    )
    assert avg_psnr == pytest.approx(np.mean(scores), rel=1e-5)
    assert -1 <= avg_ssim <= 1  # noise pairs can score slightly negative
    assert avg_sam > 0

    pb, sb = multi_img_bandwise_metrics(str(pred_dir), str(gt_dir), data_max=1.0)
    assert pb.shape == (12,) and sb.shape == (12,)


def test_calc_metrics_empty_raises(tmp_path):
    with pytest.raises(ValueError):
        calc_metrics(str(tmp_path / "*.mat"), str(tmp_path), verbose=False)


def test_metrics_cli(tmp_path, capsys, rng):
    """`python -m sshslie_tpu.metrics <glob> <label_dir>` — the reference's
    hardcoded standalone __main__ (metrics.py:143-162), made argument-driven."""
    import scipy.io as sio

    from sshslie_tpu.metrics import _main

    pred, gt = tmp_path / "pred", tmp_path / "gt"
    pred.mkdir(); gt.mkdir()
    cube = (rng.rand(16, 16, 4) * 1000).astype(np.float32)
    noisy = cube + rng.randn(16, 16, 4).astype(np.float32) * 5
    sio.savemat(str(pred / "a.mat"), {"data": noisy})
    sio.savemat(str(gt / "a.mat"), {"data": cube})
    _main([str(pred / "*.mat"), str(gt), "--data_max", "4095"])
    out = capsys.readouterr().out
    assert "Avg.PSNR" in out and "Avg.SSIM" in out and "Avg.SAM" in out
    psnr_line = [ln for ln in out.splitlines() if "Avg.PSNR" in ln][0]
    assert float(psnr_line.split(":")[1]) > 40  # tiny noise → high PSNR


def test_data_range_none_torchmetrics_semantics(rng):
    """data_range=None must follow torchmetrics' per-metric inference: PSNR
    uses the TARGET's range; SSIM the larger of the two tensors' ranges —
    not a combined min/max (which inflates PSNR when predictions overshoot)."""
    from sshslie_tpu.metrics import psnr, ssim_spatial

    target = jnp.asarray(rng.rand(16, 16, 4).astype(np.float32))          # [0,1)
    pred = jnp.asarray(target * 1.2)                                      # overshoots
    t_rng = float(jnp.max(target) - jnp.min(target))
    np.testing.assert_allclose(
        float(psnr(pred, target, None)), float(psnr(pred, target, t_rng)),
        rtol=1e-6,
    )
    s_rng = max(t_rng, float(jnp.max(pred) - jnp.min(pred)))
    np.testing.assert_allclose(
        float(ssim_spatial(pred, target, None)),
        float(ssim_spatial(pred, target, s_rng)), rtol=1e-6,
    )


def test_bandwise_none_uses_per_band_ranges(rng):
    """The reference's bandwise loop calls torchmetrics once per band, so
    each band infers its own range — a cube-global range inflates weak
    bands."""
    from sshslie_tpu.metrics import psnr_bandwise

    target = rng.rand(16, 16, 3).astype(np.float32)
    target[..., 1] *= 0.01                                # weak band
    pred = target + rng.randn(16, 16, 3).astype(np.float32) * 0.001
    vec = np.asarray(psnr_bandwise(jnp.asarray(pred), jnp.asarray(target), None))
    for b in range(3):
        t = jnp.asarray(target[..., b:b + 1])
        p = jnp.asarray(pred[..., b:b + 1])
        expect = float(psnr(p, t, float(jnp.max(t) - jnp.min(t))))
        np.testing.assert_allclose(vec[b], expect, rtol=1e-5)

def test_array_data_range_and_no_per_value_recompile(rng):
    """data_range rides as a traced operand (advisor r3): array-valued ranges
    are accepted, and distinct float ranges reuse ONE compiled program
    instead of growing the jit cache per value."""
    from sshslie_tpu.metrics import _psnr_core, psnr

    target = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    # Array-valued range (0-d device array) — previously TypeError: unhashable.
    arr_rng = jnp.asarray(2.0)
    np.testing.assert_allclose(
        float(psnr(pred, target, arr_rng)), float(psnr(pred, target, 2.0)),
        rtol=1e-6,
    )
    base = _psnr_core._cache_size()
    for v in (1.0, 1.5, 2.0, 3.25):
        psnr(pred, target, v)
    assert _psnr_core._cache_size() == max(base, 1)  # one entry for all values
