"""Misregistration checker: phase-correlation shift recovery on known
translations, projections, edge proxy behavior, batch CSV + aligned output."""

import csv
import os

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.align import (
    AlignOptions,
    check_misregistration_hsi,
    edge_misalign_proxy,
    lucas_kanade_flow,
    phase_correlation_shift,
    project_2d,
    residual_motion,
    warp_translate,
)


def _scene(rng, h=64, w=64):
    """Structured test image (random blobs, smoothed) so correlation locks on."""
    import scipy.ndimage as ndi

    img = rng.rand(h, w)
    img = ndi.gaussian_filter(img, 3)
    img[20:30, 15:40] += 1.0
    img[40:50, 30:35] += 0.8
    return ndi.gaussian_filter(img, 1)


def test_projections(rng):
    cube = rng.rand(16, 16, 8)
    assert project_2d(cube, "band", 3).shape == (16, 16)
    np.testing.assert_allclose(project_2d(cube, "mean"), cube.mean(axis=2))
    np.testing.assert_allclose(project_2d(cube, "median"), np.median(cube, axis=2))
    p = project_2d(cube, "pca")
    assert p.shape == (16, 16) and p.min() >= 0 and p.max() <= 1
    with pytest.raises(ValueError):
        project_2d(cube, "nope")


@pytest.mark.parametrize("dy,dx", [(3, 0), (0, -4), (5, 7), (-2, 3)])
def test_phase_correlation_integer_shifts(rng, dy, dx):
    fixed = _scene(rng)
    moving = np.roll(fixed, (-dy, -dx), axis=(0, 1))
    got_dy, got_dx = phase_correlation_shift(moving, fixed)
    assert got_dy == pytest.approx(dy, abs=0.5)
    assert got_dx == pytest.approx(dx, abs=0.5)


def test_warp_translate_aligns(rng):
    fixed = _scene(rng)
    moving = np.roll(fixed, (-3, -2), axis=(0, 1))
    warped = warp_translate(moving, 3, 2)
    # interior must match (borders take fill)
    np.testing.assert_allclose(warped[8:-8, 8:-8], fixed[8:-8, 8:-8], atol=1e-6)


def test_edge_proxy_orders_misalignment(rng):
    fixed = _scene(rng)
    near = np.roll(fixed, (1, 0), axis=(0, 1))
    far = np.roll(fixed, (6, 6), axis=(0, 1))
    m_near, _ = edge_misalign_proxy(near, fixed)
    m_far, _ = edge_misalign_proxy(far, fixed)
    assert m_far > m_near


def test_lk_flow_recovers_subpixel_shift(rng):
    """Pure-translation warp of known magnitude: LK's mean flow magnitude
    over reliable pixels lands near the true shift (misregistration.m:211-218
    equivalent)."""
    import scipy.ndimage as ndi

    fixed = _scene(rng, 96, 96)
    dy, dx = 0.6, -0.4
    moving = ndi.shift(fixed, (dy, dx), order=3, mode="nearest")
    vy, vx, ok = lucas_kanade_flow(fixed, moving)
    assert ok.mean() > 0.02, "noise gate rejected the whole scene"
    true_mag = np.hypot(dy, dx)
    got = float(np.mean(np.hypot(vy, vx)[ok]))
    assert got == pytest.approx(true_mag, rel=0.15), (got, true_mag)
    # direction too, not just magnitude
    assert float(np.median(vy[ok])) == pytest.approx(dy, abs=0.15)
    assert float(np.median(vx[ok])) == pytest.approx(dx, abs=0.15)


def test_lk_flow_pyramid_handles_multi_pixel_shift(rng):
    import scipy.ndimage as ndi

    fixed = _scene(rng, 128, 128)
    dy, dx = 3.0, -2.0
    moving = ndi.shift(fixed, (dy, dx), order=3, mode="nearest")
    _, p95 = residual_motion(moving, fixed, method="lk")
    # A single-level LK saturates near ~1 px; the pyramid must see most of
    # the 3.6 px displacement.
    assert p95 > 2.0, p95


def test_residual_motion_orders_misalignment(rng):
    fixed = _scene(rng)
    near = np.roll(fixed, (1, 0), axis=(0, 1))
    far = np.roll(fixed, (4, 4), axis=(0, 1))
    m_near, _ = residual_motion(near, fixed)
    m_far, _ = residual_motion(far, fixed)
    assert m_far > m_near
    # proxy path still reachable
    m_proxy, p_proxy = residual_motion(near, fixed, method="proxy")
    assert np.isfinite(m_proxy) and np.isfinite(p_proxy)


def test_batch_checker_end_to_end(tmp_path, rng):
    low_dir = tmp_path / "low"
    gt_dir = tmp_path / "gt"
    low_dir.mkdir(); gt_dir.mkdir()
    base = _scene(rng)
    cube_gt = np.stack([base * (1 + 0.1 * b) for b in range(6)], axis=-1)
    # aligned pair
    sio.savemat(gt_dir / "ok.mat", {"data": cube_gt.astype(np.float32)})
    sio.savemat(low_dir / "ok.mat", {"data": (cube_gt * 0.3).astype(np.float32)})
    # shifted pair (dy=4, dx=5) — must be flagged
    shifted = np.roll(cube_gt, (-4, -5), axis=(0, 1))
    sio.savemat(gt_dir / "bad.mat", {"data": cube_gt.astype(np.float32)})
    sio.savemat(low_dir / "bad.mat", {"data": (shifted * 0.3).astype(np.float32)})
    # unpaired file — ignored
    sio.savemat(low_dir / "orphan.mat", {"data": cube_gt.astype(np.float32)})

    out_csv = str(tmp_path / "report.csv")
    aligned_dir = str(tmp_path / "aligned")
    results = check_misregistration_hsi(
        str(low_dir), str(gt_dir), out_csv, preview_dir=str(tmp_path / "prev"),
        opts=AlignOptions(save_aligned_dir=aligned_dir, verbose=False),
    )
    by_name = {r.file_gt: r for r in results}
    assert len(results) == 2
    assert by_name["bad.mat"].flag_misaligned
    assert by_name["bad.mat"].shift_px == pytest.approx(np.hypot(4, 5), abs=1.0)
    assert not by_name["ok.mat"].flag_misaligned
    # severity sort: flagged first
    assert results[0].file_gt == "bad.mat"

    with open(out_csv) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2 and rows[0]["flag_misaligned"] == "True"

    # aligned cube: every band warped by the same shift; interior matches GT scene
    aligned = sio.loadmat(os.path.join(aligned_dir, "bad.mat"))["data"]
    assert aligned.shape == cube_gt.shape
    ref = cube_gt * 0.3
    np.testing.assert_allclose(aligned[10:-10, 10:-10, 2],
                               ref[10:-10, 10:-10, 2], atol=0.05)
    # preview written for the flagged pair
    assert os.path.exists(tmp_path / "prev" / "bad_preview.png")


def test_batch_checker_no_pairs(tmp_path):
    (tmp_path / "a").mkdir(); (tmp_path / "b").mkdir()
    with pytest.raises(ValueError):
        check_misregistration_hsi(str(tmp_path / "a"), str(tmp_path / "b"),
                                  str(tmp_path / "r.csv"))


def test_align_cli_main(tmp_path, rng):
    """python -m sshslie_tpu.align — the MATLAB call surface as a CLI."""
    from sshslie_tpu.align import main as align_main

    low_dir = tmp_path / "low"
    gt_dir = tmp_path / "gt"
    low_dir.mkdir(); gt_dir.mkdir()
    base = _scene(rng)
    cube = np.stack([base * (1 + 0.1 * b) for b in range(5)], axis=-1)
    sio.savemat(gt_dir / "a.mat", {"data": cube.astype(np.float32)})
    shifted = np.roll(cube, (-3, 2), axis=(0, 1))
    sio.savemat(low_dir / "a.mat", {"data": (shifted * 0.3).astype(np.float32)})

    out_csv = tmp_path / "r.csv"
    aligned = tmp_path / "aligned"
    results = align_main([
        "--low_dir", str(low_dir), "--gt_dir", str(gt_dir),
        "--out_csv", str(out_csv), "--save_aligned", str(aligned),
        "--flow_method", "proxy",
    ])
    assert len(results) == 1 and results[0].flag_misaligned
    assert out_csv.exists()
    fixed = sio.loadmat(aligned / "a.mat")["data"]
    # the saved aligned cube has the shift undone (interior matches)
    ref = (cube * 0.3).astype(np.float32)
    assert np.abs(fixed[8:-8, 8:-8] - ref[8:-8, 8:-8]).mean() < 0.02 * ref.mean() + 1e-3


def test_batch_checker_handles_v73_cubes(tmp_path, rng):
    """v7.3 (HDF5) cube pairs must align like v7 ones — the loader goes
    through io_hsi.load_hsi (the raw scipy path raised NotImplementedError
    and every pair silently became an all-NaN 'not misaligned' row)."""
    from sshslie_tpu.utils.io_hsi import save_hsi

    low_dir = tmp_path / "low73"
    gt_dir = tmp_path / "gt73"
    low_dir.mkdir(); gt_dir.mkdir()
    base = _scene(rng)
    cube = np.stack([base * (1 + 0.1 * b) for b in range(4)], axis=-1)
    shifted = np.roll(cube, (-4, -5), axis=(0, 1))
    save_hsi(str(gt_dir / "p.mat"), cube.astype(np.float32), fmt="v7.3")
    save_hsi(str(low_dir / "p.mat"), (shifted * 0.3).astype(np.float32), fmt="v7.3")

    results = check_misregistration_hsi(
        str(low_dir), str(gt_dir), str(tmp_path / "r73.csv"),
        opts=AlignOptions(verbose=False),
    )
    assert len(results) == 1
    assert results[0].flag_misaligned
    assert results[0].shift_px == pytest.approx(np.hypot(4, 5), abs=1.0)


def test_pca_projection_sign_deterministic(rng):
    """SVD's sign is data-dependent; the projection must anchor to the mean
    image's polarity so low/GT pairs correlate positively."""
    from sshslie_tpu.align import project_2d

    base = _scene(rng)
    cube = np.stack([base * (1 + 0.1 * b) for b in range(6)], axis=-1)
    for c in (cube, cube * 0.3 + 0.01):  # exposure change must not flip it
        proj = project_2d(c, "pca")
        mean_proj = c.mean(axis=2)
        corr = np.corrcoef(proj.ravel(), mean_proj.ravel())[0, 1]
        assert corr > 0.5


def test_batch_checker_accepts_envi_pairs(tmp_path, rng):
    """ENVI .hdr inputs pair by basename and align like .mat cubes."""
    from sshslie_tpu.utils.io_envi import save_envi

    low_dir = tmp_path / "low_e"
    gt_dir = tmp_path / "gt_e"
    low_dir.mkdir(); gt_dir.mkdir()
    base = _scene(rng)
    cube_gt = np.stack([base * (1 + 0.1 * b) for b in range(4)], axis=-1)
    shifted = np.roll(cube_gt, (-4, -5), axis=(0, 1))
    save_envi(str(gt_dir / "cap"), cube_gt.astype(np.float32))
    save_envi(str(low_dir / "cap"), (shifted * 0.3).astype(np.float32),
              interleave="bil")
    results = check_misregistration_hsi(
        str(low_dir), str(gt_dir), str(tmp_path / "r.csv"),
        opts=AlignOptions(verbose=False),
    )
    assert len(results) == 1
    assert results[0].flag_misaligned
    assert results[0].shift_px == pytest.approx(np.hypot(4, 5), abs=1.0)
