"""Visualization toolkit tests: band picking, stretches, composites, spectra
windows (incl. the reference's window² normalization quirk), grids, export."""

import os

import numpy as np
import pytest

from sshslie_tpu import viz


def test_band_indices_nearest():
    # 64 bands from 414.63 to 985.05 nm (JYU axis)
    idx = viz.band_indices_for_wavelengths(64, 414.63, 985.05, (650.0, 550.0, 468.0))
    wl = np.linspace(414.63, 985.05, 64)
    for i, t in zip(idx, (650.0, 550.0, 468.0)):
        assert abs(wl[i] - t) == min(abs(wl - t))


def test_pct_stretch(rng):
    img = rng.rand(32, 32) * 100
    out = viz.pct_stretch(img, 2, 98)
    assert out.min() == 0.0 and out.max() == 1.0
    flat = viz.pct_stretch(np.ones((4, 4)))
    assert (flat == 0).all()


def test_min_max_stretch(rng):
    cube = rng.rand(8, 8, 3) * np.array([1, 10, 100])
    out = viz.min_max_stretch(cube)
    for b in range(3):
        assert out[..., b].min() == pytest.approx(0.0)
        assert out[..., b].max() == pytest.approx(1.0)


def test_false_color_modes(rng):
    cube = rng.rand(16, 16, 32).astype(np.float32) * 50
    for mode in ("none", "zeroOne", "divideMax", "percClip"):
        rgb = viz.false_color(cube, 400, 1000, normalization=mode)
        assert rgb.shape == (16, 16, 3)
    rgb = viz.false_color(cube, 400, 1000, normalization="divideGlobalMax",
                          global_max=50.0)
    assert rgb.max() <= 1.0
    with pytest.raises(ValueError):
        viz.false_color(cube, 400, 1000, normalization="divideGlobalMax")
    with pytest.raises(ValueError):
        viz.false_color(cube, 400, 1000, normalization="wat")


def test_shared_display_params(rng):
    cubes = [rng.rand(8, 8, 16) * s for s in (1.0, 2.0)]
    idx = viz.band_indices_for_wavelengths(16, 400, 1000, viz.TRUE_COLOR)
    dp = viz.compute_display_params(cubes, idx, method="fixedMax", gamma=2.2)
    rgb0 = viz.false_color(cubes[0], 400, 1000, targets_nm=viz.TRUE_COLOR,
                           normalization="shared", display_params=dp)
    rgb1 = viz.false_color(cubes[1], 400, 1000, targets_nm=viz.TRUE_COLOR,
                           normalization="shared", display_params=dp)
    # shared ranges: the brighter cube must render brighter
    assert rgb1.mean() > rgb0.mean()
    dp2 = viz.compute_display_params(cubes, idx, method="percentile", pct=95)
    assert (dp2.channel_max <= dp.channel_max + 1e-9).all()


def test_windowed_spectrum_center(rng):
    cube = rng.rand(20, 20, 7)
    spec = viz.windowed_spectrum(cube, x=10, y=10, window_size=5)
    want = cube[8:13, 8:13].sum(axis=(0, 1)) / 25.0
    np.testing.assert_allclose(spec, want)


def test_windowed_spectrum_border_divides_by_full_window(rng):
    """Reference quirk: clipped border windows still divide by window²
    (plot_spectra.py:316-318)."""
    cube = np.ones((10, 10, 3))
    spec = viz.windowed_spectrum(cube, x=0, y=0, window_size=5)
    # window is 5×5 clipped to start at 0 → full 5×5 here since start=max(0,-2)=0
    np.testing.assert_allclose(spec, np.ones(3))
    spec_edge = viz.windowed_spectrum(cube, x=9, y=9, window_size=5)
    # clipped to 3×3 but divided by 25
    np.testing.assert_allclose(spec_edge, np.full(3, 9 / 25.0))


def test_figure_exports(tmp_path, rng):
    cube = {"A": rng.rand(12, 12, 8), "B": rng.rand(12, 12, 8)}
    paths = viz.plot_spectra_at_points(cube, [(5, 5), (2, 8)], str(tmp_path / "sp"))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    rgb = viz.false_color(cube["A"], 400, 900, normalization="zeroOne")
    p = viz.save_false_color_figure(rgb, str(tmp_path / "fc.png"), points=[(3, 3)])
    assert os.path.exists(p)

    g = viz.comparison_grid({"A": rgb, "B": rgb}, str(tmp_path / "grid.png"))
    assert os.path.exists(g)


def test_viz_cli_main(tmp_path, rng):
    """python -m sshslie_tpu.viz — composite export CLI (single, grid)."""
    import scipy.io as sio

    from sshslie_tpu.viz import main as viz_main

    a = (rng.rand(16, 16, 12) * 900).astype(np.float32)
    b = (rng.rand(16, 16, 12) * 900).astype(np.float32)
    sio.savemat(tmp_path / "a.mat", {"data": a})
    sio.savemat(tmp_path / "b.mat", {"data": b})

    out = tmp_path / "one.png"
    written = viz_main(["--cube", str(tmp_path / "a.mat"), "--out", str(out),
                        "--wave_start", "414.6", "--wave_end", "985.0",
                        "--preset", "jyu", "--point", "4,5"])
    assert written == [str(out)] and out.exists()

    grid = tmp_path / "grid.png"
    written = viz_main(["--cube", f"A={tmp_path/'a.mat'}",
                        "--cube", f"B={tmp_path/'b.mat'}",
                        "--out", str(grid), "--grid",
                        "--wave_start", "414.6", "--wave_end", "985.0",
                        "--normalization", "shared"])
    assert written == [str(grid)] and grid.exists()


def test_inspect_spectra_cli_headless(tmp_path, rng):
    """python -m sshslie_tpu.inspect_spectra --save — headless static export."""
    import scipy.io as sio

    from sshslie_tpu.inspect_spectra import main as inspect_main

    cube = (rng.rand(20, 20, 8) * 100).astype(np.float32)
    sio.savemat(tmp_path / "c.mat", {"data": cube})
    out = tmp_path / "probe.png"
    insp = inspect_main(["--cube", f"C={tmp_path/'c.mat'}",
                         "--wave_start", "400", "--wave_end", "900",
                         "--point", "3,4", "--point", "10,12",
                         "--white", "0,5,0,5", "--save", str(out)])
    assert out.exists()
    specs = insp.spectra()
    assert len(specs["C"]) == 2 and specs["C"][0].shape == (8,)


def test_viz_cli_experiment_registry(tmp_path, rng):
    """--experiment expands registry captures and supplies the wavelength
    range, mirroring the MATLAB drag_expCustom.m + fetchExperimentData.m
    workflow; explicit flags still win."""
    import scipy.io as sio
    import yaml

    from sshslie_tpu.viz import main as viz_main

    for name in ("s1", "s2"):
        sio.savemat(tmp_path / f"{name}.mat",
                    {"data": (rng.rand(16, 16, 12) * 900).astype(np.float32)})
    reg = tmp_path / "experiments.yml"
    reg.write_text(yaml.safe_dump({
        "demo": {
            "description": "two synthetic captures",
            "wave_start_nm": 414.6,
            "wave_end_nm": 985.0,
            "captures": ["s1.mat", "s2.mat"],
        }
    }))

    out = tmp_path / "figs"
    written = viz_main(["--experiment", "demo", "--registry", str(reg),
                        "--base_dir", str(tmp_path), "--out", str(out)])
    assert len(written) == 2
    assert (out / "s1.png").exists() and (out / "s2.png").exists()

    # no cubes and no experiment → actionable exit, not a stack trace
    import pytest

    with pytest.raises(SystemExit):
        viz_main(["--out", str(out), "--wave_start", "414.6",
                  "--wave_end", "985.0"])
    with pytest.raises(SystemExit):
        viz_main(["--cube", str(tmp_path / "s1.mat"), "--out", str(out)])


def test_point_labels_beyond_26_and_empty_grid(rng):
    from sshslie_tpu.viz import _point_label, comparison_grid

    assert _point_label(0) == "a" and _point_label(25) == "z"
    assert _point_label(26) == "a1" and _point_label(53) == "b2"
    with pytest.raises(ValueError, match="at least one image"):
        comparison_grid({}, "nowhere.png")
