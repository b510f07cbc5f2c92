"""Smoke tests for the offline analysis CLIs (replacing reference
plot_psnr_ssim.py / plot_spectra.py, SURVEY §2 P17/P18): they must run
end-to-end on synthetic data and write their figures."""

import os
import sys

import numpy as np
import pytest
import scipy.io as sio

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")


def _load_script(name):
    """Import a scripts/*.py by file path — the reference checkout (added to
    sys.path by the parity tests) ships same-named modules that would shadow
    ours under a plain ``import``."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"sshslie_scripts_{name}", os.path.join(SCRIPTS, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def dataset(tmp_path, rng):
    gt = tmp_path / "gt"
    ours = tmp_path / "ours"
    gt.mkdir(), ours.mkdir()
    for name in ("a.mat", "b.mat"):
        clean = (rng.rand(20, 20, 8) * 4000).astype(np.float32)
        sio.savemat(gt / name, {"data": clean})
        noisy = clean + rng.randn(20, 20, 8).astype(np.float32) * 50
        sio.savemat(ours / name, {"data": noisy})
    return str(gt), str(ours)


def test_plot_bandwise_metrics_cli(tmp_path, dataset):
    plot_bandwise_metrics = _load_script("plot_bandwise_metrics")

    gt, ours = dataset
    out = tmp_path / "figs"
    plot_bandwise_metrics.main([
        "--label_dir", gt, "--out", str(out),
        "--algo", f"Ours={ours}", "--data_max", "4095",
        "--wave_start", "400", "--wave_end", "1000",
    ])
    written = os.listdir(out)
    assert any(f.endswith(".png") for f in written), written


def test_plot_spectra_cli(tmp_path, dataset):
    plot_spectra = _load_script("plot_spectra")

    gt, ours = dataset
    out = tmp_path / "figs2"
    plot_spectra.main([
        "--cube", f"GT={gt}/a.mat", "--cube", f"Ours={ours}/a.mat",
        "--point", "10,10", "--out", str(out),
        "--wave_start", "414.63", "--wave_end", "985.05",
        "--palette", "jyu",
    ])
    written = os.listdir(out)
    assert any(f.endswith(".png") for f in written), written
