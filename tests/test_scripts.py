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


def test_profile_step_cli(tmp_path):
    """The profiling tool runs on the CPU backend and attributes device time
    to source lines (the method behind docs/PERFORMANCE.md's step anatomy)."""
    import scripts.profile_step as ps

    by_src = ps.main([
        "--batch", "1", "--patch", "16", "--channels", "4",
        "--precision", "float32", "--steps", "2",
        "--trace_dir", str(tmp_path / "prof"),
    ])
    # The CPU backend emits no per-op HLO events (attribution is TPU-only);
    # the tool must still run the step, write a trace, and say so. On an
    # accelerator the result maps conv time to layers.py.
    import jax

    if jax.default_backend() == "cpu":
        assert by_src == {}
    else:  # pragma: no cover - accelerator-only branch
        assert any("conv" in k for k in by_src)
    # the HLO source map itself works on every backend
    assert ps.hlo_source_map('%f.1 = f32[] fusion(), metadata={op_name="a/b" '
                             'source_file="/x/layers.py" source_line=69}'
                             ) == {"f.1": "layers.py:69  b"}


def test_make_synthetic_dataset_cli(tmp_path):
    """The zero-setup dataset generator emits the reference layout plus a
    loadable config whose paths resolve (the TPU demo in PERFORMANCE.md runs
    exactly this)."""
    import os

    import scipy.io as sio

    import scripts.make_synthetic_dataset as gen
    from sshslie_tpu.config import load_config

    out = tmp_path / "synth"
    gen.main(["--out", str(out), "--size", "48", "--channels", "6",
              "--train", "2", "--eval", "1", "--test", "1", "--epochs", "3"])
    for sub in ("low/train", "low/eval", "low/test", "high/eval", "high/test"):
        assert os.listdir(out / sub), sub
    # darkened lows really are darker than their GT
    low = sio.loadmat(str(next((out / "low/test").glob("*.mat"))))["data"]
    high = sio.loadmat(str(next((out / "high/test").glob("*.mat"))))["data"]
    assert low.mean() < 0.5 * high.mean()
    cfg = load_config(str(out / "config.yml"))
    assert cfg.channels == 6 and cfg.epoch == 3


def test_make_synthetic_dataset_blocks_scene(tmp_path):
    """--scene blocks: piecewise spectra with real structure (the gallery
    source); still darker lows, same layout."""
    import scipy.io as sio

    import scripts.make_synthetic_dataset as gen

    out = tmp_path / "blocks"
    gen.main(["--out", str(out), "--size", "48", "--channels", "6",
              "--train", "1", "--eval", "1", "--test", "1",
              "--scene", "blocks"])
    low = sio.loadmat(str(next((out / "low/test").glob("*.mat"))))["data"]
    high = sio.loadmat(str(next((out / "high/test").glob("*.mat"))))["data"]
    assert low.mean() < 0.5 * high.mean()
    # piecewise structure: distinct spectra across regions → the per-pixel
    # spectral argmax is not a single global band everywhere
    import numpy as np

    assert len(np.unique(high.argmax(axis=2))) > 1


def test_make_gallery_cli(tmp_path):
    """scripts/make_gallery.py writes the reference-style before/after pairs
    plus grid and spectra figures from a (low, enhanced, GT) triplet."""
    import numpy as np
    import scipy.io as sio

    import scripts.make_gallery as mg

    rng = np.random.RandomState(0)
    base = rng.rand(32, 32, 6).astype(np.float32)
    for sub, scale in (("low", 300.0), ("enh", 3500.0), ("gt", 3800.0)):
        os.makedirs(tmp_path / sub, exist_ok=True)
        sio.savemat(str(tmp_path / sub / "t0.mat"),
                    {"data": (base * scale).astype(np.float32)})
    written = mg.main([
        "--low_dir", str(tmp_path / "low"),
        "--enhanced_dir", str(tmp_path / "enh"),
        "--gt_dir", str(tmp_path / "gt"),
        "--out", str(tmp_path / "gal"),
        "--data_max", "4095", "--points", "16,16",
    ])
    names = {os.path.relpath(p, tmp_path / "gal") for p in written}
    assert {"before/t0.png", "after/t0.png", "grid_t0.png"} <= names
    assert any(n.startswith("spectra_t0") for n in names)


def test_make_gallery_pairs_longest_prefix_wins(tmp_path):
    """Suffixed enhanced names pair with the LONGEST matching low input:
    `test10_S` must pair with `test10`, not `test1` (review r4 — the
    ambiguous case was silently dropped before)."""
    import scipy.io as sio

    import scripts.make_gallery as mg

    low, enh = tmp_path / "low", tmp_path / "enh"
    os.makedirs(low), os.makedirs(enh)
    cube = {"data": np.zeros((4, 4, 2), np.float32)}
    for name in ("test1", "test10"):
        sio.savemat(str(low / f"{name}.mat"), cube)
    sio.savemat(str(enh / "test10_S.mat"), cube)
    sio.savemat(str(enh / "test1_S.mat"), cube)
    pairs = {key: os.path.basename(lo)
             for key, lo, _ in mg._pairs(str(low), str(enh))}
    assert pairs == {"test10": "test10.mat", "test1": "test1.mat"}


def test_fused_window_bench_cli(tmp_path):
    """scripts/fused_window_bench.py end-to-end on CPU at toy scale: both
    pipelines train, the report carries the swap decomposition fields."""
    import scripts.fused_window_bench as fwb

    report = fwb.main([
        "--n", "4", "--size", "48", "--channels", "6", "--window", "2",
        "--batch", "2", "--patch", "16", "--epochs", "2",
        "--data", str(tmp_path / "cubes"), "--device", "cpu",
    ])
    for key in ("resident", "windowed", "disk_load_window_cold_s",
                "h2d_window_forced_s"):
        assert key in report, key
    assert report["windowed"]["swap_visible_s"]
    assert np.isfinite(report["windowed"]["final_loss"])


@pytest.mark.skipif(not os.path.exists("/root/reference/model.py"),
                    reason="reference checkout not available")
def test_parity_ab_study_small(tmp_path):
    """scripts/parity_ab_study.py end-to-end at toy scale (fresh subprocess,
    exactly as a user runs it): both frameworks' loaders agree bit-for-bit,
    and over a short horizon — before float-chaos amplification, see the
    study notes in docs/PARITY.md — the trained-metric deltas sit inside the
    parity budget."""
    import json
    import subprocess

    out = tmp_path / "report.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "parity_ab_study.py"),
         "--steps", "25", "--channels", "8", "--patch", "24", "--cube", "64",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(out.read_text())
    assert rep["loader_max_abs_delta"] == 0.0
    assert rep["delta_psnr_db"] < 0.1, rep
    assert rep["delta_ssim"] < 0.01, rep
    assert rep["trained_output_cross_psnr_db"] > 35, rep


def test_library_quickstart_example(tmp_path):
    """examples/library_quickstart.py (the docs/API.md companion) must stay
    runnable: train → checkpoint restore → inference → int8 quantization →
    metrics, all through the library API. Subprocess because the example
    chdir's into its own scratch dir."""
    import subprocess

    example = os.path.join(os.path.dirname(SCRIPTS), "examples",
                           "library_quickstart.py")
    proc = subprocess.run(
        [sys.executable, example], capture_output=True, text=True, timeout=540,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "restored epoch 4" in proc.stdout
    assert "int8 vs fp32" in proc.stdout
    assert "enhanced vs GT" in proc.stdout


def test_bench_gate(tmp_path):
    """bench_gate: PASS on a historical result, FAIL (exit 1) on a degraded
    one, exit 2 when the result has no comparable metric. Gated against the
    committed BENCH_r*.json history; --json path, no TPU."""
    import json

    gate = _load_script("bench_gate")
    repo = os.path.dirname(SCRIPTS)
    hist = os.path.join(repo, "BENCH_r04.json")
    assert gate.main(["--json", hist]) == 0

    rec = json.load(open(hist))["parsed"]
    rec["value"] *= 0.9
    bad = tmp_path / "degraded.json"
    bad.write_text(json.dumps(rec))
    assert gate.main(["--json", str(bad)]) == 1

    empty = tmp_path / "empty.json"
    empty.write_text(json.dumps({"metric": "hsi_train_throughput"}))
    assert gate.main(["--json", str(empty)]) == 2
