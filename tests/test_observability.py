"""Observability: tee logger, local-file tracker fallback, plots, summaries,
checkpoint pruning, experiment registry."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from sshslie_tpu.checkpoints import prune_checkpoints, save_checkpoint
from sshslie_tpu.experiments import fetch_experiment_data, list_experiments, load_registry
from sshslie_tpu.observability import (
    Logger,
    LocalRunTracker,
    MLflowShim,
    RunObserver,
    param_summary,
)


def test_logger_tees(tmp_path, capsys):
    logpath = str(tmp_path / "log.txt")
    orig = sys.stdout
    logger = Logger(logpath)
    sys.stdout = logger
    try:
        print("hello tee")
    finally:
        sys.stdout = orig
        logger.close()
    assert "hello tee" in open(logpath).read()
    assert "hello tee" in capsys.readouterr().out


def test_local_tracker_files(tmp_path):
    t = LocalRunTracker(str(tmp_path / "runs"))
    t.set_experiment("exp1")
    with t.start_run():
        t.log_param("lr", 0.001)
        t.log_params({"batch": 2, "weird": [1, 2]})
        t.log_metric("loss", 1.5, step=0)
        t.log_metrics({"loss": 1.2, "psnr": 30.0}, step=1)
        art = tmp_path / "a.txt"
        art.write_text("artifact")
        t.log_artifact(str(art))
    d = tmp_path / "runs" / "exp1"
    params = json.load(open(d / "params.json"))
    assert params["lr"] == 0.001 and params["batch"] == 2
    lines = [json.loads(l) for l in open(d / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["psnr"] == 30.0
    assert (d / "artifacts" / "a.txt").exists()


def test_mlflow_shim_falls_back_to_local(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shim = MLflowShim(enabled=True)
    assert shim.active
    shim.set_experiment("e")
    with shim.start_run():
        shim.log_metric("m", 1.0, step=0)
    assert os.path.exists("runs/e/metrics.jsonl")
    off = MLflowShim(enabled=False)
    assert not off.active
    with off.start_run():
        off.log_metric("m", 1.0)  # no-op, no crash


def test_param_summary_counts():
    params = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}}
    s = param_summary(params)
    assert "16" in s and "Total params: 16" in s


def test_plots_render(tmp_path):
    obs = RunObserver()
    losses = {k: [1.0, 0.5, 0.3] for k in (
        "total_loss", "L_reconstruction", "L_R_fidelity", "L_I_smooth_low",
        "L_I_smooth_delta", "L_fourier", "L_spectral_cons")}
    obs.plot_loss_curve(losses, str(tmp_path / "loss.png"))
    obs.drain()  # plots render on a worker thread by default
    assert (tmp_path / "loss.png").exists()
    obs.plot_eval_metrics(
        {100: {"psnr": 30.0, "ssim": 0.9, "sam": 0.1},
         200: {"psnr": 31.0, "ssim": 0.92, "sam": 0.09}},
        str(tmp_path / "eval.png"))
    obs.drain()
    assert (tmp_path / "eval.png").exists()


def test_plots_sync_mode(tmp_path):
    obs = RunObserver(async_plots=False)
    losses = {k: [1.0, 0.5] for k in (
        "total_loss", "L_reconstruction", "L_R_fidelity", "L_I_smooth_low",
        "L_I_smooth_delta", "L_fourier", "L_spectral_cons")}
    obs.plot_loss_curve(losses, str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()


def test_prune_checkpoints(tmp_path):
    d = str(tmp_path)
    params = {"w": np.zeros(3)}
    for e in (1, 2, 3, 4):
        save_checkpoint(os.path.join(d, f"model_epoch_{e}"), params, {}, e)
    save_checkpoint(os.path.join(d, "model_epoch_latest"), params, {}, 4)
    prune_checkpoints(d, keep=2)
    names = sorted(os.listdir(d))
    assert "model_epoch_1.ckpt" not in names
    assert "model_epoch_2.ckpt" not in names
    assert "model_epoch_3.ckpt" in names and "model_epoch_4.ckpt" in names
    assert "model_epoch_latest.ckpt" in names


def test_experiment_registry(tmp_path):
    spec = {
        "jyu_indoor_100ms": {
            "description": "indoor captures",
            "wave_start_nm": 414.63,
            "wave_end_nm": 985.05,
            "captures": ["a.mat", "b.mat"],
            "integration_ms": 100,
        },
        "jyu_outdoor": {"captures": ["c.mat"]},
    }
    p = tmp_path / "exp.yml"
    p.write_text(yaml.safe_dump(spec))
    assert list_experiments(str(p)) == ["jyu_indoor_100ms", "jyu_outdoor"]
    exp = fetch_experiment_data("jyu_indoor_100ms", str(p), base_dir="/data")
    assert exp.captures == ["/data/a.mat", "/data/b.mat"]
    assert exp.wave_start_nm == 414.63
    assert exp.extra["integration_ms"] == 100
    reg = load_registry(str(p))
    with pytest.raises(KeyError):
        reg.fetch("nope")
    bad = tmp_path / "bad.yml"
    bad.write_text(yaml.safe_dump({"x": {"description": "no captures"}}))
    with pytest.raises(ValueError):
        load_registry(str(bad))


def test_mlflow_shim_degrades_on_backend_failure(tmp_path, monkeypatch):
    """A configured-but-broken mlflow backend (unreachable tracking server)
    must degrade to the file tracker, not kill the run — the reference's
    hard server dependency (main.py:225) is the behavior being fixed."""
    from sshslie_tpu.observability import LocalRunTracker, MLflowShim

    shim = MLflowShim(enabled=True, local_root=str(tmp_path / "runs"))

    class _Dead:
        def __getattr__(self, name):
            def boom(*a, **k):
                raise ConnectionError("tracking server unreachable")
            return boom

    shim._backend = _Dead()
    shim.set_experiment("exp")          # must not raise
    assert isinstance(shim._backend, LocalRunTracker)
    shim.log_param("k", "v")
    with shim.start_run():
        shim.log_metric("m", 1.0, step=0)
