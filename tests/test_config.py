"""Config precedence, derived paths, CLI parsing (reference main.py:16-90 parity)."""

import os

import pytest
import yaml

from sshslie_tpu.config import Config, load_config, parse_args


def test_defaults_match_reference_surface():
    cfg = Config()
    # Spot-check the reference's hardcoded defaults (main.py:17-55).
    assert cfg.seed_value == 41
    assert cfg.patch_size == 128
    assert cfg.start_lr == 0.001
    assert cfg.c_loss_i_smooth_delta == 20.0
    assert cfg.c_loss_fourier == 0.2
    assert cfg.phase == "train_and_test"
    assert cfg.model_name == "no_name_model"


def test_yaml_overrides_defaults(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"batch_size": 4, "model_name": "m1"}))
    cfg = load_config(str(p))
    assert cfg.batch_size == 4
    assert cfg.model_name == "m1"
    assert cfg.patch_size == 128  # untouched default


def test_cli_overrides_yaml(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"batch_size": 4}))
    cfg = load_config(str(p), overrides={"batch_size": 8})
    assert cfg.batch_size == 8


def test_unknown_yaml_key_raises(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"batch_sizee": 4}))
    with pytest.raises(KeyError):
        load_config(str(p))


def test_derived_paths_layout(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"model_name": "mx"}))
    cfg = load_config(str(p))
    assert cfg.full_model_name.startswith("mx_")
    assert cfg.model_ckpt_dir == os.path.join(".", "checkpoint", "mx")
    assert "eval_results_mx_" in cfg.eval_result_dir
    assert "test_results_mx_" in cfg.test_result_dir


def test_test_phase_uses_test_timestamp(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"model_name": "mx", "phase": "test",
                                 "test_timestamp": "20250101_000000"}))
    cfg = load_config(str(p))
    # Checkpoint dir points at the trained run; result dir carries the _test_ postfix.
    assert cfg.test_model_dir.endswith("Decomposition_20250101_000000")
    assert "_test_" in cfg.full_model_name


def test_parse_args_cli_types(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"batch_size": 2}))
    cfg = parse_args([
        "--config", str(p),
        "--batch_size", "16",
        "--start_lr", "0.01",
        "--save_reflectance", "true",
        "--channels", "224",
    ])
    assert cfg.batch_size == 16 and isinstance(cfg.batch_size, int)
    assert cfg.start_lr == 0.01
    assert cfg.save_reflectance is True
    assert cfg.channels == 224


def test_shipped_configs_load():
    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")
    for name in sorted(os.listdir(root)):
        cfg = load_config(os.path.join(root, name))
        assert cfg.channels in (64, 224)
        assert cfg.phase in ("train", "test", "train_and_test")


def test_resume_autodiscovers_latest_run(tmp_path, monkeypatch):
    """resume without test_timestamp adopts the newest run directory that
    holds a resumable checkpoint."""
    import os
    import time

    from sshslie_tpu.config import Config

    monkeypatch.chdir(tmp_path)
    for ts in ("20260101_000000", "20260102_000000"):
        d = tmp_path / "checkpoint" / "m" / f"Decomposition_{ts}"
        d.mkdir(parents=True)
        (d / "model_epoch_latest.ckpt").write_bytes(b"x")
        time.sleep(0.01)
    # a run without a latest checkpoint must not be picked
    d3 = tmp_path / "checkpoint" / "m" / "Decomposition_20260103_000000"
    d3.mkdir(parents=True)

    cfg = Config(model_name="m", resume=True).finalize()
    assert cfg.timestamp == "20260102_000000"
    assert cfg.test_model_dir.endswith("Decomposition_20260102_000000")

    # explicit test_timestamp wins
    cfg2 = Config(model_name="m", resume=True,
                  test_timestamp="20260101_000000").finalize()
    assert cfg2.timestamp == "20260101_000000"

    # no checkpoints at all → fresh run (timestamp generated)
    cfg3 = Config(model_name="nope", resume=True).finalize()
    assert cfg3.timestamp not in ("", None)


def test_matmul_precision_key(tmp_path):
    """PARITY #20: the TPU bf16-MXU default gets an explicit opt-out knob."""
    import yaml

    p = tmp_path / "c.yml"
    yaml.safe_dump({"matmul_precision": "float32"}, open(p, "w"))
    cfg = load_config(str(p))
    assert cfg.matmul_precision == "float32"
    assert Config().matmul_precision == ""


def test_enum_values_validated_at_load(tmp_path):
    """Typo'd enum values fail at startup naming the choices, not inside fit."""
    import yaml

    for key, bad in (("sampler", "cuda"), ("phase", "training"),
                     ("precision", "fp16"), ("fused_pipeline", "yes"),
                     ("attention_impl", "flash"), ("normalization", "zscore")):
        p = tmp_path / f"{key}.yml"
        yaml.safe_dump({key: bad}, open(p, "w"))
        with pytest.raises(ValueError, match=key):
            load_config(str(p))
    # valid values still pass
    p = tmp_path / "ok.yml"
    yaml.safe_dump({"sampler": "native", "normalization": None,
                    "matmul_precision": "float32"}, open(p, "w"))
    cfg = load_config(str(p))
    assert cfg.sampler == "native" and cfg.normalization is None


def test_positive_int_fields_validated_at_load(tmp_path):
    """epoch/batch/patch/cadence zeros silently degrade a run (0 epochs
    trains nothing then test dies on the missing checkpoint; 0 cadence
    ZeroDivisionErrors mid-run) — refuse them at startup, by name."""
    import yaml

    for key, bad in (("epoch", 0), ("batch_size", 0), ("patch_size", -1),
                     ("eval_every_epoch", 0), ("plot_every_epoch", 0)):
        p = tmp_path / f"{key}.yml"
        yaml.safe_dump({key: bad}, open(p, "w"))
        with pytest.raises(ValueError, match=key):
            load_config(str(p))
    # meaningful or safely-clamped zeros stay legal (back-compat: these
    # loaded and ran before the validation existed)
    p = tmp_path / "ok.yml"
    yaml.safe_dump({"checkpoint_keep": 0, "log_every_step": 0,
                    "freeze_decom_epochs": 0, "seed_value": 0,
                    "prefetch_batches": 0, "eval_batch": 0}, open(p, "w"))
    cfg = load_config(str(p))
    assert cfg.checkpoint_keep == 0 and cfg.prefetch_batches == 0
