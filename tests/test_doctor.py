"""Preflight doctor (sshslie_tpu/doctor.py): every check the framework
would otherwise fail at minutes into a run, surfaced up front."""

import os

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.config import Config
from sshslie_tpu.doctor import main as doctor_main, run_doctor
from tests.conftest import make_synthetic_dataset


@pytest.fixture
def workspace(tmp_path, rng):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    make_synthetic_dataset(str(tmp_path), rng, h=32, w=32, c=12)
    yield tmp_path
    os.chdir(cwd)


def _cfg(**kw):
    base = dict(
        channels=12, global_min=200.0, global_max=4095.0, batch_size=2,
        patch_size=16, epoch=1, attention_impl="xla",
        train_data="./data/low/train", eval_data="./data/low/eval",
        test_data="./data/low/test", label_dir="./data/high/test",
        model_name="doc",
    )
    base.update(kw)
    cfg = Config(**base)
    cfg.finalize()
    return cfg


def _levels(rep):
    return {check: lvl for lvl, check, _ in rep.rows}


def test_healthy_workspace_passes(workspace):
    rep = run_doctor(_cfg())
    lv = _levels(rep)
    assert not rep.failed
    assert lv["train files"] == "PASS"
    assert lv["patch size"] == "PASS"
    assert lv["value range"] == "PASS"
    assert lv["test GT pairing"] == "PASS"
    assert lv["checkpoints"] == "PASS"  # fresh run, none required


def test_channel_and_patch_failures(workspace):
    rep = run_doctor(_cfg(channels=99, patch_size=100, phase="train"))
    lv = _levels(rep)
    assert rep.failed
    assert lv["train channels"] == "FAIL"
    assert lv["patch size"] == "FAIL"


def test_mixed_channels_fail(workspace, rng):
    sio.savemat("data/low/train/odd.mat",
                {"data": rng.rand(32, 32, 5).astype(np.float32)})
    rep = run_doctor(_cfg(phase="train"))
    assert _levels(rep)["train channels"] == "FAIL"


def test_value_range_warnings(workspace):
    rep = run_doctor(_cfg(global_min=0.0, global_max=100.0, phase="train"))
    lv = _levels(rep)
    assert lv["value range"] == "WARN"  # data exceeds global_max
    rep2 = run_doctor(_cfg(global_max=1e9, phase="train"))
    assert _levels(rep2)["value range"] == "WARN"  # global_max absurdly high
    # inverted range fails at store load with the underlying message
    rep3 = run_doctor(_cfg(global_max=100.0, phase="train"))
    assert _levels(rep3)["train load"] == "FAIL"


def test_missing_dirs_and_checkpoint_requirements(workspace):
    rep = run_doctor(_cfg(train_data="./nope", phase="train"))
    assert _levels(rep)["train dir"] == "FAIL"
    rep2 = run_doctor(_cfg(phase="test", test_timestamp="20990101_000000"))
    assert _levels(rep2)["checkpoints"] == "FAIL"


def test_gt_pairing_warns_on_missing_labels(workspace):
    os.remove("data/high/test/t0.mat")
    rep = run_doctor(_cfg())
    assert _levels(rep)["test GT pairing"] == "WARN"


def test_cli_exit_codes(workspace):
    assert doctor_main(["--config", "/dev/null", "--channels", "12",
                        "--train_data", "./data/low/train",
                        "--eval_data", "./data/low/eval",
                        "--test_data", "./data/low/test",
                        "--label_dir", "./data/high/test",
                        "--global_min", "200.0", "--global_max", "4095.0",
                        "--patch_size", "16", "--model_name", "doc"]) == 0
    assert doctor_main(["--config", "/dev/null", "--channels", "99",
                        "--train_data", "./data/low/train",
                        "--phase", "train", "--model_name", "doc"]) == 1

def test_value_range_skipped_for_non_global_normalization(workspace):
    """'self'/max normalization never consult global_min/global_max, so the
    raw-max-vs-global_max comparison is not applicable there (advisor r3)."""
    rep = run_doctor(_cfg(normalization="self", global_max=100.0,
                          phase="train"))
    lv = _levels(rep)
    assert lv["value range"] == "PASS"
    row = [msg for _, chk, msg in rep.rows if chk == "value range"][0]
    assert "not applicable" in row


def test_oversized_batch_fails(workspace):
    """batch_size > dataset means zero steps/epoch — fit refuses it
    (PARITY #23), so the doctor must predict that as a FAIL."""
    rep = run_doctor(_cfg(batch_size=64, phase="train"))
    assert _levels(rep)["batch size"] == "FAIL"
    assert rep.failed


def test_whole_cube_fit_boundary(workspace):
    """Eval/test cubes past the measured single-chip whole-cube boundary
    (docs/PERFORMANCE.md "Single-chip max cube") WARN with the sharding fix;
    shapes at or under 2560^2 x 64 (1.6 GiB, largest measured-fitting) are
    silent; eval_sharded: true suppresses the warning entirely."""
    from sshslie_tpu.doctor import Report, _check_whole_cube_fit

    rep = Report()
    _check_whole_cube_fit(_cfg(), rep, "test", [(2560, 2560, 64)])
    assert rep.rows == []  # largest measured-fitting size: no warning

    _check_whole_cube_fit(_cfg(), rep, "test", [(2700, 2700, 64)])
    assert rep.rows[-1][0] == "WARN" and "may OOM" in rep.rows[-1][2]

    _check_whole_cube_fit(_cfg(), rep, "test", [(2880, 2880, 64)])
    assert rep.rows[-1][0] == "WARN"
    assert "measured runtime-OOM" in rep.rows[-1][2]
    assert "eval_sharded" in rep.rows[-1][2]

    before = len(rep.rows)
    _check_whole_cube_fit(_cfg(eval_sharded=True), rep, "test",
                          [(2880, 2880, 64)])
    assert len(rep.rows) == before  # sharded inference: cube is split
