"""Run orchestrator: phase dispatch on top of the TPU-native engine.

Same public surface as the reference (main.py:92-281): phases ``train``,
``test``, ``train_and_test`` (plus ``serve``, net-new); seeding, device
selection, channel inference from the first training cube, MLflow experiment
per run (no-op without an mlflow install), stdout tee to
``logs/console_output_<run>.log`` with restore-in-finally.

The repo-root ``main.py`` is a thin shim over this module so the reference's
``python main.py --config config/*.yml`` invocation keeps working; installed
wheels get the same surface as the ``sshslie`` console script (see
pyproject.toml).
"""

from __future__ import annotations

import os
import random
import sys
import traceback
from glob import glob

import numpy as np

from sshslie_tpu.config import Config, parse_args
from sshslie_tpu.observability import Logger, MLflowShim, RunObserver


def _build_trainer(cfg: Config, channels: int, mesh, mlflow):
    from sshslie_tpu.train import Trainer

    return Trainer(cfg, channels, mesh=mesh, mlflow=mlflow, observer=RunObserver())


def _log_source_artifacts(mlflow) -> None:
    """Log the run's source files so every MLflow run is self-describing
    (reference main.py:243-248 logs its .py files per run). The framework is
    a package, so a git commit stamp + the core engine modules stand in for
    the flat file list; the git stamp is skipped outside a checkout (e.g. an
    installed wheel)."""
    import subprocess

    pkg = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg)
    try:
        # Only stamp when `root` IS a checkout (toplevel == root). Without
        # this, a wheel installed into a venv that lives inside some other
        # project's repo would stamp THAT repo's HEAD as our provenance.
        toplevel = subprocess.run(
            ["git", "-C", root, "rev-parse", "--show-toplevel"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        head = ""
        if toplevel and os.path.realpath(toplevel) == os.path.realpath(root):
            head = subprocess.run(
                ["git", "-C", root, "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
    except (OSError, subprocess.TimeoutExpired):
        head = ""
    if head:
        mlflow.log_param("source_git_commit", head)
    for name in ("runner.py", "config.py", "train.py", "evaluate.py", "metrics.py"):
        path = os.path.join(pkg, name)
        if os.path.exists(path):
            mlflow.log_artifact(path)


def run_train(trainer, cfg: Config) -> None:
    from sshslie_tpu.data.datasets import store_from_config
    from sshslie_tpu.evaluate import evaluate_model

    train_store = store_from_config(cfg, cfg.train_data)
    eval_store = store_from_config(cfg, cfg.eval_data)
    trainer.fit(
        train_store,
        eval_store=eval_store,
        evaluator=evaluate_model,
        eval_result_dir=cfg.eval_result_dir,
        label_dir=cfg.label_dir,
    )


def run_test(trainer, cfg: Config) -> None:
    from sshslie_tpu.data.datasets import store_from_config
    from sshslie_tpu.evaluate import test_model

    # Reference parity keeps the loose "*.*" test glob for .mat datasets;
    # a non-default data_pattern (e.g. "*.hdr" ENVI) must take precedence or
    # the glob would also match the raw .img companions.
    default_pat = getattr(cfg, "data_pattern", "*.mat") in ("", "*.mat")
    test_store = store_from_config(
        cfg, cfg.test_data, pattern="*.*" if default_pat else None)
    print("Found test files:", test_store.files)
    test_model(trainer, cfg.test_model_dir, test_store, cfg.test_result_dir)


def run_eval_metrics(cfg: Config, mlflow) -> None:
    from sshslie_tpu.metrics import calc_metrics

    avg_psnr, avg_ssim, avg_sam = calc_metrics(
        im_dir=os.path.normpath(cfg.test_result_dir + "/*.mat"),
        label_dir=os.path.normpath(cfg.label_dir),
        data_min=None,
        data_max=cfg.global_max,
        mat_key_prediction=cfg.mat_key_prediction,
        mat_key_gt=cfg.mat_key,
    )
    print(f"\n===> Avg.PSNR : {avg_psnr:.4f}")
    print(f"===> Avg.SSIM : {avg_ssim:.4f}")
    print(f"===> Avg.SAM  : {avg_sam:.4f}")
    mlflow.log_metric("PSNR_dB", avg_psnr)
    mlflow.log_metric("SSIM", avg_ssim)
    mlflow.log_metric("SAM", avg_sam)


def main(cfg: Config) -> None:
    log_filepath = os.path.join("logs", "console_output_" + cfg.full_model_name + ".log")
    original_stdout = sys.stdout
    logger = Logger(log_filepath)
    sys.stdout = logger
    try:
        print(f"Console output is being logged to: {log_filepath}")
        print("------ PARAMETERS ------")
        for key, value in cfg.to_dict().items():
            print(f"{key} : {value}")
        print("------------------------")

        random.seed(cfg.seed_value)
        np.random.seed(cfg.seed_value)

        import jax  # deferred so --help never touches the TPU

        if cfg.device:
            # Must happen before any backend use. The env var alone is not
            # enough under launchers that import jax at interpreter start.
            jax.config.update("jax_platforms", cfg.device)
        if cfg.matmul_precision:
            # TPU matmuls/convs on float32 inputs run bf16 MXU passes by
            # default (XLA bf16 propagation) — the same class of silent
            # downcast as the reference's cuDNN TF32 default. 'float32' /
            # 'highest' forces full-precision passes at ~3x conv cost.
            jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
        # On by default — kills the 20-40 s first-compile on repeat runs.
        from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

        enable_jit_cache(cfg.jit_cache_dir)
        print("Using devices:", jax.devices())

        mesh = None
        if cfg.mesh_shape:
            from sshslie_tpu.parallel.mesh import make_mesh, parse_mesh_shape

            # Name the axes from the config — a non-default data_axis/
            # space_axis must reach the Mesh, or every sharding lookup
            # KeyErrors on the hardcoded names.
            n_axes = len(parse_mesh_shape(cfg.mesh_shape))
            names = ((cfg.data_axis,) if n_axes == 1
                     else (cfg.data_axis, cfg.space_axis or "space"))
            mesh = make_mesh(cfg.mesh_shape, axis_names=names)
            print("Mesh:", mesh)

        # Channel inference from the first training cube (reference
        # main.py:214-223) — through data_pattern, not a loose "*.*": a
        # stray notes.txt (or an ENVI raw companion sorting before its
        # .hdr) must not crash startup.
        channels = cfg.channels
        pattern = getattr(cfg, "data_pattern", "*.mat") or "*.mat"
        train_files = sorted(glob(os.path.join(cfg.train_data, pattern)))
        if channels is None:
            if not train_files:
                print("No training files found.")
                return
            from sshslie_tpu.utils.io_hsi import load_hsi

            first = load_hsi(
                train_files[0], mat_key=cfg.mat_key, normalization=cfg.normalization,
                max_val=cfg.global_max, min_val=cfg.global_min,
            )
            channels = first.shape[-1]
            cfg.channels = channels

        mlflow = MLflowShim(enabled=cfg.use_mlflow)
        trainer = _build_trainer(cfg, channels, mesh, mlflow)

        if cfg.pretrained_model and not os.path.exists(cfg.pretrained_model):
            # A typo'd explicit path must not silently train from random
            # init for hours; only '' means "no warm start".
            raise FileNotFoundError(
                f"pretrained_model {cfg.pretrained_model!r} does not exist"
            )
        if cfg.pretrained_model and os.path.exists(cfg.pretrained_model):
            print(f"Loading pretrained model from: {cfg.pretrained_model}")
            trainer.load_pretrained(cfg.pretrained_model)
            if cfg.freeze_decom_epochs > 0:
                print(
                    "decomposition network will be frozen for the first "
                    f"{cfg.freeze_decom_epochs} epochs"
                )
        elif trainer.freeze_decom_epochs > 0:
            # Reference semantics (main.py:196-212): freeze_decom_epochs
            # only applies when pretrained weights were actually loaded —
            # freezing a randomly-initialized DecompositionNet would just
            # degrade training silently.
            print("freeze_decom_epochs ignored: no pretrained model loaded "
                  "(reference main.py:196-212 semantics)")
            trainer.freeze_decom_epochs = 0

        mlflow.set_experiment(cfg.full_model_name)
        with mlflow.start_run():
            run_params = {
                "phase": cfg.phase,
                "data_min": cfg.global_min,
                "data_max": cfg.global_max,
                "seed": cfg.seed_value,
                "patch_size": cfg.patch_size,
                "model_name": cfg.full_model_name,
            }
            for key in (
                "c_loss_reconstruction", "c_loss_r_fidelity", "c_loss_i_smooth_low",
                "c_loss_i_smooth_delta", "c_loss_fourier", "c_loss_spectral_cons",
                "alpha_i_smooth_low", "alpha_i_smooth_delta",
            ):
                run_params[key] = getattr(cfg, key)
            # One batched call (reference model.py:264 does the same): the
            # file tracker rewrites params.json per call.
            mlflow.log_params(run_params)
            if cfg.config_path:
                mlflow.log_artifact(cfg.config_path)
            _log_source_artifacts(mlflow)

            if cfg.phase == "train":
                mlflow.log_param("data_train", cfg.train_data)
                run_train(trainer, cfg)
            elif cfg.phase == "test":
                mlflow.log_param("data_test", cfg.test_data)
                run_test(trainer, cfg)
                run_eval_metrics(cfg, mlflow)
            elif cfg.phase == "train_and_test":
                mlflow.log_param("data_train", cfg.train_data)
                mlflow.log_param("data_test", cfg.test_data)
                run_train(trainer, cfg)
                # cfg.test_model_dir (derived in Config.finalize from this
                # run's timestamp) already points at the checkpoints this
                # run just wrote.
                run_test(trainer, cfg)
                run_eval_metrics(cfg, mlflow)
            elif cfg.phase == "serve":
                from sshslie_tpu.serve import serve_from_config

                serve_from_config(cfg, mesh=mesh)
            else:
                raise ValueError(f"unknown phase {cfg.phase!r}")

            mlflow.log_artifact(log_filepath, artifact_path="run_logs")
    except Exception as e:
        print(f"\n--- An error occurred: {e} ---")
        traceback.print_exc(file=sys.stdout)
        raise
    finally:
        if sys.stdout is logger:
            sys.stdout = original_stdout
            logger.close()
        print(f"Final console output log is available at: {log_filepath}")


def cli(argv=None) -> None:
    """Console-script entry point (``sshslie`` when installed as a wheel)."""
    main(parse_args(argv))
    print("Job finished...")
