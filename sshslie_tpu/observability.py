"""Observability: console tee logger, MLflow shim, loss/metric plots, profiling.

The reference logs through three channels (SURVEY.md §5): MLflow
params/metrics/artifacts (main.py:225-264, model.py:333-341), a stdout tee to a
log file (logger.py:3-24), and matplotlib curves (model.py:609-717). All three
are reproduced; MLflow degrades to a transparent no-op when the package or a
tracking server is absent, so training never depends on it. A
``jax.profiler`` trace option replaces the reference's wall-clock-only timing.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


class Logger:
    """Tee stdout to the terminal and a UTF-8 log file (reference logger.py:3-24)."""

    def __init__(self, filepath: str):
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        self.terminal = sys.stdout
        self.log = open(filepath, "w", encoding="utf-8")

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)
        self.flush()

    def flush(self) -> None:
        self.terminal.flush()
        self.log.flush()

    def close(self) -> None:
        self.log.close()


class _NoOpRun:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _SafeRun:
    """Wrap a backend run context so a tracking failure at run END (e.g.
    mlflow.end_run against a server that died mid-run) cannot turn a fully
    successful training run into a nonzero exit."""

    def __init__(self, run):
        self._run = run

    def __enter__(self):
        try:
            return self._run.__enter__()
        except AttributeError:
            return self._run

    def __exit__(self, *exc):
        try:
            return self._run.__exit__(*exc)
        except AttributeError:
            return False
        except Exception as e:  # noqa: BLE001
            print(f"tracking run close failed ({type(e).__name__}: {e}); "
                  "continuing")
            return False


class LocalRunTracker:
    """File-based experiment tracking: params.json, metrics.jsonl, artifact
    copies under ``runs/<experiment>/``.

    Stands in for an MLflow server so every run is still comparable offline —
    the reference hard-depends on a reachable MLflow backend (main.py:225).
    """

    def __init__(self, root: str = "runs"):
        self.root = root
        self.experiment = "default"
        self._dir: Optional[str] = None

    def _ensure_dir(self) -> str:
        if self._dir is None:
            self._dir = os.path.join(self.root, self.experiment)
            os.makedirs(os.path.join(self._dir, "artifacts"), exist_ok=True)
        return self._dir

    def set_experiment(self, name: str):
        self.experiment = name
        self._dir = None

    def start_run(self):
        self._ensure_dir()
        return _NoOpRun()

    def log_param(self, key: str, value: Any):
        self.log_params({key: value})

    def log_params(self, params: Dict[str, Any]):
        import json

        path = os.path.join(self._ensure_dir(), "params.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as fh:
                existing = json.load(fh)
        existing.update({k: repr(v) if not isinstance(v, (int, float, str, bool, type(None))) else v
                         for k, v in params.items()})
        with open(path, "w") as fh:
            json.dump(existing, fh, indent=2)

    def log_metric(self, key: str, value: float, step: Optional[int] = None):
        self.log_metrics({key: value}, step=step)

    def log_metrics(self, values: Dict[str, float], step: Optional[int] = None):
        import json

        with open(os.path.join(self._ensure_dir(), "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps({"step": step, **{k: float(v) for k, v in values.items()}}) + "\n")

    def log_artifact(self, path: str, artifact_path: Optional[str] = None):
        import shutil

        if os.path.exists(path):
            dest = os.path.join(self._ensure_dir(), "artifacts", artifact_path or "")
            os.makedirs(dest, exist_ok=True)
            shutil.copy(path, dest)


class MLflowShim:
    """The subset of the mlflow API the pipeline uses.

    Mirrors every call site of the reference (main.py:225-264,
    model.py:256-270,333-341): set_experiment, start_run, log_param(s),
    log_metric(s), log_artifact. Backend resolution: real mlflow if
    importable, else the file-based LocalRunTracker, else no-op — training
    never depends on a tracking server.
    """

    def __init__(self, enabled: bool = True, local_root: str = "runs"):
        self._backend = None
        self._local_root = local_root
        if enabled:
            try:
                import mlflow  # type: ignore

                # A module that merely *imports* as 'mlflow' is not enough —
                # a namespace collision or broken install would otherwise
                # crash mid-run on the first missing attribute.
                if all(hasattr(mlflow, a) for a in (
                    "set_experiment", "start_run", "log_param", "log_metric",
                    "log_artifact",
                )):
                    self._backend = mlflow
                else:
                    self._backend = LocalRunTracker(local_root)
            except Exception as e:  # noqa: BLE001 — a broken install may
                # raise anything at import time (protobuf/pydantic version
                # conflicts raise TypeError/ValidationError, not
                # ImportError); 'training never depends on the tracking
                # backend' must hold for those too.
                if not isinstance(e, ImportError):
                    print(f"mlflow import failed ({type(e).__name__}: {e}); "
                          "using the file tracker")
                self._backend = LocalRunTracker(local_root)

    @property
    def active(self) -> bool:
        return self._backend is not None

    def _call(self, method: str, *args, **kwargs):
        """Invoke a backend method; a backend failure (unreachable tracking
        server, auth error, disk full) degrades to the LocalRunTracker — and
        if THAT fails too (corrupt runs/ state, unwritable disk), to no
        tracking at all — instead of killing the run. The reference dies
        here (main.py:225); 'never depends on a tracking server' must hold
        for configured-but-broken backends too."""
        if not self._backend:
            return None
        try:
            return getattr(self._backend, method)(*args, **kwargs)
        except Exception as e:  # noqa: BLE001
            was_local = isinstance(self._backend, LocalRunTracker)
            print(f"tracking backend failed on {method} ({type(e).__name__}: "
                  f"{e}); " + ("disabling run tracking" if was_local else
                               f"falling back to file tracker under "
                               f"{self._local_root!r}"))
            if was_local:
                self._backend = None
                return None
            self._backend = LocalRunTracker(self._local_root)
            try:
                return getattr(self._backend, method)(*args, **kwargs)
            except Exception as e2:  # noqa: BLE001
                print(f"file tracker also failed ({type(e2).__name__}: "
                      f"{e2}); disabling run tracking")
                self._backend = None
                return None

    def set_experiment(self, name: str):
        self._call("set_experiment", name)

    def start_run(self):
        run = self._call("start_run") if self._backend else None
        return _SafeRun(run) if run is not None else _NoOpRun()

    def log_param(self, key: str, value: Any):
        self._call("log_param", key, value)

    def log_params(self, params: Dict[str, Any]):
        self._call("log_params", params)

    def log_metric(self, key: str, value: float, step: Optional[int] = None):
        self._call("log_metric", key, value, step=step)

    def log_metrics(self, values: Dict[str, float], step: Optional[int] = None):
        self._call("log_metrics", values, step=step)

    def log_artifact(self, path: str, artifact_path: Optional[str] = None):
        if self._backend and os.path.exists(path):
            self._call("log_artifact", path, artifact_path=artifact_path)


def param_summary(params: Any) -> str:
    """Per-module parameter count report (replaces torchinfo, model.py:267-270)."""
    lines = ["Layer (pytree path)                                    Param #"]
    lines.append("=" * 62)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        lines.append(f"{name:<50} {leaf.size:>10,}")
        total += leaf.size
    lines.append("=" * 62)
    lines.append(f"Total params: {total:,}")
    return "\n".join(lines)


class RunObserver:
    """Loss/metric plotting + model summary, wired into the Trainer.

    Plots render on a single worker thread by default (``async_plots``):
    matplotlib figure assembly + PNG encode is hundreds of ms of pure host
    work on this class of host, and it used to stack on the training thread
    at every plot/eval cadence (VERDICT r4 #1 — fixed host work per eval
    block). The public plot methods snapshot their inputs (the trainer
    mutates the loss lists every epoch) and enqueue; one worker means the
    Agg backend is never entered concurrently. A failed plot is printed,
    never raised — a rendering error must not kill training. ``drain()``
    blocks until queued plots are on disk (Trainer.fit calls it in its
    finally, so a completed run always has its final curves)."""

    def __init__(self, async_plots: bool = True):
        self._pool = None
        self._pending: list = []
        if async_plots:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="plots"
            )

    def _dispatch(self, fn, *args) -> None:
        if self._pool is None:
            fn(*args)
            return
        self._pending = [f for f in self._pending if not self._reap(f)]
        self._pending.append(self._pool.submit(fn, *args))

    @staticmethod
    def _reap(fut) -> bool:
        """True when the future is finished (printing any failure)."""
        if not fut.done():
            return False
        e = fut.exception()
        if e is not None:
            print(f"plot failed: {type(e).__name__}: {e}")
        return True

    def drain(self) -> None:
        """Wait for queued plots; report failures. Reusable afterwards."""
        for fut in self._pending:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001
                print(f"plot failed: {type(e).__name__}: {e}")
        self._pending = []

    def log_model_summary(self, params: Any, ckpt_dir: str, mlflow: Optional[MLflowShim]):
        summary_path = os.path.join(ckpt_dir, "model_summary.txt")
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(summary_path, "w", encoding="utf-8") as fh:
            fh.write(param_summary(params))
        if mlflow:
            mlflow.log_artifact(summary_path)

    def plot_loss_curve(self, all_epoch_losses: Dict[str, list], save_path: str) -> None:
        """Seven-panel loss curves (reference model.py:649-717)."""
        self._dispatch(
            self._plot_loss_curve,
            {k: list(v) for k, v in all_epoch_losses.items()},
            save_path,
        )

    def _plot_loss_curve(self, all_epoch_losses: Dict[str, list], save_path: str) -> None:
        epochs = range(1, len(all_epoch_losses["total_loss"]) + 1)
        panels = [
            ("total_loss", "k-", "Total Loss"),
            ("L_reconstruction", "r-", "Reconstruction Loss"),
            ("L_R_fidelity", "b-", "Reflectance Fidelity Loss"),
            ("L_I_smooth_low", "y-", "Structure-aware Illumination Smoothness Loss (I_low)"),
            ("L_I_smooth_delta", "g-", "Structure-aware Illumination Smoothness Loss (I_delta)"),
            ("L_fourier", "m-", "Fourier Spectrum Loss"),
            ("L_spectral_cons", "c-", "Spectral Consistency Loss"),
        ]
        plt.figure(figsize=(20, 10))
        for i, (key, style, title) in enumerate(panels, start=1):
            plt.subplot(3, 3, i)
            plt.plot(epochs, all_epoch_losses[key], style, label=key)
            plt.title(title)
            plt.xlabel("Epoch")
            plt.ylabel("Loss")
            plt.grid(True)
            plt.legend()
        plt.tight_layout()
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path)
        plt.close()
        print(f"Loss curves saved to {save_path}")

    def plot_eval_metrics(self, eval_metrics: Dict[int, Dict[str, float]], save_path: str) -> None:
        """PSNR/SSIM/SAM curves over eval epochs (reference model.py:609-647)."""
        self._dispatch(
            self._plot_eval_metrics,
            {e: dict(m) for e, m in eval_metrics.items()},
            save_path,
        )

    def _plot_eval_metrics(self, eval_metrics: Dict[int, Dict[str, float]], save_path: str) -> None:
        epochs = sorted(eval_metrics.keys())
        series = [
            ("psnr", "k-", "Eval PSNR", "PSNR"),
            ("ssim", "r-", "Eval SSIM", "SSIM"),
            ("sam", "b-", "Eval SAM", "SAM"),
        ]
        plt.figure(figsize=(10, 10))
        for i, (key, style, title, ylabel) in enumerate(series, start=1):
            plt.subplot(3, 1, i)
            plt.plot(epochs, [eval_metrics[e][key] for e in epochs], style, label=f"avg_{key}")
            plt.title(title)
            plt.xlabel("Epoch")
            plt.ylabel(ylabel)
            plt.grid(True)
            plt.legend()
        plt.tight_layout()
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path)
        plt.close()
        print(f"Eval metrics saved to {save_path}")


class Profiler:
    """Optional jax.profiler trace around a region (replaces wall-clock-only
    timing; writes a TensorBoard-compatible trace)."""

    def __init__(self, trace_dir: str = ""):
        self.trace_dir = trace_dir
        self._active = False

    def __enter__(self):
        if self.trace_dir:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        return self

    def __exit__(self, *exc):
        if self._active:
            jax.profiler.stop_trace()
        return False
