"""Config / flag system.

Mirrors the reference's three-level precedence CLI > YAML > hardcoded defaults
(reference main.py:16-90) with the same 28 key names, plus TPU-native additions
(precision, mesh shape, pallas toggles). Derived run names / directories follow
the reference layout (main.py:76-88) so downstream tooling finds artifacts in
the same places.

Deliberate fixes over the reference (SURVEY.md §2.4):
  * ``test_timestamp`` is a config/CLI field instead of a constant edited in
    code (reference main.py:80).
  * ``mat_key_prediction`` makes the eval-readback key explicit instead of the
    hardcoded ``'ref'`` that crashes mid-training eval (reference model.py:395).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from datetime import datetime
from typing import Any, Optional

import yaml


def _latest_run_timestamp(model_ckpt_dir: str) -> str:
    """Newest ``Decomposition_<ts>`` run under ``model_ckpt_dir`` holding a
    resumable ``model_epoch_latest`` checkpoint ('' when none exists).

    Prints the scanned path on a miss: the layout is CWD-relative (reference
    parity), so resuming from a different working directory used to silently
    start fresh — now it says exactly where it looked."""
    from glob import glob

    scan = os.path.join(model_ckpt_dir, "Decomposition_*", "model_epoch_latest.ckpt")
    candidates = []
    for ck in glob(scan):
        ts = os.path.basename(os.path.dirname(ck))[len("Decomposition_"):]
        candidates.append((os.path.getmtime(ck), ts))
    if not candidates:
        print(f"resume: no resumable checkpoint found (scanned "
              f"{os.path.abspath(scan)}); starting a new run")
        return ""
    return max(candidates)[1]


@dataclasses.dataclass
class Config:
    """All run configuration. Field names match the reference YAML keys."""

    # --- reference keys (main.py:17-55), same names & defaults ---
    use_gpu: int = 1                      # kept for YAML compat; ignored (JAX picks the TPU)
    seed_value: int = 41
    gpu_idx: str = "0"                    # kept for YAML compat; ignored
    gpu_mem: float = 0.8                  # kept for YAML compat; ignored
    decom: int = 0
    mat_key: str = "data"
    channels: Optional[int] = 64
    global_min: float = 0.0
    global_max: float = 1.0
    normalization: str = "global_normalization"
    batch_size: int = 1
    patch_size: int = 128
    start_lr: float = 0.001
    lr_update_factor: float = 1.0
    lr_update_period: int = 400
    train_data: str = "./data/train/low"
    eval_data: str = "./data/eval/low"
    test_data: str = "./data/test/low"
    label_dir: str = "./data/test/high"
    phase: str = "train_and_test"
    epoch: int = 400
    eval_every_epoch: int = 200
    plot_every_epoch: int = 200
    c_loss_reconstruction: float = 10.0
    c_loss_r_fidelity: float = 1.0
    c_loss_i_smooth_low: float = 1.0
    c_loss_i_smooth_delta: float = 20.0
    c_loss_fourier: float = 0.2
    c_loss_spectral_cons: float = 1.0
    alpha_i_smooth_low: float = 1.0
    alpha_i_smooth_delta: float = 10.0
    save_reflectance: bool = False
    save_illumination: bool = False
    save_i_delta: bool = False
    model_name: str = "no_name_model"
    pretrained_model: str = ""
    freeze_decom_epochs: int = 0
    resume: bool = False                  # continue from latest checkpoint (newest run, or test_timestamp's)

    # --- new framework keys (TPU-native; no reference counterpart) ---
    device: str = ""                      # '' = default backend; 'cpu'/'tpu' force one
    test_timestamp: str = ""              # timestamp of the checkpoint to test (replaces main.py:80)
    mat_key_prediction: str = "data"      # key used when reading predictions back for metrics
    precision: str = "float32"            # 'float32' | 'bfloat16' compute dtype for the nets
    matmul_precision: str = ""            # '' = backend default (bf16 MXU passes on TPU) | 'tensorfloat32' | 'float32'/'highest'
    attention_impl: str = "auto"          # 'auto' | 'xla' | 'pallas' | 'chunked'
    conv_impl: str = "auto"               # 'auto'|'xla'|'pallas'|'pallas_dgrad': shallow-conv kernel path (ops/conv_pallas.py; measured dispositions in docs/PERFORMANCE.md r4)
    remat: bool = False                   # per-sub-network jax.checkpoint: 1.3-1.9x lower assigned temp HBM for 1.2-1.3x step time — headroom for co-resident device state, NOT a fit-unlock (docs/PERFORMANCE.md r4)
    use_attention: bool = False           # SEBlock variant (reference model.py:122,130-131)
    use_transformer: bool = True          # TransformerBlock variant (reference default)
    mesh_shape: str = ""                  # e.g. '8' or '4x2'; '' = all local devices, 1-D data mesh
    data_axis: str = "data"               # mesh axis name for batch sharding
    space_axis: str = ""                  # 2-D mesh: also shard patch height on this axis (e.g. 'space')
    prefetch_batches: int = 2             # host-side pipeline depth
    data_pattern: str = "*.mat"           # dataset glob per split dir; "*.hdr" reads ENVI header/raw pairs (utils/io_envi.py)
    lazy_loading: bool = False            # disk-backed LRU cube store (datasets larger than RAM)
    cube_cache_size: int = 8              # lazy_loading: cubes kept resident
    fused_pipeline: str = "auto"          # 'auto'|'on'|'off': on-device sampling+step graph
    sampler: str = "auto"                 # host sampler: 'auto'|'native'|'python' (RNG streams differ; see docs/PARITY.md)
    steps_per_dispatch: int = 1           # fused pipeline: scan K steps per device dispatch (amortizes launch latency)
    fused_window: Any = 0                 # >0: fused pipeline over a rotating K-cube device window (datasets larger than HBM); 'auto' sizes K from cube bytes vs device memory stats; see docs/CONFIG.md
    grad_accum_steps: int = 1             # >1: scan K sequential microbatches per step (exact full-batch update, ~K× less activation memory; host pipeline only)
    log_every_step: int = 0               # 0 = per-epoch logging only (avoid device→host syncs)
    checkpoint_keep: int = 0              # 0 = keep all periodic checkpoints
    checkpoint_best: bool = False         # track best eval PSNR in a rolling model_epoch_best.ckpt (per fit run)
    use_mlflow: bool = True               # no-op shim if mlflow isn't installed
    jit_cache_dir: str = "~/.cache/sshslie_tpu/xla"  # persistent XLA compilation cache ('' = disabled); literal kept in sync with utils/jit_cache.DEFAULT_DIR (importing it here would pull jax into config import)
    profile_dir: str = ""                 # write a jax.profiler trace here when set
    eval_pad_multiple: int = 1            # >1: edge-pad H,W to a multiple for bucketed jit shapes
    eval_batch: int = 1                   # >1: stack same-shape cubes into one eval/test forward dispatch
    eval_sharded: bool = False            # mesh runs eval/test sharded (see eval_shard_mode; padding perturbs outputs unless divisible — docs/CONFIG.md)
    eval_shard_mode: str = "spatial"      # 'spatial' (height across chips, halo exchanges) | 'band' (spectral axis, needs channels % n_devices == 0)
    async_eval: bool = False              # run mid-training eval on a params snapshot in a worker thread
    eval_metric_source: str = "memory"    # 'memory': score the in-memory S while .mat artifacts save async (bit-identical to 'disk', the legacy save-then-reread path)
    checkpoint_async: bool = True         # write checkpoints on a worker thread (device snapshot taken synchronously; drained at fit end/preemption)
    serve_host: str = "127.0.0.1"         # phase=serve: bind address
    serve_port: int = 8900                # phase=serve: port (0 = ephemeral)
    serve_pad_multiple: int = 64          # phase=serve: shape-bucket granularity
    serve_warmup: str = ""                # phase=serve: pre-compile shapes, e.g. '512x512,1024x1024'
    serve_max_batch: int = 1              # phase=serve: coalesce concurrent same-shape requests (1 = off)
    serve_quantize: str = ""              # phase=serve: ''|'int8'|'fp8'|'int4' weight-only quantized serving
    serve_reload_token: str = ""          # phase=serve: required (X-Reload-Token) to reload arbitrary paths
    serve_batch_window_ms: float = 5.0    # phase=serve: batching window after first pending request

    # --- derived (filled by finalize(); do not set in YAML) ---
    timestamp: str = ""
    full_model_name: str = ""
    model_ckpt_dir: str = ""
    eval_result_dir: str = ""
    test_result_dir: str = ""
    test_model_dir: str = ""
    log_file_path: str = ""
    config_path: str = ""

    def finalize(self, now: Optional[datetime] = None) -> "Config":
        """Derive run names and directories (reference main.py:76-88)."""
        now = now or datetime.now()
        if not self.timestamp:
            self.timestamp = f"{now:%Y%m%d_%H%M%S}"
        # Derived before the resume branch: resume discovery scans under it.
        self.model_ckpt_dir = os.path.join(".", "checkpoint", self.model_name)
        postfix = ""
        if self.phase in ("test", "serve"):
            postfix = "_test_" + self.timestamp
            # Reference hardcodes the train-run timestamp in code (main.py:80);
            # here it is the test_timestamp config field. phase=serve resolves
            # its checkpoint dir the same way.
            if self.test_timestamp:
                self.timestamp = self.test_timestamp
        elif self.resume:
            # Resuming a training run: adopt the original run's timestamp so
            # the checkpoint/eval/log directories line up with it. Without an
            # explicit test_timestamp, pick the most recent run of this model
            # that actually has a resumable checkpoint.
            ts = self.test_timestamp or _latest_run_timestamp(self.model_ckpt_dir)
            if ts:
                self.timestamp = ts
        self.full_model_name = f"{self.model_name}_{self.timestamp}{postfix}"
        self.eval_result_dir = os.path.join(".", "results", "eval_results_" + self.full_model_name)
        self.test_result_dir = os.path.join(".", "results", "test_results_" + self.full_model_name)
        self.test_model_dir = os.path.join(
            ".", "checkpoint", self.model_name, "Decomposition_" + self.timestamp
        )
        self.log_file_path = os.path.join(".", "logs", self.full_model_name + ".log")
        return self

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


_DERIVED_FIELDS = {
    "timestamp", "full_model_name", "model_ckpt_dir", "eval_result_dir",
    "test_result_dir", "test_model_dir", "log_file_path", "config_path",
}

# Enum-valued keys checked at load time — a typo'd value should fail at
# startup naming the choices, not hours later inside Trainer.fit.
_ENUM_FIELDS: dict[str, tuple] = {
    "phase": ("train", "test", "train_and_test", "serve"),
    "normalization": ("self", "global_normalization",
                      "per_channel_normalization",
                      "per_channel_standardization", None, ""),
    "precision": ("float32", "bfloat16"),
    # Mirror of the values the installed JAX accepts for
    # jax_default_matmul_precision ('bfloat16_3x' is NOT one of them).
    "matmul_precision": ("", "default", "bfloat16", "high",
                         "tensorfloat32", "float32", "highest"),
    "attention_impl": ("auto", "xla", "pallas", "chunked"),
    "conv_impl": ("auto", "xla", "pallas", "pallas_dgrad"),
    "sampler": ("auto", "native", "python"),
    "fused_pipeline": ("auto", "on", "off"),
    "serve_quantize": ("", "int8", "fp8", "int4"),
    "eval_shard_mode": ("spatial", "band"),
    "eval_metric_source": ("memory", "disk"),
    "device": ("", "cpu", "tpu", "gpu"),
}


# int-valued keys that also accept the literal 'auto' (resolved at fit time).
_INT_OR_AUTO_FIELDS = ("fused_window",)

# Must be >= 1: a zero here genuinely breaks a run (0 epochs trains nothing
# then the test phase dies on the missing checkpoint; batch_size 0
# ZeroDivisionErrors; 0-cadence modulos ZeroDivisionError mid-run). Keys
# whose zeros are meaningful (checkpoint_keep, log_every_step,
# freeze_decom_epochs, seed_value) or safely clamped downstream
# (prefetch_batches, eval_batch, steps_per_dispatch, grad_accum_steps) are
# deliberately absent.
_POSITIVE_INT_FIELDS = (
    "batch_size", "patch_size", "epoch", "eval_every_epoch",
    "plot_every_epoch",
)


def _validate_enums(cfg: "Config") -> None:
    for key, choices in _ENUM_FIELDS.items():
        val = getattr(cfg, key)
        if val not in choices:
            shown = [c for c in choices if c not in (None, "")]
            raise ValueError(
                f"config key {key!r}: invalid value {val!r} "
                f"(choices: {', '.join(map(str, shown))})"
            )
    for key in _INT_OR_AUTO_FIELDS:
        val = getattr(cfg, key)
        if isinstance(val, str):
            if val.strip().lower() == "auto":
                setattr(cfg, key, "auto")
                continue
            try:
                val = int(val)
            except ValueError:
                raise ValueError(
                    f"config key {key!r}: invalid value {val!r} "
                    "(an integer >= 0, or 'auto')"
                )
            setattr(cfg, key, val)
        if isinstance(val, bool) or not isinstance(val, int) or val < 0:
            raise ValueError(
                f"config key {key!r}: invalid value {val!r} "
                "(an integer >= 0, or 'auto')"
            )
    for key in _POSITIVE_INT_FIELDS:
        val = getattr(cfg, key)
        if isinstance(val, bool) or not isinstance(val, int) or val < 1:
            raise ValueError(
                f"config key {key!r}: invalid value {val!r} "
                "(an integer >= 1)"
            )


def _coerce(value: str, target_type: type) -> Any:
    """Parse a CLI string into the dataclass field's type."""
    if target_type is bool:
        return value.lower() in ("1", "true", "yes", "y", "on")
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    return value


def parse_bool_flag(name: str, value: str) -> bool:
    """Strict true/false CLI value — a typo must error, not silently pick a
    default architecture (shared by the interop/quant script CLIs)."""
    v = str(value).strip().lower()
    if v in ("1", "true", "yes"):
        return True
    if v in ("0", "false", "no"):
        return False
    raise SystemExit(f"{name} {value!r}: expected true/false")


def load_config(
    yaml_path: Optional[str] = None,
    overrides: Optional[dict[str, Any]] = None,
    finalize: bool = True,
) -> Config:
    """Build a Config with precedence overrides (CLI) > YAML > defaults.

    Matches reference main.py:70-74. Unknown YAML keys raise — the reference
    silently ignored them, which hides typos.
    """
    cfg = Config()
    known = {f.name for f in dataclasses.fields(Config)}
    if yaml_path:
        with open(yaml_path, "r") as fh:
            data = yaml.safe_load(fh) or {}
        for key, val in data.items():
            if key not in known:
                raise KeyError(f"Unknown config key in {yaml_path}: {key!r}")
            if key in _DERIVED_FIELDS:
                raise KeyError(f"Config key {key!r} is derived and cannot be set in YAML")
            setattr(cfg, key, val)
        cfg.config_path = yaml_path
    for key, val in (overrides or {}).items():
        if val is None:
            continue
        if key not in known:
            raise KeyError(f"Unknown config override: {key!r}")
        setattr(cfg, key, val)
    _validate_enums(cfg)
    if finalize:
        cfg.finalize()
    return cfg


def parse_args(argv: Optional[list[str]] = None) -> Config:
    """CLI entry: ``main.py --config config/*.yml [--key val ...]``.

    Same surface as reference main.py:57-64 — every config key is exposed as a
    typed ``--key`` flag whose presence overrides the YAML.
    """
    parser = argparse.ArgumentParser(
        description="TPU-native SS-HSLIE: parse config from YAML and command line."
    )
    parser.add_argument("--config", type=str, default="./config/config.yml")
    defaults = Config()
    field_types: dict[str, type] = {}
    for field in dataclasses.fields(Config):
        if field.name in _DERIVED_FIELDS:
            continue
        default_val = getattr(defaults, field.name)
        # Infer type from the default value (reference main.py:62); None → int
        # (only `channels` defaults that way). bool flags parse as strings.
        ftype = int if default_val is None else type(default_val)
        parser.add_argument(f"--{field.name}", type=str, default=None)
        field_types[field.name] = ftype
    args = parser.parse_args(argv)

    overrides: dict[str, Any] = {}
    for name, ftype in field_types.items():
        val = getattr(args, name)
        if val is None:
            continue
        if name in _INT_OR_AUTO_FIELDS:
            # 'auto' or an int — normalized/validated by load_config.
            overrides[name] = val
        else:
            overrides[name] = _coerce(val, ftype)
    return load_config(args.config, overrides)
