"""Preflight validator: check an environment + config + dataset before a run.

Net-new operator tooling (no reference counterpart — the reference's
failure mode is a crash or silent misconfiguration mid-run, e.g. its
unknown-YAML-key swallowing, main.py:70-74, or the patch-size crash at
model.py:306-307). The doctor runs every check the framework would
otherwise fail at minutes in, and prints PASS/WARN/FAIL lines with the fix:

  * backend + devices, native sampler library, compile-cache dir
  * config sanity (enum validation happens at load; here: derived dirs
    writable, phase/data coherence)
  * each dataset split: exists, matches ``data_pattern``, cubes load,
    uniform channels, channels vs config, patch_size fits, value range vs
    global_min/global_max, eval/test GT pairing by basename
  * checkpoint dir: resumable runs for resume/test phases

Usage:
  python -m sshslie_tpu.doctor --config config/config.yml [--key val ...]
  sshslie-doctor --config ...            (installed console script)

Exit code: 0 all PASS/WARN, 1 any FAIL.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np


class Report:
    def __init__(self) -> None:
        self.rows: List[Tuple[str, str, str]] = []  # (level, check, detail)

    def add(self, level: str, check: str, detail: str) -> None:
        self.rows.append((level, check, detail))

    ok = lambda self, c, d="": self.add("PASS", c, d)      # noqa: E731
    warn = lambda self, c, d="": self.add("WARN", c, d)    # noqa: E731
    fail = lambda self, c, d="": self.add("FAIL", c, d)    # noqa: E731

    @property
    def failed(self) -> bool:
        return any(lvl == "FAIL" for lvl, _, _ in self.rows)

    def render(self) -> str:
        out = []
        for lvl, check, detail in self.rows:
            line = f"[{lvl}] {check}"
            if detail:
                line += f" — {detail}"
            out.append(line)
        n_fail = sum(l == "FAIL" for l, _, _ in self.rows)
        n_warn = sum(l == "WARN" for l, _, _ in self.rows)
        out.append(
            f"{len(self.rows)} checks: "
            f"{len(self.rows) - n_fail - n_warn} pass, "
            f"{n_warn} warn, {n_fail} fail"
        )
        return "\n".join(out)


def _check_environment(cfg, rep: Report) -> None:
    import jax

    try:
        devs = jax.devices()
        rep.ok("jax backend",
               f"{jax.default_backend()} with {len(devs)} device(s): "
               f"{getattr(devs[0], 'device_kind', devs[0])}")
    except Exception as e:  # pragma: no cover - no backend at all
        rep.fail("jax backend", f"{type(e).__name__}: {e}")
        return
    so = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "native", "libpatch_sampler.so")
    if os.path.exists(so):
        rep.ok("native patch sampler", so)
    else:
        rep.warn("native patch sampler",
                 "native/libpatch_sampler.so not built (host sampler falls "
                 "back to numpy; run `sh native/build.sh`)")
    if cfg.jit_cache_dir:
        d = os.path.expanduser(cfg.jit_cache_dir)
        try:
            os.makedirs(d, exist_ok=True)
            probe = os.path.join(d, ".doctor_probe")
            open(probe, "w").close()
            os.remove(probe)
            rep.ok("compile cache dir", d)
        except OSError as e:
            rep.warn("compile cache dir", f"{d} not writable ({e}); "
                     "first compile repeats every process")


def _load_split(cfg, path: str):
    from sshslie_tpu.data.datasets import store_from_config

    return store_from_config(cfg, path)


def _check_split(cfg, rep: Report, name: str, path: str,
                 require: bool) -> Optional[object]:
    if not os.path.isdir(path):
        (rep.fail if require else rep.warn)(
            f"{name} dir", f"{path} does not exist")
        return None
    try:
        store = _load_split(cfg, path)
    except Exception as e:  # noqa: BLE001 — any load error is the finding
        rep.fail(f"{name} load", f"{type(e).__name__}: {e}")
        return None
    if len(store) == 0:
        (rep.fail if require else rep.warn)(
            f"{name} files",
            f"no files matching {cfg.data_pattern!r} in {path}")
        return None
    shapes = store.shapes
    chans = {s[2] for s in shapes}
    if len(chans) > 1:
        rep.fail(f"{name} channels",
                 f"mixed channel counts {sorted(chans)} across cubes")
    elif cfg.channels is not None and shapes[0][2] != cfg.channels:
        rep.fail(f"{name} channels",
                 f"cubes have {shapes[0][2]} bands but config channels="
                 f"{cfg.channels}")
    else:
        rep.ok(f"{name} files",
               f"{len(store)} cube(s), shapes "
               f"{sorted({tuple(s) for s in shapes})}")
    if name != "train":
        _check_whole_cube_fit(cfg, rep, name, shapes)
    return store


# Largest/smallest measured whole-cube f32 forward on a 16 GB chip
# (scripts/max_cube_report.py, docs/PERFORMANCE.md "Single-chip max cube"):
# 2560^2 x 64 = 1.6 GiB input runs; 2880^2 x 64 = 2.0 GiB compiles then
# runtime-OOMs (arguments + outputs outgrow what XLA's compile-time
# squeezer can schedule; bf16 does not help — the parity-pinned f32 casts
# keep every full-res buffer at 4 B/px). The check keys on raw input bytes
# because every measured activation/output term scales linearly with them.
_MAX_CUBE_FITS_BYTES = 2560 * 2560 * 64 * 4
_MAX_CUBE_OOM_BYTES = 2880 * 2880 * 64 * 4


def _check_whole_cube_fit(cfg, rep: Report, name: str, shapes) -> None:
    """Eval/test run the FULL cube through one jitted forward (the
    reference's test design, model.py:406-443) — warn when a cube is past
    the measured single-chip boundary. WARN, not FAIL: ``eval_sharded:
    true`` splits the cube across chips, and the squeezer's exact limit is
    configuration-dependent."""
    big = max(shapes, key=lambda s: s[0] * s[1] * s[2])
    nbytes = big[0] * big[1] * big[2] * 4
    if nbytes <= _MAX_CUBE_FITS_BYTES or cfg.eval_sharded:
        return
    gib = nbytes / 2**30
    if nbytes >= _MAX_CUBE_OOM_BYTES:
        rep.warn(f"{name} cube fit",
                 f"{big[0]}x{big[1]}x{big[2]} = {gib:.2f} GiB input: a "
                 "2.0 GiB cube measured runtime-OOM on a 16 GB chip "
                 "(docs/PERFORMANCE.md single-chip max cube) — set "
                 "eval_sharded: true (eval_shard_mode band|spatial)")
    else:
        rep.warn(f"{name} cube fit",
                 f"{big[0]}x{big[1]}x{big[2]} = {gib:.2f} GiB input is past "
                 "the largest measured-fitting whole-cube size (1.6 GiB on "
                 "a 16 GB chip) — may OOM at runtime; eval_sharded: true "
                 "if it does")


def _check_train_split(cfg, rep: Report, store) -> None:
    if store is None:
        return
    shapes = store.shapes
    min_h = min(s[0] for s in shapes)
    min_w = min(s[1] for s in shapes)
    if cfg.patch_size > min_h or cfg.patch_size > min_w:
        rep.fail("patch size",
                 f"patch_size {cfg.patch_size} exceeds smallest cube "
                 f"{min_h}x{min_w}")
    else:
        rep.ok("patch size", f"{cfg.patch_size} fits {min_h}x{min_w}")
    if len(store) < cfg.batch_size:
        rep.fail("batch size",
                 f"batch_size {cfg.batch_size} > {len(store)} cubes: zero "
                 "steps per epoch — fit refuses this (PARITY #23); reduce "
                 "batch_size")
    # Value range vs the normalization constants — load ONE cube raw. Only
    # meaningful under global_normalization: 'self'/max modes never consult
    # global_min/global_max, so comparing against them there produces
    # misleading WARNs (advisor r3).
    if cfg.normalization != "global_normalization":
        rep.ok("value range",
               f"check not applicable under normalization="
               f"{cfg.normalization!r} (no global_min/global_max in play)")
        return
    try:
        from sshslie_tpu.utils.io_hsi import load_hsi

        raw = load_hsi(store.files[0], mat_key=cfg.mat_key,
                       normalization=None, rescale_by_max=False)
        lo, hi = float(np.min(raw)), float(np.max(raw))
        if cfg.global_max is None:
            rep.warn("value range",
                     "normalization=global_normalization but global_max is "
                     "unset")
        elif hi > cfg.global_max:
            rep.warn("value range",
                     f"{os.path.basename(store.files[0])} max {hi:.1f} "
                     f"exceeds global_max {cfg.global_max} (values clip "
                     "above 1 after normalization)")
        elif hi <= cfg.global_max * 0.01:
            rep.warn("value range",
                     f"max {hi:.3g} is <1% of global_max {cfg.global_max} "
                     "— wrong global_max or already-normalized data?")
        else:
            rep.ok("value range",
                   f"[{lo:.1f}, {hi:.1f}] within global "
                   f"[{cfg.global_min}, {cfg.global_max}]")
    except Exception as e:  # noqa: BLE001
        rep.warn("value range", f"could not sample a cube: {e}")


def _check_gt_pairing(cfg, rep: Report, pred_store, label_dir: str,
                      what: str) -> None:
    if pred_store is None:
        return
    if not os.path.isdir(label_dir):
        rep.warn(f"{what} GT", f"label_dir {label_dir} does not exist — "
                 "metrics will be skipped")
        return
    gt = {os.path.splitext(f)[0] for f in os.listdir(label_dir)}
    missing = [b for b in pred_store.basenames()
               if os.path.splitext(b)[0] not in gt]
    if missing:
        rep.warn(f"{what} GT pairing",
                 f"no GT for {missing} in {label_dir}")
    else:
        rep.ok(f"{what} GT pairing", f"all basenames present in {label_dir}")


def _check_checkpoints(cfg, rep: Report) -> None:
    from glob import glob

    need = cfg.resume or cfg.phase in ("test", "serve")
    if cfg.phase in ("test", "serve") and cfg.test_timestamp:
        # test/serve load a SPECIFIC run's latest checkpoint — check that
        # one, not "any run has a checkpoint".
        specific = os.path.join(cfg.test_model_dir, "model_epoch_latest.ckpt")
        if os.path.exists(specific):
            rep.ok("checkpoints", specific)
        else:
            rep.fail("checkpoints",
                     f"phase={cfg.phase} with test_timestamp="
                     f"{cfg.test_timestamp} needs {os.path.abspath(specific)}")
        return
    pattern = os.path.join(cfg.model_ckpt_dir, "Decomposition_*",
                           "model_epoch_latest.ckpt")
    found = glob(pattern)
    if found:
        rep.ok("checkpoints", f"{len(found)} resumable run(s) under "
               f"{cfg.model_ckpt_dir}")
    elif need:
        rep.fail("checkpoints",
                 f"phase/resume needs a checkpoint but none match "
                 f"{os.path.abspath(pattern)}")
    else:
        rep.ok("checkpoints", "fresh run (none required)")


def run_doctor(cfg) -> Report:
    rep = Report()
    _check_environment(cfg, rep)
    if cfg.phase in ("train", "train_and_test"):
        train = _check_split(cfg, rep, "train", cfg.train_data, require=True)
        _check_train_split(cfg, rep, train)
        ev = _check_split(cfg, rep, "eval", cfg.eval_data, require=False)
        _check_gt_pairing(cfg, rep, ev, cfg.label_dir, "eval")
    if cfg.phase in ("test", "train_and_test"):
        test = _check_split(cfg, rep, "test", cfg.test_data,
                            require=cfg.phase == "test")
        _check_gt_pairing(cfg, rep, test, cfg.label_dir, "test")
    _check_checkpoints(cfg, rep)
    return rep


def main(argv: Optional[list] = None) -> int:
    from sshslie_tpu.config import parse_args

    cfg = parse_args(argv)
    if cfg.device:
        import jax

        jax.config.update("jax_platforms", cfg.device)
    rep = run_doctor(cfg)
    print(rep.render())
    return 1 if rep.failed else 0


if __name__ == "__main__":
    sys.exit(main())
