#!/usr/bin/env python
"""Profile the jitted train step and attribute device time to source lines.

The method that produced docs/PERFORMANCE.md's step anatomy, productized:

  1. run N steps under a ``jax.profiler`` trace (works through the axon
     relay — the device lane lands in ``vm.trace.json.gz``);
  2. read the compiled HLO text and map every fusion/op name to its
     ``metadata={op_name=... source_file=... source_line=...}``;
  3. join the two and aggregate device time per source line / op kind.

Usage:
  python scripts/profile_step.py [--batch 8] [--patch 128] [--channels 64]
      [--precision bfloat16] [--steps 10] [--device cpu] [--top 25]
      [--trace_dir /tmp/sshslie_profile]

Prints a table like:

   ms/step   where
     6.42    layers.py:69  conv_general_dilated (23 ops)
     1.07    jit(fft)
     ...
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_device_times(trace_dir: str) -> "collections.Counter[str]":
    """Aggregate per-op durations from the newest trace under ``trace_dir``."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    lanes = {e["pid"]: e["args"].get("name", "")
             for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg: "collections.Counter[str]" = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lanes.get(e.get("pid"), "")
        if "TPU" not in lane and "device" not in lane.lower():
            continue
        name = e["name"]
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue  # enclosing module span / step-counter lanes
        agg[name] += e.get("dur", 0)
    return agg


def hlo_source_map(hlo_text: str) -> dict:
    """op name → 'file:line  op_kind' from compiled-HLO metadata."""
    out = {}
    pattern = re.compile(
        r"%?([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\" source_line=(\d+))?")
    for m in pattern.finditer(hlo_text):
        op = m.group(2).split("/")[-1]
        if m.group(3):
            where = f"{m.group(3).split('/')[-1]}:{m.group(4)}  {op}"
        else:
            where = op
        out[m.group(1)] = where
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--conv_impl", default="auto")
    ap.add_argument("--remat", action="store_true",
                    help="profile the rematerialized step (remat: true)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--device", default="", help="'cpu' forces the CPU backend")
    ap.add_argument("--trace_dir", default="/tmp/sshslie_profile")
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs, make_optimizer,
        make_train_step,
    )
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()
    cfg = Config(channels=args.channels, patch_size=args.patch,
                 batch_size=args.batch, precision=args.precision,
                 attention_impl=args.attention_impl,
                 conv_impl=args.conv_impl, remat=args.remat)
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, loss_coeffs(cfg))
    x = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, args.patch, args.patch, args.channels), jnp.float32)
    lr = jnp.float32(1e-3)

    lowered = step.lower(state, x, lr)
    hlo = lowered.compile().as_text()
    src = hlo_source_map(hlo)

    for _ in range(3):  # warm / compile outside the trace
        state, terms = step(state, x, lr)
    float(terms["total_loss"])

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, terms = step(state, x, lr)
    float(terms["total_loss"])
    jax.profiler.stop_trace()

    agg = collect_device_times(args.trace_dir)
    if not agg:
        print(f"note: no per-op device events in the trace "
              f"(backend={jax.default_backend()}) — per-op HLO attribution "
              "is only emitted by accelerator backends; run on TPU.")
        return collections.Counter()
    total_us = sum(agg.values())
    by_src: "collections.Counter[str]" = collections.Counter()
    counts: "collections.Counter[str]" = collections.Counter()
    for name, dur in agg.items():
        key = src.get(name, name)
        by_src[key] += dur
        counts[key] += 1

    n = args.steps
    print(f"device total: {total_us / n / 1e3:.2f} ms/step "
          f"({cfg.batch_size}x{cfg.patch_size}²x{cfg.channels} "
          f"{cfg.precision}, {jax.devices()[0].device_kind})")
    print(f"{'ms/step':>9}  where")
    for key, dur in by_src.most_common(args.top):
        ops = f" ({counts[key]//max(n,1)} ops)" if counts[key] > n else ""
        print(f"{dur / n / 1e3:9.3f}  {key[:100]}{ops}")
    return by_src


if __name__ == "__main__":
    main()
