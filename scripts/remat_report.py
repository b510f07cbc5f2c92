#!/usr/bin/env python
"""A/B the `remat` knob (per-sub-network jax.checkpoint, models/enhance.py):
compiled memory analysis + measured step time, remat off vs on, at one
train-step workload.

Remat trades one extra forward of recompute for holding only one
sub-network's activations live during the backward — measured 1.3-1.9x
lower XLA-assigned temp for 1.2-1.3x step time. NOTE the measured
disposition (docs/PERFORMANCE.md r4 scale sweep): this is a co-residency
headroom knob, NOT a fit-unlock — XLA:TPU's compile-time squeezer already
fits oversubscribed programs, faster, and explicit remat can obstruct it
at the boundary. This prints the measured exchange rate:

  python scripts/remat_report.py --batch 8 --patch 128 --channels 64 \
      --precision bfloat16 [--device cpu]

One JSON object: per-arm temp/argument/output bytes (XLA memory analysis),
step seconds, MPB/s, and the ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _memory_analysis(batch, patch, channels, precision, attention_impl,
                     conv_impl, remat):
    """Compile the train step (same construction as bench.measure — shared
    helper) and return XLA's memory analysis in bytes. On TPU, XLA assigns
    buffers at compile time, so an arm that exceeds HBM fails HERE with
    RESOURCE_EXHAUSTED — that is a *result* (the arm does not fit), not a
    crash: it's reported as {"compile_oom": true, "error": ...} so the
    other arm still runs.
    """
    import jax  # noqa: F401  (backend must be up before lowering)

    import bench

    step, state, x, lr = bench.build_step_workload(
        batch, patch, channels, precision, attention_impl, conv_impl, remat)
    try:
        compiled = step.lower(state, x, lr).compile()
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as JaxRuntimeError
        import re

        msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
        if "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg:
            first = next((ln for ln in msg.splitlines()
                          if "Ran out of memory" in ln), msg.splitlines()[0])
            return {"compile_oom": True, "error": first.strip()}
        raise
    mem = compiled.memory_analysis()
    if mem is None:
        return None
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(mem, k, None)
        if v is not None:
            out[k.replace("_size_in_bytes", "_bytes")] = int(v)
    return out or None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--conv_impl", default="auto")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--skip-timing", action="store_true",
                    help="memory analysis only (no device stepping)")
    ap.add_argument("--arms", default="no_remat,remat",
                    help="comma list of arms to build/compile at all. A "
                         "compile that OOMs can leave relay-side compile "
                         "state that corrupts the NEXT compile in the same "
                         "process — run one arm per process ('--arms "
                         "no_remat', then '--arms remat') around the HBM "
                         "boundary and merge the JSONs")
    ap.add_argument("--time-arms", default=None,
                    help="comma list of arms to actually step on the device "
                         "(default: every arm in --arms). Use '--time-arms "
                         "remat' at workloads whose no-remat arm exceeds "
                         "HBM: the memory analysis still covers both arms "
                         "(compile-only), but only the fitting arm executes")
    ap.add_argument("--coresident-mb", type=int, default=0,
                    help="hold an N-MB device-resident buffer for the whole "
                         "arm (compile + timing) — models fused_window cube "
                         "stacks / co-located serving buckets sharing HBM "
                         "with the step. A runtime RESOURCE_EXHAUSTED is a "
                         "result ({'runtime_oom': true}), not a crash. "
                         "Run the remat arm FIRST in its own process: the "
                         "relay's compile service replays same-shape "
                         "failures (docs/PERFORMANCE.md r4).")
    ap.add_argument("--device", default="",
                    help="'cpu' forces the CPU backend (memory analysis "
                         "only there — CPU numbers are not HBM)")
    ap.add_argument("--out", default="", help="also write the JSON here")
    args = ap.parse_args(argv)

    import torch  # noqa: F401  (torch before jax)
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()

    import bench

    result = {
        "workload": f"b{args.batch}_p{args.patch}_c{args.channels}_"
                    f"{args.precision}",
        "backend": jax.default_backend(),
    }
    coresident = None
    if args.coresident_mb:
        # Committed to the device before any step work; held (referenced)
        # until process exit so both compile and execution contend with it.
        import numpy as np

        coresident = jax.device_put(
            np.zeros((args.coresident_mb, 1024, 256), np.float32))
        coresident.block_until_ready()
        result["coresident_mb"] = args.coresident_mb
    arms = {t.strip() for t in args.arms.split(",") if t.strip()}
    time_arms = (arms if args.time_arms is None else
                 {t.strip() for t in args.time_arms.split(",") if t.strip()})
    unknown = (time_arms | arms) - {"no_remat", "remat"}
    if unknown:
        ap.error(f"--time-arms/--arms: unknown arm(s) {sorted(unknown)} "
                 "(valid: no_remat, remat)")
    untimeable = time_arms - arms
    if untimeable and not args.skip_timing:
        ap.error(f"--time-arms {sorted(untimeable)} not in --arms "
                 f"{sorted(arms)}: an arm must be built to be timed")
    for arm, remat in (("no_remat", False), ("remat", True)):
        if arm not in arms:
            continue
        entry = {}
        mem = _memory_analysis(args.batch, args.patch, args.channels,
                               args.precision, args.attention_impl,
                               args.conv_impl, remat)
        if mem:
            entry.update(mem)
        if (not args.skip_timing and arm in time_arms
                and not entry.get("compile_oom")):
            try:
                m = bench.measure(args.batch, args.patch, args.channels,
                                  args.steps, args.warmup, args.precision,
                                  args.attention_impl, args.conv_impl,
                                  remat=remat)
            except Exception as e:
                # With --coresident-mb the step's temp allocation can
                # collide with the held buffer at EXECUTION time (compile
                # assigns against the full HBM; the allocator doesn't).
                # That collision is the experiment's result.
                import re

                msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
                if ("RESOURCE_EXHAUSTED" in msg
                        or "Ran out of memory" in msg
                        or "Allocation" in msg):
                    first = next((ln for ln in msg.splitlines()
                                  if "emory" in ln), msg.splitlines()[0])
                    entry["runtime_oom"] = True
                    entry["error"] = first.strip()[:300]
                else:
                    raise
            else:
                entry["step_seconds"] = m["step_seconds"]
                entry["mpb_per_sec"] = m["value"]
        result[arm] = entry

    a = result.get("no_remat", {})
    b = result.get("remat", {})
    if "temp_bytes" in a and "temp_bytes" in b and b["temp_bytes"]:
        result["temp_bytes_ratio"] = round(a["temp_bytes"] / b["temp_bytes"], 3)
    if a.get("step_seconds") and b.get("step_seconds"):
        result["step_time_ratio"] = round(
            b["step_seconds"] / a["step_seconds"], 3)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
