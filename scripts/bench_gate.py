#!/usr/bin/env python
"""Performance regression gate (VERDICT r4 #7).

Runs ``python bench.py`` (or reads an existing result), compares the headline
and best-workload throughput — and inference time when present — against the
committed ``BENCH_r*.json`` history, and exits nonzero on regression. One
command that fails when the step gets slower:

    python scripts/bench_gate.py                 # fresh bench on the chip
    python scripts/bench_gate.py --json out.json # gate a saved result
    python scripts/bench_gate.py --smoke         # + real-TPU Mosaic smoke

Comparison policy: each metric is gated against the MEDIAN of its historical
values (the committed driver records plus any ``bench_gate_*.json`` this
script archived) with a relative tolerance (default 7% — wider than the
relay's observed run-to-run jitter of ~1–2%, narrow enough to catch any real
pessimization; the r3→r4 headline drift was 0.2%). Throughputs gate on the
low side only — a faster step never fails.

The gate is advisory about *which* commit regressed (it has no bisect); its
job is to make "the step got slower" a red exit code instead of a surprise
in the next round's verdict.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric key -> (extractor over parsed bench JSON, lower_is_worse)
_GATES = {
    "headline_mpbs": (lambda d: d.get("value"), True),
    "best_mpbs": (lambda d: (d.get("best") or {}).get("value"), True),
    # inference seconds: HIGHER is worse — gate the high side.
    "inference_512_seconds": (lambda d: d.get("inference_512_seconds"), False),
}


def _load_history():
    """Parsed bench results from the committed driver records + archives."""
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if parsed and parsed.get("metric") == "hsi_train_throughput":
            out.append((os.path.basename(path), parsed))
    for path in sorted(glob.glob(os.path.join(REPO, "docs", "bench_gate_*.json"))):
        try:
            parsed = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if parsed.get("metric") == "hsi_train_throughput":
            out.append((os.path.basename(path), parsed))
    return out


def _run_bench(extra: bool) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if extra:
        cmd.append("--extra")
    print(f"$ {' '.join(cmd)}", flush=True)
    # No shell timeout: SIGKILLing a device-blocked python wedges the relay
    # (verify skill). The bench itself bounds its chains.
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"bench.py exited {proc.returncode}")
        sys.exit(2)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print("bench.py produced no JSON line")
    sys.exit(2)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--json", default="",
                    help="gate a saved bench JSON instead of running bench.py")
    ap.add_argument("--tolerance", type=float, default=0.07,
                    help="relative regression tolerance (default 0.07)")
    ap.add_argument("--extra", action="store_true",
                    help="bench inference too (bench.py --extra)")
    ap.add_argument("--smoke", action="store_true",
                    help="also run the real-TPU Mosaic smoke suite "
                         "(SSHSLIE_TPU_SMOKE=1 tests/test_tpu_smoke.py)")
    ap.add_argument("--archive", default="",
                    help="write the gated result to this path on PASS "
                         "(e.g. docs/bench_gate_r5.json) so it joins the "
                         "history")
    args = ap.parse_args(argv)

    history = _load_history()
    if not history:
        print("no BENCH_r*.json history found — nothing to gate against")
        return 2

    current = (json.load(open(args.json)) if args.json
               else _run_bench(args.extra))
    if isinstance(current, dict) and "parsed" in current:
        current = current["parsed"]  # a driver BENCH_r*.json wrapper

    failures = []
    gated = 0
    print(f"\nGate vs median of {len(history)} historical runs "
          f"(tolerance {args.tolerance:.0%}):")
    for name, (get, lower_is_worse) in _GATES.items():
        cur = get(current)
        hist = [get(p) for _, p in history]
        hist = [h for h in hist if h is not None]
        if cur is None or not hist:
            continue  # metric absent in this run or in all of history
        gated += 1
        ref = statistics.median(hist)
        if lower_is_worse:
            ok = cur >= ref * (1 - args.tolerance)
            direction = "≥"
            bound = ref * (1 - args.tolerance)
        else:
            ok = cur <= ref * (1 + args.tolerance)
            direction = "≤"
            bound = ref * (1 + args.tolerance)
        status = "PASS" if ok else "FAIL"
        print(f"  [{status}] {name}: {cur:.4g} (median {ref:.4g}, "
              f"need {direction} {bound:.4g})")
        if not ok:
            failures.append(name)

    if args.smoke:
        env = dict(os.environ, SSHSLIE_TPU_SMOKE="1")
        print("\n$ SSHSLIE_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py -q",
              flush=True)
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_tpu_smoke.py", "-q"],
            cwd=REPO, env=env).returncode
        if rc != 0:
            failures.append("tpu_smoke")
            print("  [FAIL] tpu_smoke")
        else:
            print("  [PASS] tpu_smoke")

    if gated == 0:
        print("\nGATE FAILED: no comparable metric in the bench result")
        return 2
    if failures:
        print(f"\nGATE FAILED: {', '.join(failures)}")
        return 1
    if args.archive:
        path = os.path.join(REPO, args.archive)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(current, f, indent=2)
        print(f"archived result -> {args.archive}")
    print("\nGATE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
