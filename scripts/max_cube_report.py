#!/usr/bin/env python
"""Where does single-chip whole-cube inference end?

The reference's test path (model.py:406-443) runs the full H x W x C cube
through the network in one forward — fine for its 512-class captures on a
GPU with torch's op-by-op allocator, but the interesting TPU question is
the *compiled* limit: XLA assigns every activation buffer at compile time
(then squeezes oversubscribed programs — docs/PERFORMANCE.md r4), so for
each cube size the whole-cube forward either fits, squeezes, or refuses.
This harness measures ONE size per process and reports:

  * XLA memory analysis (temp/argument/output bytes — PRE-squeeze bounds),
  * compile outcome (a RESOURCE_EXHAUSTED here is a result, not a crash),
  * chain-differenced device latency with a single end-of-chain scalar
    fetch (never the cube itself: the relay moves ~40 MB/s d2h and a
    1024^2 x 64 cube is 256 MB).

Run one size per fresh process (the relay's compile service replays
same-shape failures — docs/PERFORMANCE.md r4), e.g.:

  for s in 512 1024 1448 2048; do
    python scripts/max_cube_report.py --size $s --out /tmp/maxcube_$s.json
  done

Attention note: at H the transformer sequence is (H/8)^2 tokens;
`attention_impl auto` switches to the Pallas flash kernel past 2048
tokens (ops/attention.py), so the S^2 dense tensor never limits the cube
— conv activations (each ~H*W*64*4 B) do.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OOM_PAT = re.compile(r"RESOURCE_EXHAUSTED|Ran out of memory|Allocation")


def _strip_ansi(s: str) -> str:
    return re.sub(r"\x1b\[[0-9;]*m", "", s)


def _oom_summary(e: Exception) -> str:
    msg = _strip_ansi(str(e))
    first = next((ln for ln in msg.splitlines() if "emory" in ln),
                 msg.splitlines()[0] if msg else "")
    return first.strip()[:300]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, required=True,
                    help="square cube side H=W (multiple of 8)")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--precision", default="float32",
                    help="float32 = the eval/test parity path; bfloat16 "
                         "halves activation bytes")
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--skip-timing", action="store_true",
                    help="memory analysis only (no device stepping)")
    ap.add_argument("--steps", type=int, default=8,
                    help="long-chain forward count (short chain = steps//4)")
    ap.add_argument("--device", default="",
                    help="'cpu' forces the CPU backend (no HBM semantics)")
    ap.add_argument("--out", default="", help="also write the JSON here")
    args = ap.parse_args(argv)
    if args.size % 8:
        ap.error("--size must be a multiple of 8 (model stride pyramid)")

    import torch  # noqa: F401  (torch before jax)
    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update("jax_platforms", args.device)
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()

    from sshslie_tpu.config import Config
    from sshslie_tpu.train import build_model, init_params

    cfg = Config(channels=args.channels, precision=args.precision,
                 attention_impl=args.attention_impl)
    model = build_model(cfg, args.channels)
    params = init_params(model, 0, 48)  # params are shape-independent
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x))

    h = args.size
    tokens = (h // 8) * (h // 8)
    result = {
        "size": h,
        "channels": args.channels,
        "precision": args.precision,
        "backend": jax.default_backend(),
        "attention_tokens": tokens,
        "input_mb": round(h * h * args.channels * 4 / 2**20, 1),
    }

    x_shape = jax.ShapeDtypeStruct((1, h, h, args.channels), jnp.float32)
    try:
        compiled = fn.lower(params, x_shape).compile()
    except Exception as e:
        if _OOM_PAT.search(_strip_ansi(str(e))):
            result["compile_oom"] = True
            result["error"] = _oom_summary(e)
            _emit(result, args.out)
            return
        raise
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                result[k.replace("_size_in_bytes", "_bytes")] = int(v)

    if not args.skip_timing:
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, h, h, args.channels),
                               jnp.float32)

        def chain(n):
            """n forward dispatches, ONE scalar fetch (sum of the last S) —
            the relay's block_until_ready is not a true sync and the cube
            itself must never cross the wire (bench.py methodology)."""
            t0 = time.perf_counter()
            s_sum = None
            for _ in range(n):
                _, _, _, s = fn(params, x)
                s_sum = jnp.sum(s)
            val = float(s_sum)
            return time.perf_counter() - t0, val

        try:
            chain(2)  # warmup (executable load + allocator high-water)
            n1, n2 = max(args.steps // 4, 1), args.steps
            t1s, t2s = [], []
            for _ in range(3):
                t1, _ = chain(n1)
                t2, val = chain(n2)
                t1s.append(t1)
                t2s.append(t2)
            result["forward_seconds"] = round(
                (min(t2s) - min(t1s)) / (n2 - n1), 6)
            result["mpb_per_sec"] = round(
                h * h * args.channels / 1e6 / result["forward_seconds"], 1)
            result["check_sum_finite"] = bool(val == val)
        except Exception as e:
            if _OOM_PAT.search(_strip_ansi(str(e))):
                result["runtime_oom"] = True
                result["error"] = _oom_summary(e)
            else:
                raise

    _emit(result, args.out)


def _emit(result, out):
    line = json.dumps(result)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
