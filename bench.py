#!/usr/bin/env python
"""Benchmark harness: HSI train-step throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MPB/s", "vs_baseline": N, ...}

North-star metric (BASELINE.md): HSI megapixel·bands/sec/chip on the training
step — batch·H·W·C / step-seconds / 1e6 — at the reference workload scale
(batch 2, 128×128 patches, 64 bands; reference config/config.yml:7-13).
``vs_baseline`` is the ratio to the PyTorch-CPU reference step measured from
/root/reference (baseline_torch_cpu.json); the target is ≥20×.

Usage: python bench.py [--batch 2] [--patch 128] [--channels 64] [--steps 50]
       [--precision float32|bfloat16] [--extra]  (--extra adds inference bench)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--attention_impl", default="auto")
    ap.add_argument("--extra", action="store_true", help="also bench full-cube inference")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # Persistent compile cache (same policy as main.py): repeat bench runs
    # skip the 20-40 s first compile.
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()

    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs, make_optimizer,
        make_train_step,
    )

    cfg = Config(channels=args.channels, patch_size=args.patch,
                 batch_size=args.batch, precision=args.precision,
                 attention_impl=args.attention_impl)
    model = build_model(cfg, cfg.channels)
    params = init_params(model, 0, cfg.patch_size)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, loss_coeffs(cfg))

    key = jax.random.PRNGKey(0)
    batch = jax.random.uniform(
        key, (args.batch, args.patch, args.patch, args.channels), jnp.float32
    )
    lr = jnp.float32(1e-3)

    def timed_chain(state, n, fetch_every=10):
        """Dispatch n chained steps, forcing a real device→host scalar fetch
        every ``fetch_every`` steps (bounds in-flight work on queued
        transports) and at the end. On some transports block_until_ready is
        not a true sync; float() is."""
        t0 = time.perf_counter()
        terms = None
        loss = 0.0
        for i in range(n):
            state, terms = step(state, batch, lr)
            if (i + 1) % fetch_every == 0:
                loss = float(terms["total_loss"])
        loss = float(terms["total_loss"])
        return time.perf_counter() - t0, state, loss

    # warmup / compile
    _, state, _ = timed_chain(state, args.warmup)
    # marginal per-step time cancels dispatch+fetch overhead
    n1 = max(args.steps // 4, 1)
    n2 = args.steps
    t1, state, _ = timed_chain(state, n1)
    t2, state, loss = timed_chain(state, n2)
    dt = (t2 - t1) / (n2 - n1) if n2 > n1 else t2 / n2
    assert loss == loss, "loss is NaN"

    mpb_per_step = args.batch * args.patch * args.patch * args.channels / 1e6
    mpb_per_sec = mpb_per_step / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baseline_torch_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            base = json.load(fh)
        # scale-normalize: baseline throughput at its own workload
        vs_baseline = mpb_per_sec / base["mpb_per_sec"]

    result = {
        "metric": "hsi_train_throughput",
        "value": round(mpb_per_sec, 4),
        "unit": "megapixel*bands/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        "step_seconds": round(dt, 6),
        "workload": f"b{args.batch}_p{args.patch}_c{args.channels}_{args.precision}",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    if args.extra:
        import numpy as np

        # Chip inference throughput: device-resident input, on-device
        # reduction so the end-of-chain fetch is 4 bytes (the axon relay's
        # device↔host bandwidth would otherwise dominate and misattribute
        # transfer cost to the chip).
        infer_fn = jax.jit(lambda p, x: model.apply({"params": p}, x)[3].sum())
        cube = jax.device_put(
            np.random.rand(1, 512, 512, args.channels).astype(np.float32)
        )
        float(infer_fn(state.params, cube))  # compile

        def infer_chain(n):
            out = None
            for _ in range(n):
                out = infer_fn(state.params, cube)
            return float(out)

        t0 = time.perf_counter(); infer_chain(2); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); infer_chain(10); tb = time.perf_counter() - t0
        dt_inf = (tb - ta) / 8
        result["inference_512_seconds"] = round(dt_inf, 4)
        result["inference_mpbs"] = round(512 * 512 * args.channels / 1e6 / dt_inf, 1)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
