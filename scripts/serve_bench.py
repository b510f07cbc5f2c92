#!/usr/bin/env python
"""Serving-path throughput/latency benchmark (in-process EnhanceService).

Measures the persistent-serving surface (sshslie_tpu/serve.py) under
concurrent load on the local accelerator: N client threads fire same-shape
cubes at one service; reports requests/sec and latency percentiles, for
sequential serving (max_batch 1) vs dynamic micro-batching, and optionally
for quantized weights.

The service path includes the real per-request host work (normalization,
bucket padding, denormalization) — this is the end-to-end number a serving
deployment sees, unlike bench.py --extra's pure device forward.

Usage:
  python scripts/serve_bench.py [--size 256] [--channels 64]
         [--requests 48] [--threads 1,4,16] [--quantize int8] [--device cpu]

``--threads`` takes a comma list: every sequential/micro-batch case runs at
each concurrency level (the client-sweep grid of docs/PERFORMANCE.md's
Serving section). A cold-bucket case reports the first-request latency at an
unwarmed shape (compile + bucket build) vs the warmed steady state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(cfg_kwargs, size, channels, requests, threads, label, wire="f32"):
    from sshslie_tpu.config import Config
    from sshslie_tpu.serve import EnhanceService

    cfg = Config(channels=channels, normalization="global_normalization",
                 global_min=0.0, global_max=4095.0, **cfg_kwargs)
    service = EnhanceService(cfg, channels)
    service.warmup([(size, size)])

    rng = np.random.RandomState(0)
    cubes = [rng.rand(size, size, channels).astype(np.float32) * 4000.0
             for _ in range(min(requests, 8))]

    lat = []

    def one(i):
        t0 = time.perf_counter()
        out = service.enhance(cubes[i % len(cubes)], wire=wire)
        dt = time.perf_counter() - t0
        assert out["S"].shape == (size, size, channels)
        return dt

    # prime (post-warmup steady state)
    one(0)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        lat = list(pool.map(one, range(requests)))
    wall = time.perf_counter() - t0
    if service.batcher is not None:
        service.batcher.close()

    lat = np.sort(np.array(lat))
    stats = service.stats()
    return {
        "case": label,
        "requests_per_sec": round(requests / wall, 2),
        "mpb_per_sec": round(requests * size * size * channels / 1e6 / wall, 1),
        "latency_p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
        # nearest-rank-from-above: int(n*0.95)-1 under-reports the tail
        "latency_p95_ms": round(float(np.percentile(lat, 95, method="higher")) * 1e3, 1),
        "max_batch_seen": stats.get("max_batch_seen", 1),
        "batched_runs": stats.get("batched_runs", 0),
    }


def interleaved_wire_case(size, channels, requests_per_enc, encodings):
    """Per-request-interleaved wire-format A/B on ONE service session.

    Back-to-back per-encoding cases (run_case) are confounded by relay
    session drift at large cubes (±20% between identical cases at 512² —
    docs/serve_wire_512_r4.json): the transport's throughput wanders on a
    timescale comparable to a whole case. Interleaving the encodings
    request-by-request inside one session makes every encoding sample every
    drift regime, so the per-encoding medians are directly comparable —
    the same chain-differencing idea bench.py uses, applied to serving."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.serve import EnhanceService

    cfg = Config(channels=channels, normalization="global_normalization",
                 global_min=0.0, global_max=4095.0, serve_max_batch=1)
    service = EnhanceService(cfg, channels)
    service.warmup([(size, size)])
    rng = np.random.RandomState(0)
    cube = (rng.rand(size, size, channels) * 4000.0).astype(np.float32)
    for enc in encodings:  # prime every wire path once (first-use jits)
        service.enhance(cube, wire=enc)
    lat = {enc: [] for enc in encodings}
    for i in range(requests_per_enc * len(encodings)):
        enc = encodings[i % len(encodings)]
        t0 = time.perf_counter()
        out = service.enhance(cube, wire=enc)
        lat[enc].append(time.perf_counter() - t0)
        assert out["S"].shape == (size, size, channels)
    per_enc = {}
    for enc in encodings:
        arr = np.sort(np.array(lat[enc]))
        per_enc[enc] = {
            "latency_p50_ms": round(float(arr[len(arr) // 2]) * 1e3, 1),
            "latency_p95_ms": round(
                float(np.percentile(arr, 95, method="higher")) * 1e3, 1),
        }
    # Baseline for the speedup column: f32 when present, else the first
    # listed encoding — and NAME the baseline in the key so a bf16,u16-only
    # run can't be misread as vs-f32 numbers.
    base_enc = "f32" if "f32" in per_enc else encodings[0]
    base = per_enc[base_enc]
    for enc in encodings:
        per_enc[enc][f"speedup_p50_vs_{base_enc}"] = round(
            base["latency_p50_ms"] / per_enc[enc]["latency_p50_ms"], 2)
    return {"case": "wire_interleaved_t1",
            "requests_per_encoding": requests_per_enc,
            "baseline_encoding": base_enc,
            "encodings": per_enc}


def http_interleaved_case(size, channels, requests_per_arm, arms):
    """Full HTTP round-trip wire-format A/B against a real in-process server.

    The r4 interleaved case (above) measured the RESPONSE side in-process;
    this one closes the uplink half (VERDICT r4 #2): each arm is a
    (request_encoding, response_encoding) pair driven through
    serve_client.enhance_over_http against a live EnhanceServer — client
    encode, loopback POST, server decode (device-side for compact u16/bf16
    bodies when accepts_encoded_requests), TPU forward, response encode,
    client decode. Arms interleave request-by-request in one session so
    every arm samples every relay-drift regime (reference contract:
    /root/reference/model.py:442-443, the .mat-in/.mat-out test path).

    zlib arms are deliberately absent: the synthetic cubes are uniform
    noise, incompressible by construction — a deflate number here would
    misrepresent real captures either way."""
    import serve_client  # scripts/ sibling; sys.path[0] is this file's dir

    from sshslie_tpu.config import Config
    from sshslie_tpu.serve import EnhanceServer, EnhanceService

    cfg = Config(channels=channels, normalization="global_normalization",
                 global_min=0.0, global_max=4095.0, serve_max_batch=1)
    service = EnhanceService(cfg, channels)
    service.warmup([(size, size)])
    server = EnhanceServer(service, port=0).start()
    url = f"http://127.0.0.1:{server.port}"
    rng = np.random.RandomState(0)
    cube = (rng.rand(size, size, channels) * 4000.0).astype(np.float32)
    try:
        for req_enc, resp_enc in arms:  # prime every path (first-use jits)
            # Generous timeout: the prime pays any fresh XLA compile under
            # the device lock, and the relay has measured congestion windows
            # >300 s (docs/PERFORMANCE.md r5).
            _, _, wall = serve_client.enhance_over_http(
                url, cube, request_encoding=req_enc, encoding=resp_enc,
                timeout=1800.0)
            print(f"primed {req_enc}/{resp_enc}: {wall:.1f}s", flush=True)
        lat = {arm: [] for arm in arms}
        for i in range(requests_per_arm * len(arms)):
            req_enc, resp_enc = arms[i % len(arms)]
            result, _, wall = serve_client.enhance_over_http(
                url, cube, request_encoding=req_enc, encoding=resp_enc,
                timeout=1800.0)
            assert result["data"].shape == (size, size, channels)
            lat[(req_enc, resp_enc)].append(wall)
            if (i + 1) % len(arms) == 0:
                print(f"round {(i + 1) // len(arms)}/{requests_per_arm} "
                      f"done", flush=True)
    finally:
        server.shutdown()
    per_arm = {}
    for arm in arms:
        arr = np.sort(np.array(lat[arm]))
        per_arm["/".join(arm)] = {
            "latency_p50_ms": round(float(arr[len(arr) // 2]) * 1e3, 1),
            "latency_p95_ms": round(
                float(np.percentile(arr, 95, method="higher")) * 1e3, 1),
        }
    base_key = ("f32/f32" if "f32/f32" in per_arm
                else "/".join(arms[0]))
    base = per_arm[base_key]["latency_p50_ms"]
    for key in per_arm:
        per_arm[key][f"speedup_p50_vs_{base_key}"] = round(
            base / per_arm[key]["latency_p50_ms"], 2)
    return {"case": "http_wire_interleaved_t1",
            "requests_per_arm": requests_per_arm,
            "baseline_arm": base_key,
            "device_decode_active": service.accepts_encoded_requests,
            "arms": per_arm}


def cold_bucket_case(size, channels):
    """First-request latency at an UNWARMED shape bucket (includes jit
    compile + bucket setup) vs the immediate second request — the number a
    deployment sees when a new capture size first arrives."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.serve import EnhanceService

    cfg = Config(channels=channels, normalization="global_normalization",
                 global_min=0.0, global_max=4095.0, serve_max_batch=1)
    service = EnhanceService(cfg, channels)
    service.warmup([(size, size)])
    rng = np.random.RandomState(1)
    cold = rng.rand(size + 64, size + 64, channels).astype(np.float32) * 4000.0
    t0 = time.perf_counter()
    service.enhance(cold)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    service.enhance(cold)
    second = time.perf_counter() - t0
    return {"case": f"cold_bucket_{size + 64}",
            "first_request_s": round(first, 2),
            "warmed_request_ms": round(second * 1e3, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--threads", default="1,4,16",
                    help="comma list of concurrent client counts")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--quantize", default="", choices=("", "int8", "fp8", "int4"))
    ap.add_argument("--encodings", default="",
                    help="comma list from f32,bf16,u16: adds sequential "
                         "1-client cases with the reduced-precision d2h "
                         "fetch (the wire-format lever on slow transports)")
    ap.add_argument("--interleave", action="store_true",
                    help="run --encodings as ONE interleaved session "
                         "(per-request A/B; cancels transport drift) "
                         "instead of back-to-back cases")
    ap.add_argument("--http", default="",
                    help="comma list of req:resp encoding pairs (e.g. "
                         "'mat:mat,f32:f32,u16:u16') — full HTTP round-trip "
                         "interleaved A/B against a real server; "
                         "--requests is per arm")
    ap.add_argument("--no_cold", action="store_true",
                    help="skip the cold-bucket case (focused wire-format "
                         "sessions: the +64 bucket compile is minutes of "
                         "unrelated work)")
    ap.add_argument("--device", default="", help="'cpu' forces the CPU backend")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    thread_counts = [int(t) for t in str(args.threads).split(",") if t]
    cases = [
        ({"serve_max_batch": 1}, "sequential"),
        ({"serve_max_batch": args.max_batch,
          "serve_batch_window_ms": 5.0}, f"microbatch{args.max_batch}"),
    ]
    if args.quantize:
        cases.append(({"serve_max_batch": 1, "serve_quantize": args.quantize},
                      f"sequential_{args.quantize}"))

    results = []
    for th in thread_counts:
        for kw, label in cases:
            results.append(run_case(kw, args.size, args.channels,
                                    args.requests, th, f"{label}_t{th}"))
    if args.http:
        arms = [tuple(p.split(":")) for p in args.http.split(",") if p]
        results.append(http_interleaved_case(
            args.size, args.channels, args.requests, arms))
    encs = [e for e in str(args.encodings).split(",") if e]
    if encs and args.interleave:
        results.append(interleaved_wire_case(
            args.size, args.channels, args.requests, encs))
    else:
        for enc in encs:
            results.append(run_case({"serve_max_batch": 1}, args.size,
                                    args.channels, args.requests, 1,
                                    f"wire_{enc}_t1", wire=enc))
    if not args.no_cold:
        results.append(cold_bucket_case(args.size, args.channels))
    report = {
        "workload": f"{args.size}x{args.size}x{args.channels}",
        "requests": args.requests,
        "threads": thread_counts,
        "backend": jax.default_backend(),
        "cases": results,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)
    return report


if __name__ == "__main__":
    main()
