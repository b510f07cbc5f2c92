"""A/B the Pallas shallow-conv kernels on INFERENCE-ONLY graphs (VERDICT r4 #3).

Round 4 measured the Pallas 9×9 kernels per-op faster than the XLA conv
emitter (dgrad 1.49×) yet slower *in the train step* (0.66×): the Mosaic
custom call pins NHWC layouts on its operands, and XLA re-lays-out every
surrounding VPU op around it, inflating the elementwise surface that
dominates the training graph. The round-4 disposition kept the kernels
in-tree "for narrower graphs (e.g. standalone decomposition inference,
where the elementwise surface is small)" — this script closes that claim
with numbers instead of prose.

Graphs measured, each at 512²×{64,224} (the two reference working points —
/root/reference/model.py:22 is the 9×9 conv; model.py:406-443 is the
full-cube test path):

  * ``decom``: DecompositionNet forward only (R, L) — the narrowest graph
    containing the 9×9 conv; elementwise surface is a handful of ReLUs
    and concats.
  * ``full``: the whole LowLightEnhanceNet forward (what evaluate.py jits)
    — the 9×9 conv is a small fraction; layout pinning has the most
    surrounding ops to poison.

Method: identical params across impls (init once, xla), device-resident
input, on-device sum reduction so the end-of-chain fetch is 4 bytes, and
chain-differencing (time a 2-chain and a 10-chain, marginal = Δ/8) because
`block_until_ready` on the axon relay is not a true sync. TPU only.

Run (detached, never under `timeout` — see .claude/skills/verify/SKILL.md):
    nohup python scripts/pallas_inference_ab.py > /tmp/pallas_ab.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_ms(fn, params, cube, n_lo: int = 2, n_hi: int = 10) -> float:
    """Marginal per-call ms via two-chain differencing with a float fetch."""
    def chain(n):
        out = None
        for _ in range(n):
            out = fn(params, cube)
        return float(out)

    chain(1)  # compile + warm
    t0 = time.perf_counter(); chain(n_lo); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); chain(n_hi); tb = time.perf_counter() - t0
    return (tb - ta) / (n_hi - n_lo) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--channels", default="64,224")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--repeats", type=int, default=5,
                    help="median-of-N chain-differenced measurements (median,"
                         " not min: relay jitter makes individual marginals"
                         " occasionally NEGATIVE, and min selects exactly"
                         " those outliers)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sshslie_tpu.config import Config
    from sshslie_tpu.models.decomposition import DecompositionNet
    from sshslie_tpu.train import build_model, init_params

    dtype = jnp.bfloat16 if args.precision == "bfloat16" else jnp.float32
    rows = []
    for ch in [int(c) for c in args.channels.split(",")]:
        cube = jax.device_put(
            np.random.RandomState(0)
            .rand(1, args.size, args.size, ch)
            .astype(np.float32))
        baselines = {}
        for impl in ("xla", "pallas"):
            cfg = Config(channels=ch, precision=args.precision,
                         conv_impl=impl)
            full = build_model(cfg, ch)
            decom = DecompositionNet(in_channels=ch, dtype=dtype,
                                     conv_impl=full.conv_impl)
            # Same weights for both impls: param trees are impl-independent.
            params = init_params(full, 0, 64)

            graphs = {
                "full": jax.jit(
                    lambda p, x, m=full: m.apply({"params": p}, x)[3].sum()),
                "decom": jax.jit(
                    lambda p, x, m=decom: sum(
                        o.sum() for o in m.apply(
                            {"params": p["decomposition_net"]}, x))),
            }
            for name, fn in graphs.items():
                ms = statistics.median(
                    chain_ms(fn, params, cube)
                    for _ in range(args.repeats))
                row = {"graph": name, "channels": ch, "impl": impl,
                       "ms": round(ms, 3)}
                if impl == "xla":
                    baselines[name] = ms
                else:
                    row["speedup_vs_xla"] = round(baselines[name] / ms, 3)
                rows.append(row)
                print(json.dumps(row), flush=True)

    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
