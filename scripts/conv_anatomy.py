#!/usr/bin/env python
"""Per-operation conv efficiency table + reformulation experiments.

VERDICT r2 next-#1: the roofline note measured the conv *aggregate* at ~70%
of its per-op ceiling and attributed the residue to "dgrad halo overheads
and small wgrad outputs that XLA owns". This script turns that assertion
into a measurement, two ways:

1. **Profiler join** (the primary table): the REAL jitted train step runs
   under a ``jax.profiler`` trace; every ``conv_general_dilated`` HLO
   instruction is classified to (layer, pass) from its op_name metadata —
   ``jvp(...)`` without ``transpose(`` is the forward pass; inside
   ``transpose(jvp(...))`` the two convs per layer split into wgrad (result
   elements == kernel elements) and dgrad (activation-shaped result) — and
   joined with the trace's device durations. Each row carries its analytic
   GFLOPs and its own MXU-column ceiling (v5e bf16: 197 TF/s × cols/128,
   cols = Cout for fwd/wgrad, Cin for dgrad).

2. **Reformulation A/B** (isolated, chain-timed): the suspect passes
   re-expressed explicitly —
   * ``wgrad_im2col``: the 9×9 shallow-conv weight gradient as
     extract-patches + one matmul, vs XLA's native wgrad conv;
   * ``dgrad_as_conv``: the input gradient as a plain forward conv with the
     spatially-reversed, in/out-transposed kernel, vs XLA's native dgrad.
   Chains run inside one jitted ``lax.scan`` whose carry depends on a FULL
   reduction of the op output (a 1-element slice dependency lets XLA narrow
   slice(conv) → conv(slice) and dead-code the op — measured firsthand);
   the reduce adds the same epilogue to both variants, so the A/B ratio is
   unbiased even though absolutes include ~one output read.

Usage:
  python scripts/conv_anatomy.py [--batch 8] [--precision bfloat16]
      [--steps 10] [--trace_dir /tmp/sshslie_conv_anatomy]
      [--skip-reform] [--out conv_anatomy.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16 dense peak (bench.py table)
HBM_GBPS = 819.0     # v5e HBM bandwidth

# flax path → (k, cin, cout, out_hw at p128, per-step applications)
# DecompositionNet runs twice per step (model.py:545-546): the op_name path
# distinguishes the applications but we aggregate and record multiplicity.
LAYER_SPECS = {
    "decomposition_net/conv0":        (3,  64,  32, 128, 2),
    "decomposition_net/shallow_conv": (9,  64,  64, 128, 2),
    "decomposition_net/conv1":        (3,  64,  64, 128, 2),
    "decomposition_net/conv2":        (3,  64, 128,  64, 2),
    "decomposition_net/conv3":        (3, 128, 128,  64, 2),
    "decomposition_net/deconv":       (3, 128,  64,  64, 2),  # transpose conv: MACs over the 64² input grid
    "decomposition_net/conv5":        (3, 128,  64, 128, 2),
    "decomposition_net/conv7":        (3,  96,  64, 128, 2),
    "decomposition_net/recon":        (3,  64,  65, 128, 2),
    "illum_adjust_net/conv0":         (3,  65,  64, 128, 1),
    "illum_adjust_net/conv1":         (3,  64,  64,  64, 1),
    "illum_adjust_net/conv2":         (3,  64,  64,  32, 1),
    "illum_adjust_net/conv3":         (3,  64,  64,  16, 1),
    "illum_adjust_net/deconv1":       (3,  64,  64,  32, 1),
    "illum_adjust_net/deconv2":       (3,  64,  64,  64, 1),
    "illum_adjust_net/deconv3":       (3,  64,  64, 128, 1),
    "illum_adjust_net/feature_fusion": (1, 192,  64, 128, 1),
    "illum_adjust_net/final_conv":    (3,  64,   1, 128, 1),
}

_INSTR_RE = re.compile(r"\s*(?:ROOT )?%([\w.\-]+) = \(?\w+\[([\d,]*)\]")


def classify_convs(hlo_text: str):
    """instr name → (layer, pass) for every model conv in the compiled HLO.

    TPU convs appear either as bare ``convolution(`` instructions or as
    ``fusion(`` instructions (conv + epilogue) whose backend_config carries a
    ``convolution_algorithm_config`` — both kinds hold the conv's op_name
    metadata on the instruction line, so classification is line-based. The
    wgrad/dgrad split inside ``transpose(jvp(...))`` uses the result shape
    (first tuple element for multi-output wgrad accumulators): kernel-sized
    elements ⇒ wgrad, activation-sized ⇒ dgrad."""
    out = {}
    for line in hlo_text.splitlines():
        if "conv_general_dilated" not in line:
            continue
        if (" convolution(" not in line
                and "convolution_algorithm_config" not in line):
            continue
        mo = re.search(r'op_name="([^"]*conv_general_dilated[^"]*)"', line)
        mi = _INSTR_RE.match(line)
        if not mo or not mi:
            continue
        op_name = mo.group(1)
        instr, dims = mi.groups()
        layer = None
        for path in LAYER_SPECS:
            if "/" + path + "/" in "/" + op_name:
                layer = path
                break
        if layer is None:
            continue
        k, cin, cout, _hw, _mult = LAYER_SPECS[layer]
        n_elems = int(np.prod([int(d) for d in dims.split(",") if d]))
        if "transpose(" not in op_name:
            pas = "fwd"
        elif n_elems == k * k * cin * cout:
            pas = "wgrad"
        else:
            pas = "dgrad"
        out[instr] = (layer, pas)
    return out


def profiled_table(args):
    import jax
    import jax.numpy as jnp

    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs, make_optimizer,
        make_train_step,
    )
    from sshslie_tpu.utils.jit_cache import enable as enable_jit_cache

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from profile_step import collect_device_times

    enable_jit_cache()
    cfg = Config(channels=64, patch_size=128, batch_size=args.batch,
                 precision=args.precision, attention_impl="auto")
    model = build_model(cfg, 64)
    params = init_params(model, 0, 128)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, loss_coeffs(cfg))
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (args.batch, 128, 128, 64), jnp.float32)
    lr = jnp.float32(1e-3)
    hlo = step.lower(state, x, lr).compile().as_text()
    conv_map = classify_convs(hlo)

    for _ in range(3):
        state, terms = step(state, x, lr)
    float(terms["total_loss"])
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, terms = step(state, x, lr)
    float(terms["total_loss"])
    jax.profiler.stop_trace()

    durs = collect_device_times(args.trace_dir)  # name → total us
    device_total_us = sum(durs.values())

    # join: trace event names match HLO instruction names (sans %)
    rows = {}
    matched_us = 0
    for name, us in durs.items():
        key = conv_map.get(name.lstrip("%"))
        if key is None:
            continue
        matched_us += us
        layer, pas = key
        r = rows.setdefault(layer, {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0,
                                    "n": {"fwd": 0, "dgrad": 0, "wgrad": 0}})
        r[pas] += us
        r["n"][pas] += 1

    table = []
    for layer, spec in LAYER_SPECS.items():
        if layer not in rows:
            continue
        k, cin, cout, out_hw, mult = spec
        r = rows[layer]
        gflop = 2 * args.batch * out_hw * out_hw * k * k * cin * cout / 1e9
        bpe = 2 if args.precision == "bfloat16" else 4
        # activation/kernel/output byte traffic per pass (roofline denominator)
        act_in = args.batch * out_hw * out_hw * cin * bpe       # approx: in≈out grid
        act_out = args.batch * out_hw * out_hw * cout * bpe
        wbytes = k * k * cin * cout * bpe
        bytes_per_pass = {
            "fwd": act_in + wbytes + act_out,
            "dgrad": act_out + wbytes + act_in,
            "wgrad": act_in + act_out + wbytes,
        }
        entry = {"layer": layer, "k": k, "cin": cin, "cout": cout,
                 "out_hw": out_hw, "apps_per_step": mult,
                 "gflop_per_pass_per_app": round(gflop, 3)}
        for pas, cols in (("fwd", cout), ("dgrad", cin), ("wgrad", cout)):
            ms = r[pas] / args.steps / 1e3  # total across apps, per step
            # instruction count for this pass (dgrad is absent for layers
            # whose input is the batch itself — no grad wrt data needed)
            n_apps = r["n"][pas]
            # Roofline floor: MXU-column-limited compute time OR HBM traffic
            # time, whichever is larger. Columns: Cout for fwd, Cin for
            # dgrad; wgrad's (k²Cin × Cout) output lets XLA map either dim
            # to lanes, so its column bound uses the wider of the two.
            if pas == "wgrad":
                cols = max(cout, min(k * k * cin, 128))
            mxu_tflops = PEAK_TFLOPS * min(cols, 128) / 128.0
            t_compute_ms = gflop / mxu_tflops
            t_bw_ms = bytes_per_pass[pas] / HBM_GBPS / 1e6
            t_floor_ms = max(t_compute_ms, t_bw_ms)
            tf = gflop * n_apps / ms if ms > 0 else 0.0
            entry[pas] = {
                "ms_per_step": round(ms, 4),
                "n_apps": n_apps,
                "tflops": round(tf, 1),
                "ceiling_tflops": round(mxu_tflops, 1),
                "bound": "bw" if t_bw_ms > t_compute_ms else "mxu",
                "roofline_ms_per_app": round(t_floor_ms, 4),
                "pct_of_roofline": round(
                    100 * t_floor_ms * n_apps / ms, 1) if ms else None,
            }
        table.append(entry)

    conv_ms = sum(e[p]["ms_per_step"] for e in table
                  for p in ("fwd", "dgrad", "wgrad"))
    conv_gf = sum(e[p]["n_apps"] * e["gflop_per_pass_per_app"]
                  for e in table for p in ("fwd", "dgrad", "wgrad"))
    return {
        "device_total_ms_per_step": round(device_total_us / args.steps / 1e3, 3),
        "conv_ms_per_step": round(conv_ms, 3),
        "conv_gflop_per_step": round(conv_gf, 1),
        "conv_agg_tflops": round(conv_gf / conv_ms, 1) if conv_ms else None,
        "layers": table,
    }


# ---------------------------------------------------------------------------
# isolated chain timing for the reformulation A/B
# ---------------------------------------------------------------------------

def chain_time(f, carry0, n1, n2, reps=3):
    """Marginal seconds/op. The carry depends on a FULL reduction of the op
    output (slice deps get narrowed through convs); difference the per-length
    minima — relay noise only ever adds time."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnums=0)
    def chain(n, c0):
        def body(c, _):
            out = f(c)
            dep = jnp.sum(out).astype(c.dtype)
            eps = jnp.asarray(1e-30, c.dtype)
            return c + dep * eps, None

        c, _ = lax.scan(body, c0, None, length=n)
        return jnp.sum(c).astype(jnp.float32)

    float(chain(n1, carry0))
    float(chain(n2, carry0))

    def timed(n):
        t0 = time.perf_counter()
        float(chain(n, carry0))
        return time.perf_counter() - t0

    t1 = min(timed(n1) for _ in range(reps))
    t2 = min(timed(n2) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (n2 - n1)


def reformulations(batch, dtype_name, n1, n2):
    import jax
    import jax.numpy as jnp
    from jax import lax

    DN = ("NHWC", "HWIO", "NHWC")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    out = {}
    key = jax.random.PRNGKey(1)

    # --- A. shallow-conv (9×9, 64→64, 128²) wgrad as im2col matmul --------
    k, cin, cout, hw = 9, 64, 64, 128
    kx, kw, kd = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (batch, hw, hw, cin), jnp.float32).astype(dtype)
    w = (jax.random.uniform(kw, (k, k, cin, cout), jnp.float32) * 0.1).astype(dtype)
    dy = jax.random.uniform(kd, (batch, hw, hw, cout), jnp.float32).astype(dtype)
    gflop = 2 * batch * hw * hw * k * k * cin * cout / 1e9

    def conv(x_, w_):
        return lax.conv_general_dilated(x_, w_, (1, 1), "SAME",
                                        dimension_numbers=DN)

    def wgrad_native(dy_):
        return jax.grad(lambda w_: jnp.vdot(conv(x, w_).astype(jnp.float32),
                                            dy_.astype(jnp.float32)))(w)

    def wgrad_im2col(dy_):
        # patches: (B, H, W, Cin·k·k), feature order (cin, kh, kw)
        p = lax.conv_general_dilated_patches(x, (k, k), (1, 1), "SAME",
                                             dimension_numbers=DN)
        dw = jnp.einsum("bhwp,bhwo->po", p, dy_)
        return dw.reshape(cin, k, k, cout).transpose(1, 2, 0, 3)

    ref_dw = np.asarray(wgrad_native(dy), np.float32)
    alt_dw = np.asarray(wgrad_im2col(dy), np.float32)
    rel = float(np.max(np.abs(ref_dw - alt_dw)) / (np.max(np.abs(ref_dw)) + 1e-9))
    t_nat = chain_time(wgrad_native, dy, n1, n2)
    t_alt = chain_time(wgrad_im2col, dy, n1, n2)
    out["shallow_wgrad_im2col"] = {
        "native_ms": round(t_nat * 1e3, 4), "im2col_ms": round(t_alt * 1e3, 4),
        "native_tflops": round(gflop / t_nat / 1e3, 1),
        "im2col_tflops": round(gflop / t_alt / 1e3, 1),
        "speedup": round(t_nat / t_alt, 3), "max_rel_delta": rel,
    }

    # --- B. dgrad as a forward conv with reversed/transposed kernel -------
    for name, kk in (("shallow9", 9), ("conv1_3x3", 3)):
        cin_ = cout_ = 64
        hw_ = 128
        kx, kw, kd = jax.random.split(jax.random.fold_in(key, kk), 3)
        x_ = jax.random.uniform(kx, (batch, hw_, hw_, cin_), jnp.float32).astype(dtype)
        w_ = (jax.random.uniform(kw, (kk, kk, cin_, cout_), jnp.float32) * 0.1).astype(dtype)
        dy_ = jax.random.uniform(kd, (batch, hw_, hw_, cout_), jnp.float32).astype(dtype)
        gflop_ = 2 * batch * hw_ * hw_ * kk * kk * cin_ * cout_ / 1e9

        def conv_(a, b):
            return lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                            dimension_numbers=DN)

        def dgrad_native(d, x_=x_, w_=w_):
            return jax.grad(
                lambda xx: jnp.vdot(conv_(xx, w_).astype(jnp.float32),
                                    d.astype(jnp.float32)))(x_)

        w_rev = jnp.flip(w_, axis=(0, 1)).transpose(0, 1, 3, 2)

        def dgrad_as_conv(d, w_rev=w_rev):
            return conv_(d, w_rev)

        ref_dx = np.asarray(dgrad_native(dy_), np.float32)
        alt_dx = np.asarray(dgrad_as_conv(dy_), np.float32)
        rel = float(np.max(np.abs(ref_dx - alt_dx))
                    / (np.max(np.abs(ref_dx)) + 1e-9))
        t_nat = chain_time(dgrad_native, dy_, n1, n2)
        t_alt = chain_time(dgrad_as_conv, dy_, n1, n2)
        out[f"dgrad_as_conv_{name}"] = {
            "native_ms": round(t_nat * 1e3, 4),
            "as_conv_ms": round(t_alt * 1e3, 4),
            "native_tflops": round(gflop_ / t_nat / 1e3, 1),
            "as_conv_tflops": round(gflop_ / t_alt / 1e3, 1),
            "speedup": round(t_nat / t_alt, 3), "max_rel_delta": rel,
        }
    return out


def pallas_ab(batch, dtype_name, n1, n2):
    """Round-4 VERDICT #1: the one reformulation class that bypasses the XLA
    conv emitter — hand-written Mosaic kernels (ops/conv_pallas.py) — timed
    per-pass against the native emitter on the measured-weak shallow conv
    (9×9, 64→64, 128²). Same chain-differencing methodology as the round-3
    reformulations, so the columns are comparable."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sshslie_tpu.ops.conv_pallas import (
        _dgrad_weights, conv9_fwd, conv9_wgrad)

    DN = ("NHWC", "HWIO", "NHWC")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    k, cin, cout, hw = 9, 64, 64, 128
    kx, kw, kd = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.uniform(kx, (batch, hw, hw, cin), jnp.float32).astype(dtype)
    w = (jax.random.uniform(kw, (k, k, cin, cout), jnp.float32) * 0.1).astype(dtype)
    dy = jax.random.uniform(kd, (batch, hw, hw, cout), jnp.float32).astype(dtype)
    gflop = 2 * batch * hw * hw * k * k * cin * cout / 1e9
    # The width-paired kernels do (k+1)/k more MXU work (phantom column);
    # report achieved TF/s on the USEFUL flops so columns stay comparable.

    def conv(a, b):
        return lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                        dimension_numbers=DN)

    cases = {}

    def add(name, native_fn, pallas_fn, probe):
        ref = np.asarray(native_fn(probe), np.float32)
        alt = np.asarray(pallas_fn(probe), np.float32)
        rel = float(np.max(np.abs(ref - alt)) / (np.max(np.abs(ref)) + 1e-9))
        t_nat = chain_time(native_fn, probe, n1, n2)
        t_pal = chain_time(pallas_fn, probe, n1, n2)
        cases[name] = {
            "native_ms": round(t_nat * 1e3, 4),
            "pallas_ms": round(t_pal * 1e3, 4),
            "native_tflops": round(gflop / t_nat / 1e3, 1),
            "pallas_tflops": round(gflop / t_pal / 1e3, 1),
            "speedup": round(t_nat / t_pal, 3), "max_rel_delta": rel,
        }

    add("shallow_fwd",
        lambda x_: conv(x_, w),
        lambda x_: conv9_fwd(x_, w),
        x)
    w_rev = _dgrad_weights(w)
    add("shallow_dgrad",
        lambda d: jax.grad(
            lambda xx: jnp.vdot(conv(xx, w).astype(jnp.float32),
                                d.astype(jnp.float32)))(x),
        lambda d: conv9_fwd(d, w_rev),
        dy)
    add("shallow_wgrad",
        lambda d: jax.grad(
            lambda w_: jnp.vdot(conv(x, w_).astype(jnp.float32),
                                d.astype(jnp.float32)))(w).astype(dtype),
        lambda d: conv9_wgrad(x, d, k).astype(dtype),
        dy)
    return cases


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--precision", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=120)
    ap.add_argument("--trace_dir", default="/tmp/sshslie_conv_anatomy")
    ap.add_argument("--skip-reform", action="store_true")
    ap.add_argument("--skip-profile", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="A/B the hand-written Pallas shallow-conv kernels "
                         "against the native emitter (TPU only)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    report = {"workload": f"b{args.batch}_p128_c64_{args.precision}",
              "device": str(jax.devices()[0])}
    if not args.skip_profile:
        prof = profiled_table(args)
        report.update(prof)
        for e in prof["layers"]:
            print(f"{e['layer']:34s} " + "  ".join(
                f"{p} {e[p]['ms_per_step']:7.3f} ms {e[p]['bound']} "
                f"{(e[p]['pct_of_roofline'] or 0):5.1f}%"
                for p in ("fwd", "dgrad", "wgrad")), file=sys.stderr)
        print(f"conv total {prof['conv_ms_per_step']} ms/step of "
              f"{prof['device_total_ms_per_step']} ms device total; "
              f"aggregate {prof['conv_agg_tflops']} TF/s", file=sys.stderr)
    if not args.skip_reform:
        report["reformulations"] = reformulations(
            args.batch, args.precision, args.n1, args.n2)
    if args.pallas:
        report["pallas"] = pallas_ab(
            args.batch, args.precision, args.n1, args.n2)
        for name, c in report["pallas"].items():
            print(f"pallas {name:14s} native {c['native_ms']:7.3f} ms "
                  f"({c['native_tflops']} TF/s)  pallas {c['pallas_ms']:7.3f} ms "
                  f"({c['pallas_tflops']} TF/s)  x{c['speedup']} "
                  f"relΔ {c['max_rel_delta']:.2e}", file=sys.stderr)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)
    return report


if __name__ == "__main__":
    main()
