#!/usr/bin/env python
"""End-to-end trained-metric parity study: reference (torch-CPU) vs ours.

Closes the loop on BASELINE.md's headline parity targets (PSNR within
0.1 dB / SSIM within 0.001 of the trained reference): both frameworks are
trained END TO END — same synthetic dataset on disk, each side's own .mat
loader + normalization (reference utils.py:36-57 / sshslie_tpu io_hsi),
same transplanted initial weights, the SAME recorded patch stream — then
each side runs its own full-cube inference + denormalization (reference
model.py:363-372), and both outputs are scored against the ground truth
with identical metric code. The report is the per-metric delta.

torchmetrics is not installed in this container, so both outputs are scored
with sshslie_tpu.metrics (torchmetrics-parity pinned by tests/test_metrics);
the framework-vs-framework delta is what the parity budget bounds.

Usage:
  python scripts/parity_ab_study.py [--steps 300] [--channels 16]
         [--patch 64] [--cube 128] [--out report.json]
  python scripts/parity_ab_study.py --seeds 3 [--steps 300] ...

``--seeds N`` makes the chaos argument statistical (VERDICT r2 weak #4):
N independent draws — each with its own dataset seed, torch init seed, AND
a float-chaos control (our framework re-trained from a 1e-6-perturbed
init) — then a summary of the cross-framework delta distribution vs the
own-chaos delta distribution. Parity holds when every seed's
cross-framework dPSNR sits inside its chaos envelope (≤ its own-chaos
delta, or under the 0.1 dB budget outright).

Runs on CPU (both sides) so the comparison is same-hardware. Takes a few
minutes per seed; the torch side dominates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np
import scipy.io as sio

import torch  # noqa: F401  (import torch before jax — CLAUDE.md)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from scripts.make_synthetic_dataset import darken, make_scene  # noqa: E402


def load_reference_model_cls():
    """Import the reference LowLightEnhance with optional deps stubbed."""
    for name in ("mlflow", "torchinfo", "skimage", "skimage.metrics"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchinfo"].summary = lambda *a, **k: "stub"
    tm = types.ModuleType("torchmetrics")
    tmf = types.ModuleType("torchmetrics.functional")
    tmi = types.ModuleType("torchmetrics.functional.image")
    for fn in ("peak_signal_noise_ratio", "structural_similarity_index_measure",
               "spectral_angle_mapper"):
        setattr(tmi, fn, lambda *a, **k: None)
    sys.modules.setdefault("torchmetrics", tm)
    sys.modules.setdefault("torchmetrics.functional", tmf)
    sys.modules.setdefault("torchmetrics.functional.image", tmi)
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = None
    sys.modules["skimage.metrics"].structural_similarity = None
    sys.path.insert(0, REFERENCE)
    import model as ref_model

    return ref_model.LowLightEnhance


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cube", type=int, default=128, help="test cube H=W")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--data_max", type=float, default=4095.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="", help="optional JSON report path")
    ap.add_argument("--control", action="store_true",
                    help="also train OUR framework a second time from an "
                         "infinitesimally perturbed init (the chaos "
                         "yardstick: if control deltas ≈ cross-framework "
                         "deltas, divergence is float-chaos, not bias)")
    ap.add_argument("--perturb", type=float, default=1e-6)
    ap.add_argument("--controls", type=int, default=None,
                    help="with --control/--seeds: K independently-perturbed "
                         "control replicas per draw (envelope = worst of K; "
                         "each replica is a full re-train). Defaults: 1 for "
                         "a single --control run, 3 for a --seeds sweep")
    ap.add_argument("--seeds", type=int, default=1,
                    help=">1: statistical sweep — N independent (dataset, "
                         "torch-init) draws, each with a chaos control; "
                         "emits a distribution summary")
    ap.add_argument("--torch_seed", type=int, default=1,
                    help="reference-init seed (single-run mode; the sweep "
                         "derives one per draw)")
    args = ap.parse_args(argv)

    if args.patch >= args.cube:
        # randint(0, 0) deep in record_batch is the alternative failure mode.
        raise SystemExit(
            f"--patch {args.patch} must be smaller than --cube {args.cube}"
        )
    if not os.path.exists(os.path.join(REFERENCE, "model.py")):
        raise SystemExit("reference checkout not available at /root/reference")

    if args.seeds > 1:
        return run_sweep(args)
    return run_study(args, args.seed, args.torch_seed)


def run_sweep(args):
    """N independent draws of run_study (each with the chaos control) and a
    distribution summary over cross-framework vs own-chaos deltas."""
    runs = []
    for i in range(args.seeds):
        seed = args.seed + i
        print(f"\n===== sweep draw {i + 1}/{args.seeds} "
              f"(dataset seed {seed}, torch seed {seed}) =====")
        import copy

        a = copy.copy(args)
        a.control = True
        a.controls = args.controls if args.controls else 3
        a.out = ""
        runs.append(run_study(a, seed, torch_seed=seed))

    cross = [r["delta_psnr_db"] for r in runs]
    own = [r["control"]["delta_psnr_db"] for r in runs]
    cross_out = [r["trained_output_cross_psnr_db"] for r in runs]
    own_out = [r["control"]["cross_psnr_db"] for r in runs]
    per_seed = []
    for r in runs:
        inside = (r["delta_psnr_db"] <= r["control"]["delta_psnr_db"]
                  or r["delta_psnr_db"] <= r["budget"]["psnr_db"])
        per_seed.append({
            "seed": r["seed"],
            "cross_delta_psnr_db": r["delta_psnr_db"],
            "own_chaos_delta_psnr_db": r["control"]["delta_psnr_db"],
            "cross_delta_ssim": r["delta_ssim"],
            "own_chaos_delta_ssim": r["control"]["delta_ssim"],
            "trained_output_cross_psnr_db": r["trained_output_cross_psnr_db"],
            "own_chaos_output_cross_psnr_db": r["control"]["cross_psnr_db"],
            "inside_envelope": bool(inside),
        })
    # Rank test: under the null (cross-framework divergence ≡ float chaos),
    # the cross delta is one more draw from the same distribution as the K
    # controls, so it exceeds their max with probability 1/(K+1) per seed.
    # "All seeds inside" is therefore the WRONG acceptance criterion for
    # small K — the right one is whether the observed outside-count is
    # consistent with that rate (binomial tail) AND the pooled cross
    # distribution sits inside the pooled chaos distribution.
    from math import comb

    k_ctrl = runs[0]["control"]["n_controls"]
    p0 = 1.0 / (k_ctrl + 1)
    n_out = sum(not p["inside_envelope"] for p in per_seed)
    n = len(per_seed)
    binom_tail = sum(
        comb(n, j) * p0 ** j * (1 - p0) ** (n - j) for j in range(n_out, n + 1)
    )
    consistent = binom_tail > 0.05 and max(cross) <= max(own)
    summary = {
        "workload": runs[0]["workload"],
        "draws": args.seeds,
        "controls_per_draw": k_ctrl,
        "per_seed": per_seed,
        "cross_delta_psnr_db": {"min": min(cross), "max": max(cross),
                                "mean": float(np.mean(cross))},
        "own_chaos_delta_psnr_db": {"min": min(own), "max": max(own),
                                    "mean": float(np.mean(own))},
        "trained_output_cross_psnr_db": {"min": min(cross_out),
                                         "max": max(cross_out)},
        "own_chaos_output_cross_psnr_db": {"min": min(own_out),
                                           "max": max(own_out)},
        "all_inside_envelope": all(p["inside_envelope"] for p in per_seed),
        "rank_test": {
            "seeds_outside_envelope": n_out,
            "expected_outside_rate_under_null": p0,
            "binomial_tail_p": round(binom_tail, 4),
            "pooled_cross_max_inside_pooled_chaos_max": max(cross) <= max(own),
            "consistent_with_chaos": bool(consistent),
        },
    }
    print("\n===== sweep summary =====")
    print(json.dumps(summary, indent=2))
    verdict = ("CONSISTENT WITH FLOAT-CHAOS" if consistent
               else "EXCEEDS FLOAT-CHAOS")
    print(f"{verdict}: cross dPSNR [{min(cross):.3f}, {max(cross):.3f}] dB "
          f"(mean {np.mean(cross):.3f}) vs own-chaos "
          f"[{min(own):.3f}, {max(own):.3f}] dB (mean {np.mean(own):.3f}); "
          f"{n_out}/{n} seeds outside their K={k_ctrl} envelope "
          f"(null rate {p0:.2f}, binomial p={binom_tail:.2f})")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=2)
    return summary


def run_study(args, seed, torch_seed=1):
    rng = np.random.RandomState(seed)
    tmp = tempfile.mkdtemp(prefix="parity_ab_")
    for sub in ("low/train", "low/test", "high/test", "out_ref", "out_ours"):
        os.makedirs(os.path.join(tmp, sub), exist_ok=True)

    # --- dataset on disk (reference layout), loaded by each side's own loader
    for i in range(3):
        scene = make_scene(rng, args.cube, args.channels, args.data_max)
        sio.savemat(os.path.join(tmp, "low/train", f"t{i}.mat"),
                    {"data": darken(rng, scene, args.data_max, noise=8.0)})
    gt_scene = make_scene(rng, args.cube, args.channels, args.data_max)
    sio.savemat(os.path.join(tmp, "low/test", "e0.mat"),
                {"data": darken(rng, gt_scene, args.data_max, noise=8.0)})
    sio.savemat(os.path.join(tmp, "high/test", "e0.mat"),
                {"data": gt_scene.astype(np.float32)})

    gmin, gmax = 0.0, args.data_max

    # --- reference side: its own loader/normalization (utils.py:36-57)
    ref_cls = load_reference_model_cls()
    import utils as ref_utils

    torch.manual_seed(torch_seed)
    ref = ref_cls(input_channels=args.channels, lr=args.lr,
                  device=torch.device("cpu"))
    ref_train = [
        ref_utils.load_hsi(os.path.join(tmp, "low/train", f"t{i}.mat"),
                           normalization="global_normalization",
                           max_val=gmax, min_val=gmin)
        for i in range(3)
    ]
    ref_test = ref_utils.load_hsi(os.path.join(tmp, "low/test", "e0.mat"),
                                  normalization="global_normalization",
                                  max_val=gmax, min_val=gmin)

    # --- our side: our loader (must agree bit-for-bit; asserted below)
    from sshslie_tpu.config import Config
    from sshslie_tpu.interop import torch_state_dict_to_flax
    from sshslie_tpu.train import (
        TrainState, build_model, init_params, loss_coeffs, make_optimizer,
        make_train_step,
    )
    from sshslie_tpu.utils import io_hsi
    from sshslie_tpu import metrics as M

    our_train = [
        io_hsi.load_hsi(os.path.join(tmp, "low/train", f"t{i}.mat"),
                        normalization="global_normalization",
                        max_val=gmax, min_val=gmin)
        for i in range(3)
    ]
    our_test = io_hsi.load_hsi(os.path.join(tmp, "low/test", "e0.mat"),
                               normalization="global_normalization",
                               max_val=gmax, min_val=gmin)
    load_delta = max(
        float(np.abs(a - b).max()) for a, b in zip(ref_train + [ref_test],
                                                   our_train + [our_test])
    )

    params = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(ref.state_dict()))
    cfg = Config(channels=args.channels, patch_size=args.patch,
                 batch_size=args.batch, attention_impl="xla")
    model = build_model(cfg, args.channels)
    init_params(model, 0, 16)  # shape-checks the architecture only
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, loss_coeffs(cfg))

    # --- ONE recorded patch stream (reference crop+aug recipe, model.py:300-310)
    from sshslie_tpu.utils.augment import data_augmentation

    def record_batch():
        xs = []
        for _ in range(args.batch):
            cube = ref_train[rng.randint(len(ref_train))]
            h, w, _ = cube.shape
            y = rng.randint(0, h - args.patch)
            x = rng.randint(0, w - args.patch)
            patch = cube[y:y + args.patch, x:x + args.patch, :]
            xs.append(data_augmentation(patch, rng.randint(0, 8)))
        return np.stack(xs).astype(np.float32)

    batches = [record_batch() for _ in range(args.steps)]

    # --- train the reference (its inner-loop body, model.py:313-316)
    t0 = time.perf_counter()
    ref_losses = []
    for xb in batches:
        xt = torch.tensor(xb.transpose(0, 3, 1, 2))
        total, _ = ref.compute_loss(xt)
        ref.optimizer.zero_grad()
        total.backward()
        ref.optimizer.step()
        ref_losses.append(float(total.item()))
    t_ref = time.perf_counter() - t0

    # --- train ours on the identical stream
    def train_ours(init_params_tree):
        st = TrainState(params=init_params_tree,
                        opt_state=tx.init(init_params_tree),
                        step=jnp.zeros((), jnp.int32))
        losses = []
        lr = jnp.float32(args.lr)
        for xb in batches:
            st, terms = step(st, jnp.asarray(xb), lr)
            losses.append(float(terms["total_loss"]))
        return st, losses

    # The train step donates its input state (buffers are consumed), so any
    # derived init trees must be built BEFORE training starts. One control
    # draw is a single sample of the chaos distribution; ``--controls K``
    # trains K independently-perturbed replicas so the envelope is the max
    # over K draws, not one lucky/unlucky sample (VERDICT r2 weak #4).
    n_controls = (max(int(getattr(args, "controls", None) or 1), 1)
                  if args.control else 0)
    perturbed_inits = []
    for ci in range(n_controls):
        pk = jax.random.PRNGKey(99 + ci)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(pk, len(leaves))
        perturbed_inits.append(jax.tree.unflatten(treedef, [
            leaf + args.perturb * jax.random.uniform(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)
        ]))

    t0 = time.perf_counter()
    state, our_losses = train_ours(params)
    t_ours = time.perf_counter() - t0

    control_states = [train_ours(p)[0] for p in perturbed_inits]

    loss_rel = [abs(a - b) / max(abs(a), 1e-12)
                for a, b in zip(ref_losses, our_losses)]

    # --- reference test inference + denorm (model.py:363-372) + its save_hsi
    ref.eval()
    with torch.no_grad():
        xt = torch.from_numpy(ref_test).unsqueeze(0).permute(0, 3, 1, 2)
        S_ref = ref.forward(xt)[3].squeeze(0).permute(1, 2, 0).numpy()
    S_ref_dn = S_ref * (gmax - gmin) + gmin
    ref_utils.save_hsi(os.path.join(tmp, "out_ref", "e0.mat"), S_ref_dn)

    # --- our test inference + denorm + our save_hsi
    infer = jax.jit(lambda p, x: model.apply({"params": p}, x)[3])
    S_ours = np.asarray(infer(state.params, jnp.asarray(our_test)[None]))[0]
    S_ours_dn = S_ours * (gmax - gmin) + gmin
    io_hsi.save_hsi(os.path.join(tmp, "out_ours", "e0.mat"), S_ours_dn)

    S_ctrls = []
    for ci, cs in enumerate(control_states):
        d = os.path.join(tmp, f"out_ctrl{ci}")
        os.makedirs(d, exist_ok=True)
        S_ctrl = np.asarray(infer(cs.params, jnp.asarray(our_test)[None]))[0]
        S_ctrls.append(S_ctrl)
        io_hsi.save_hsi(os.path.join(d, "e0.mat"),
                        S_ctrl * (gmax - gmin) + gmin)

    # --- score both against GT with the same metric code (ours; torchmetrics
    # parity is pinned by tests/test_metrics.py)
    res = {}
    sides = [("reference", "out_ref"), ("ours", "out_ours")]
    for ci in range(len(control_states)):
        sides.append((f"ours_perturbed_control{ci}", f"out_ctrl{ci}"))
    for side, d in sides:
        p, s, a = M.calc_metrics(os.path.join(tmp, d, "*.mat"),
                                 os.path.join(tmp, "high/test"),
                                 data_max=gmax, verbose=False)
        res[side] = {"psnr": float(p), "ssim": float(s), "sam": float(a)}

    cross = float(M.psnr(jnp.asarray(S_ours), jnp.asarray(S_ref),
                         data_range=1.0))
    report = {
        "workload": f"steps{args.steps}_b{args.batch}_p{args.patch}"
                    f"_c{args.channels}_cube{args.cube}",
        "seed": seed,
        "torch_seed": torch_seed,
        "loader_max_abs_delta": load_delta,
        "metrics": res,
        "delta_psnr_db": abs(res["ours"]["psnr"] - res["reference"]["psnr"]),
        "delta_ssim": abs(res["ours"]["ssim"] - res["reference"]["ssim"]),
        "delta_sam": abs(res["ours"]["sam"] - res["reference"]["sam"]),
        "budget": {"psnr_db": 0.1, "ssim": 0.001},
        "trained_output_cross_psnr_db": cross,
        **({"control": {
            # envelope = worst over the K control draws
            "delta_psnr_db": max(
                abs(res[f"ours_perturbed_control{ci}"]["psnr"]
                    - res["ours"]["psnr"])
                for ci in range(len(control_states))),
            "delta_ssim": max(
                abs(res[f"ours_perturbed_control{ci}"]["ssim"]
                    - res["ours"]["ssim"])
                for ci in range(len(control_states))),
            # most-divergent control output (lowest cross-PSNR vs ours)
            "cross_psnr_db": min(
                float(M.psnr(jnp.asarray(S_ours), jnp.asarray(sc),
                             data_range=1.0))
                for sc in S_ctrls),
            "per_control_delta_psnr_db": [
                round(abs(res[f"ours_perturbed_control{ci}"]["psnr"]
                          - res["ours"]["psnr"]), 5)
                for ci in range(len(control_states))],
            "n_controls": len(control_states),
            "perturbation": args.perturb,
        }} if control_states else {}),
        "per_step_loss_rel_diff": {
            "max": max(loss_rel), "final": loss_rel[-1],
        },
        "final_loss": {"reference": ref_losses[-1], "ours": our_losses[-1]},
        "train_seconds": {"reference_torch_cpu": round(t_ref, 1),
                          "ours_jax_cpu": round(t_ours, 1)},
        "dataset_dir": tmp,
    }
    print(json.dumps(report, indent=2))
    ok = (report["delta_psnr_db"] <= 0.1 and report["delta_ssim"] <= 0.001)
    print(f"PARITY {'OK' if ok else 'EXCEEDED'}: "
          f"dPSNR={report['delta_psnr_db']:.4f} dB, "
          f"dSSIM={report['delta_ssim']:.5f}, dSAM={report['delta_sam']:.5f}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)
    return report


if __name__ == "__main__":
    main()
