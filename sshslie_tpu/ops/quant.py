"""Weight-only quantization for inference (int8 / fp8 / int4).

Net-new capability (no counterpart in the reference, which serves fp32 only).
Conv/dense kernels are quantized per-output-channel with symmetric scales and
dequantized *inside* the jitted forward, so the parameters live in HBM at 1/4
(int8/fp8) or 1/8 (int4 — packed two-per-``uint8`` byte) the bytes and
XLA fuses the convert+scale into the conv's operand read. For this model the
win is a capability/latency demo (params are <1 MB); the same code path is how
a large conv stack would cut its HBM footprint and weight-load bandwidth on
TPU.

Formats
  * ``int8``: q = round(w / s) ∈ [−127, 127], s = amax/127 per out-channel.
  * ``fp8``:  w/s cast to ``float8_e4m3fn`` (TPU-native 8-bit float),
    s = amax/448 per out-channel (448 = e4m3 max normal).
  * ``int4``: q = round(w / s) ∈ [−7, 7], s = amax/7 per out-channel,
    stored two-nibbles-per-``uint8`` byte (manual packing along the output
    axis, unpacked in-graph with two shifts XLA fuses into the dequant).
    8× weight compression; measured quality in tests /
    ``scripts/quant_report.py`` — lossier than int8 by construction
    (15 levels per channel), offered for the HBM-bound regime where weight
    bytes, not accuracy headroom, are the constraint. NOT ``jnp.int4``:
    an ``s4`` array as a jit operand crashes arg placement on the TPU
    relay backend (RecursionError in device_put, r5) — the uint8 packing
    is byte-identical in HBM and portable everywhere.

Calibration (changes ONLY the stored scales — the packed-int4/int8 runtime
path, checkpoints, and serving are untouched)
  * ``absmax``: s = amax/Qmax — zero clipping, maximum rounding step.
  * ``mse``: per-out-channel grid search over clip ratios r ∈ [0.30, 1.00];
    s = r·amax/Qmax chosen to minimize that channel's weight reconstruction
    MSE (clipping a few outliers shrinks the rounding step for everything
    else). Data-free, milliseconds. Measured CAVEAT on this model: weight
    MSE is the wrong objective here — it reduces weight error but *hurts*
    output PSNR (outlier weights are functionally load-bearing; numbers in
    docs/PERFORMANCE.md r5) — kept as the measured negative.
  * ``output`` (:func:`calibrate_quantize_tree`): greedy per-tensor clip
    search that minimizes the OUTPUT error of the whole quantized forward
    against fp32 on a handful of calibration cubes (the eval split). The
    search grid includes r = 1.0 (= absmax) and a candidate is kept only
    when it improves the calibration objective, so the result is ≥ absmax
    by construction on that set. quant_report uses it for int4 (serving's
    checkpoint-only path stays absmax — it has no calibration data).

Only the last axis is treated as the output-feature axis — true for Flax
Conv (kh, kw, cin, cout), ConvTranspose, and Dense (in, out) kernels.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_Q_KEY = "__quantized__"

_FORMATS = {
    "int8": {"max": 127.0},
    "fp8": {"max": 448.0},
    "int4": {"max": 7.0},
}


def _is_mapping(x: Any) -> bool:
    try:
        from flax.core import FrozenDict

        if isinstance(x, FrozenDict):
            return True
    except ImportError:
        pass
    return isinstance(x, dict)


# Clip-ratio grid for MSE calibration. 0.30 is far below any ratio the
# search ever picks on Gaussian-ish conv kernels (empirically ≥0.55 for
# int4, ≥0.9 for int8); 36 points ≈ 2% resolution, enough that the chosen
# scale's MSE is within noise of the continuous optimum.
_MSE_GRID = np.linspace(0.30, 1.00, 36)


def _mse_scale(w: jnp.ndarray, amax: jnp.ndarray, qmax: float) -> jnp.ndarray:
    """Per-out-channel scale minimizing weight reconstruction MSE.

    For each candidate clip ratio r, quantize with s = r·amax/qmax and
    measure sum((dq − w)²) per channel; keep the argmin. Eager, tiny
    (kernels here are <1 MB), runs once at quantize time."""
    reduce_axes = tuple(range(w.ndim - 1))
    best_err = None
    best_scale = None
    for r in _MSE_GRID:
        scale = amax * (float(r) / qmax)
        scale = jnp.where(scale > 0, scale, 1.0)
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax)
        err = jnp.sum(jnp.square(q * scale - w), axis=reduce_axes,
                      keepdims=True)
        if best_err is None:
            best_err, best_scale = err, scale
        else:
            pick = err < best_err
            best_err = jnp.where(pick, err, best_err)
            best_scale = jnp.where(pick, scale, best_scale)
    return best_scale


def _resolve_calibration(fmt: str, calibration: str) -> str:
    if calibration not in ("auto", "absmax", "mse"):
        raise ValueError(
            f"unknown calibration {calibration!r} (use auto|absmax|mse; "
            "'output' needs data — see calibrate_quantize_tree)")
    if calibration == "auto":
        # Data-free default is absmax: weight-MSE clipping measurably HURTS
        # output PSNR on this model (docs/PERFORMANCE.md r5). Output-aware
        # calibration needs cubes — quantization_impact resolves auto→output
        # for int4 when it has them.
        return "absmax"
    if calibration == "mse" and fmt == "fp8":
        # fp8 is a saturating cast with a per-value step, not a uniform
        # rounding grid — clip-ratio search has no lever there.
        return "absmax"
    return calibration


def _pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (int8 in [−7, 7]) two-per-byte along the last axis.

    Low nibble = even index, high nibble = odd; an odd last dim pads one
    zero nibble (the unpacker recovers the true size from the node's scale
    shape). uint8 so the dtype itself marks a packed node —
    :func:`dequantize_array` dispatches on it."""
    qu = jnp.asarray(q, jnp.int8).view(jnp.uint8) & 0xF
    if qu.shape[-1] % 2:
        qu = jnp.pad(qu, [(0, 0)] * (qu.ndim - 1) + [(0, 1)])
    return qu[..., 0::2] | (qu[..., 1::2] << 4)


def _unpack_int4(p: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_int4`; jit-traceable (two shifts + a sign
    extension XLA fuses into the consuming dequant multiply)."""
    lo = (p & 0xF).astype(jnp.int32)
    hi = (p >> 4).astype(jnp.int32)
    q = jnp.stack([(lo ^ 8) - 8, (hi ^ 8) - 8], axis=-1)
    return q.reshape(*p.shape[:-1], p.shape[-1] * 2)[..., :cout]


def quantize_array(
    w: jnp.ndarray, fmt: str = "int8", calibration: str = "auto"
) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric quantization of one kernel."""
    spec = _FORMATS[fmt]
    calibration = _resolve_calibration(fmt, calibration)
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    if calibration == "mse":
        scale = _mse_scale(w, amax, spec["max"])
    else:
        # Guard the SCALE, not amax: a tiny-but-positive amax (~2e-38) passes
        # amax > 0 while amax/max underflows to 0 — then w/scale = inf and the
        # fp8 cast emits NaN weights that poison every output pixel.
        scale = amax / spec["max"]
        scale = jnp.where(scale > 0, scale, 1.0)
    if fmt == "int8":
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    elif fmt == "int4":
        q = _pack_int4(jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8))
    else:
        q = (w / scale).astype(jnp.float8_e4m3fn)
    return {_Q_KEY: np.int8(1), "q": q, "scale": scale.astype(jnp.float32)}


def dequantize_array(node: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    q = node["q"]
    if q.dtype == jnp.uint8:  # packed int4; true cout lives in scale's shape
        q = _unpack_int4(q, node["scale"].shape[-1])
    return q.astype(jnp.float32) * node["scale"]


def _is_qnode(node: Any) -> bool:
    return _is_mapping(node) and _Q_KEY in node


def quantize_tree(
    params: Any, fmt: str = "int8", min_size: int = 64,
    calibration: str = "auto",
) -> Tuple[Any, Dict[str, int]]:
    """Quantize every kernel with ndim ≥ 2 and ≥ ``min_size`` elements.

    Returns (quantized tree, stats) where stats counts bytes before/after.
    Biases, scalars, and tiny tensors stay fp32 (their bytes are noise and
    their dynamic range matters). ``calibration``: ``auto`` (mse for int4,
    absmax otherwise), ``absmax``, or ``mse`` — see the module docstring.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown quantization format {fmt!r} (use {list(_FORMATS)})")
    _resolve_calibration(fmt, calibration)  # validate up front
    stats = {"bytes_fp32": 0, "bytes_quant": 0, "tensors_quantized": 0}

    def rec(node):
        if _is_mapping(node):
            return {k: rec(v) for k, v in node.items()}
        leaf = jnp.asarray(node)
        nbytes = leaf.size * 4
        stats["bytes_fp32"] += nbytes
        if leaf.ndim >= 2 and leaf.size >= min_size:
            qn = quantize_array(leaf, fmt, calibration)
            # Device bytes: literal stored-q bytes (uint8-packed int4 is two
            # values per byte; int8/fp8 one).
            stats["bytes_quant"] += int(qn["q"].size) + int(qn["scale"].size) * 4
            stats["tensors_quantized"] += 1
            return qn
        stats["bytes_quant"] += nbytes
        return leaf

    return rec(params), stats


# Output-aware calibration grid. Includes 1.0 (= absmax) so the greedy
# search can only improve on the uncalibrated baseline; 0.6 is below any
# ratio the search keeps on this model's kernels.
_OUTPUT_GRID = (1.0, 0.95, 0.90, 0.85, 0.80, 0.70, 0.60)


def _ratio_quantize(w: jnp.ndarray, fmt: str, ratio: float) -> Dict[str, jnp.ndarray]:
    """quantize_array with an explicit clip ratio: s = ratio·amax/Qmax."""
    spec = _FORMATS[fmt]
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = amax * (float(ratio) / spec["max"])
    scale = jnp.where(scale > 0, scale, 1.0)
    qmax = spec["max"]
    if fmt == "fp8":
        q = (w / scale).astype(jnp.float8_e4m3fn)
    else:
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
        if fmt == "int4":
            q = _pack_int4(q)
    return {_Q_KEY: np.int8(1), "q": q, "scale": scale.astype(jnp.float32)}


def _set_path(tree: Dict, path: Tuple[str, ...], value: Any) -> Dict:
    """Copy-on-write replace of tree[path]; shares all untouched subtrees."""
    if len(path) == 1:
        out = dict(tree)
        out[path[0]] = value
        return out
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def calibrate_quantize_tree(
    model,
    params: Any,
    cubes,
    fmt: str = "int4",
    min_size: int = 64,
    grid=_OUTPUT_GRID,
    verbose: bool = False,
) -> Tuple[Any, Dict[str, int], Dict[str, float]]:
    """Output-aware clip calibration: per-tensor greedy clip-ratio search
    minimizing the quantized forward's MSE against the fp32 forward on
    ``cubes`` (a handful of eval cubes is enough — the objective is model
    output error, not a task metric).

    Search: (1) best single global ratio over ``grid``; (2) one greedy
    coordinate pass over the quantized tensors, trying every grid ratio per
    tensor and keeping improvements. Both phases include the r = 1.0
    (absmax) candidate, so the result is never worse than uncalibrated on
    the calibration set. Cost: (1 + T)·|grid| jitted forwards of one
    compiled program (scales are operands, not constants).

    Returns ``(qparams, stats, ratios)`` where ``ratios`` maps
    '/'-joined tensor paths to their chosen clip ratio.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown quantization format {fmt!r} (use {list(_FORMATS)})")

    leaves: Dict[Tuple[str, ...], jnp.ndarray] = {}

    def collect(node, path):
        if _is_mapping(node):
            for k, v in node.items():
                collect(v, path + (k,))
            return
        leaf = jnp.asarray(node)
        if leaf.ndim >= 2 and leaf.size >= min_size:
            leaves[path] = leaf

    collect(params, ())

    fwd = jax.jit(lambda qp, x: model.apply({"params": dequantize_tree(qp)}, x))
    fp32_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    xs = [jnp.asarray(np.asarray(c, np.float32))[None, ...] for c in cubes]
    refs = [fp32_fn(params, x)[3] for x in xs]
    err_fn = jax.jit(lambda qp, x, ref: jnp.mean(jnp.square(
        fwd(qp, x)[3].astype(jnp.float32) - ref.astype(jnp.float32))))

    def build(ratios: Dict[Tuple[str, ...], float]):
        qtree, _ = quantize_tree(params, fmt, min_size, calibration="absmax")
        for path, r in ratios.items():
            if r != 1.0:
                qtree = _set_path(qtree, path, _ratio_quantize(leaves[path], fmt, r))
        return qtree

    def objective(qtree) -> float:
        return float(sum(float(err_fn(qtree, x, ref)) for x, ref in zip(xs, refs)))

    ratios = {path: 1.0 for path in leaves}
    qtree = build(ratios)
    best_err = objective(qtree)
    if verbose:
        print(f"calibrate[{fmt}]: absmax baseline MSE {best_err:.3e}")

    # Phase 1: best single global ratio.
    for r in grid:
        if r == 1.0:
            continue
        cand = {path: r for path in ratios}
        err = objective(build(cand))
        if err < best_err:
            best_err, ratios = err, cand
            if verbose:
                print(f"calibrate[{fmt}]: global ratio {r} -> MSE {err:.3e}")
    qtree = build(ratios)

    # Phase 2: one greedy coordinate pass (deterministic order).
    for path in sorted(leaves):
        base = ratios[path]
        for r in grid:
            if r == base:
                continue
            cand_node = _ratio_quantize(leaves[path], fmt, r)
            err = objective(_set_path(qtree, path, cand_node))
            if err < best_err:
                best_err, ratios = err, {**ratios, path: r}
                qtree = _set_path(qtree, path, cand_node)
        if verbose and ratios[path] != base:
            print(f"calibrate[{fmt}]: {'/'.join(path)} ratio {ratios[path]}")

    _, stats = quantize_tree(params, fmt, min_size, calibration="absmax")
    return qtree, stats, {"/".join(p): r for p, r in ratios.items()}


def dequantize_tree(qparams: Any) -> Any:
    """Inverse of :func:`quantize_tree`; jit-traceable (runs inside the
    quantized forward so stored weights stay 8-bit in HBM)."""

    def rec(node):
        if _is_qnode(node):
            return dequantize_array(node)
        if _is_mapping(node):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(qparams)


class QuantizedInferencer:
    """Jitted whole-cube forward over 8-bit weights (API-compatible with
    :class:`sshslie_tpu.evaluate.Inferencer`)."""

    def __init__(self, model, qparams, pad_multiple: int = 1):
        self.model = model
        self.qparams = jax.device_put(qparams)
        self.pad_multiple = max(int(pad_multiple), 1)
        self._fn = jax.jit(
            lambda qp, x: model.apply({"params": dequantize_tree(qp)}, x)
        )

    def __call__(self, qparams: Any, cube: np.ndarray):
        """API-compatible with Inferencer: pass None to use the instance's
        qparams, or an updated quantized tree (hot-reload without
        recompiling — the jitted fn is keyed on structure, not values)."""
        from sshslie_tpu.evaluate import pad_forward_crop

        m = self.pad_multiple
        return pad_forward_crop(
            self._fn, self.qparams if qparams is None else qparams, cube, m, m
        )


def quantization_impact(
    model, params, cubes, fmt: str = "int8", calibration: str = "auto",
    calib_cubes=None,
) -> Dict[str, Any]:
    """PSNR of the quantized model's output against the fp32 output, per cube.

    This is the honest quantization metric: it isolates the quantization
    error from the task metric (GT comparisons fold in model error too).

    ``calibration='output'`` (and ``'auto'`` for int4) runs the output-aware
    clip search on ``calib_cubes`` — pass held-out cubes there to keep the
    reported PSNR out-of-sample; defaults to ``cubes`` (the objective is
    model-output MSE, not a task metric, so in-sample bias is bounded by the
    grid's granularity, but a held-out split is the clean experiment).
    """
    from sshslie_tpu import metrics as M

    resolved = calibration
    if calibration == "auto" and fmt == "int4":
        resolved = "output"
    if resolved == "output":
        qparams, stats, _ = calibrate_quantize_tree(
            model, params, calib_cubes if calib_cubes is not None else cubes,
            fmt)
    else:
        resolved = _resolve_calibration(fmt, calibration)
        qparams, stats = quantize_tree(params, fmt, calibration=resolved)
    fp32_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    q_inf = QuantizedInferencer(model, qparams)
    psnrs = []
    for cube in cubes:
        x = jnp.asarray(cube)[None, ...]
        S_fp32 = fp32_fn(params, x)[3][0]
        S_q = q_inf(None, np.asarray(cube))[3]
        psnrs.append(float(M.psnr(S_q, S_fp32, data_range=1.0)))
    return {
        "fmt": fmt,
        "calibration": resolved,
        "psnr_vs_fp32": psnrs,
        "psnr_vs_fp32_avg": float(np.mean(psnrs)) if psnrs else float("nan"),
        "bytes_fp32": stats["bytes_fp32"],
        "bytes_quant": stats["bytes_quant"],
        "compression": stats["bytes_fp32"] / max(stats["bytes_quant"], 1),
        "tensors_quantized": stats["tensors_quantized"],
    }
