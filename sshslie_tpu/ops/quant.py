"""Weight-only quantization for inference (int8 / fp8 / int4).

Net-new capability (no counterpart in the reference, which serves fp32 only).
Conv/dense kernels are quantized per-output-channel with symmetric scales and
dequantized *inside* the jitted forward, so the parameters live in HBM at 1/4
(int8/fp8) or 1/8 (int4 — XLA stores ``s4`` packed two-per-byte) the bytes and
XLA fuses the convert+scale into the conv's operand read. For this model the
win is a capability/latency demo (params are <1 MB); the same code path is how
a large conv stack would cut its HBM footprint and weight-load bandwidth on
TPU.

Formats
  * ``int8``: q = round(w / s) ∈ [−127, 127], s = amax/127 per out-channel.
  * ``fp8``:  w/s cast to ``float8_e4m3fn`` (TPU-native 8-bit float),
    s = amax/448 per out-channel (448 = e4m3 max normal).
  * ``int4``: q = round(w / s) ∈ [−7, 7], s = amax/7 per out-channel,
    stored as ``jnp.int4`` (4-bit, device-packed). 8× weight compression;
    measured quality in tests / ``scripts/quant_report.py`` — lossier than
    int8 by construction (15 levels per channel), offered for the HBM-bound
    regime where weight bytes, not accuracy headroom, are the constraint.

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


def quantize_array(w: jnp.ndarray, fmt: str = "int8") -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric quantization of one kernel."""
    spec = _FORMATS[fmt]
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    # Guard the SCALE, not amax: a tiny-but-positive amax (~2e-38) passes
    # amax > 0 while amax/max underflows to 0 — then w/scale = inf and the
    # fp8 cast emits NaN weights that poison every output pixel.
    scale = amax / spec["max"]
    scale = jnp.where(scale > 0, scale, 1.0)
    if fmt == "int8":
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    elif fmt == "int4":
        q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int4)
    else:
        q = (w / scale).astype(jnp.float8_e4m3fn)
    return {_Q_KEY: np.int8(1), "q": q, "scale": scale.astype(jnp.float32)}


def dequantize_array(node: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return node["q"].astype(jnp.float32) * node["scale"]


def _is_qnode(node: Any) -> bool:
    return _is_mapping(node) and _Q_KEY in node


def quantize_tree(
    params: Any, fmt: str = "int8", min_size: int = 64
) -> Tuple[Any, Dict[str, int]]:
    """Quantize every kernel with ndim ≥ 2 and ≥ ``min_size`` elements.

    Returns (quantized tree, stats) where stats counts bytes before/after.
    Biases, scalars, and tiny tensors stay fp32 (their bytes are noise and
    their dynamic range matters).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unknown quantization format {fmt!r} (use {list(_FORMATS)})")
    stats = {"bytes_fp32": 0, "bytes_quant": 0, "tensors_quantized": 0}

    def rec(node):
        if _is_mapping(node):
            return {k: rec(v) for k, v in node.items()}
        leaf = jnp.asarray(node)
        nbytes = leaf.size * 4
        stats["bytes_fp32"] += nbytes
        if leaf.ndim >= 2 and leaf.size >= min_size:
            qn = quantize_array(leaf, fmt)
            # Device bytes: int4 packs two values per byte (XLA s4 storage).
            qbytes = (leaf.size + 1) // 2 if fmt == "int4" else leaf.size
            stats["bytes_quant"] += qbytes + int(qn["scale"].size) * 4
            stats["tensors_quantized"] += 1
            return qn
        stats["bytes_quant"] += nbytes
        return leaf

    return rec(params), stats


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
    model, params, cubes, fmt: str = "int8"
) -> Dict[str, Any]:
    """PSNR of the quantized model's output against the fp32 output, per cube.

    This is the honest quantization metric: it isolates the quantization
    error from the task metric (GT comparisons fold in model error too).
    """
    from sshslie_tpu import metrics as M

    qparams, stats = quantize_tree(params, fmt)
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
        "psnr_vs_fp32": psnrs,
        "psnr_vs_fp32_avg": float(np.mean(psnrs)) if psnrs else float("nan"),
        "bytes_fp32": stats["bytes_fp32"],
        "bytes_quant": stats["bytes_quant"],
        "compression": stats["bytes_fp32"] / max(stats["bytes_quant"], 1),
        "tensors_quantized": stats["tensors_quantized"],
    }
