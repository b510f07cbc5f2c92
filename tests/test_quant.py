"""Weight-only quantization: round-trip error bounds, tree structure, and
end-to-end PSNR of the quantized forward against fp32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sshslie_tpu.config import Config
from sshslie_tpu.ops.quant import (
    QuantizedInferencer,
    dequantize_array,
    dequantize_tree,
    quantization_impact,
    quantize_array,
    quantize_tree,
)
from sshslie_tpu.train import build_model, init_params


def test_quantize_array_roundtrip_bound(rng):
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    node = quantize_array(jnp.asarray(w), "int8")
    back = np.asarray(dequantize_array(node))
    # per-out-channel symmetric int8: |err| ≤ scale/2 = amax/254
    amax = np.abs(w).max(axis=(0, 1, 2))
    assert np.all(np.abs(back - w) <= amax / 254 + 1e-7)
    assert node["q"].dtype == jnp.int8
    assert node["scale"].shape == (1, 1, 1, 16)


def test_quantize_array_fp8(rng):
    w = rng.randn(4, 8).astype(np.float32)
    node = quantize_array(jnp.asarray(w), "fp8")
    assert node["q"].dtype == jnp.float8_e4m3fn
    back = np.asarray(dequantize_array(node))
    # e4m3 keeps ~2-3 significant bits of mantissa near max scale
    assert np.abs(back - w).max() <= np.abs(w).max() * 0.07


def test_quantize_array_int4_roundtrip_bound(rng):
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    node = quantize_array(jnp.asarray(w), "int4")
    # Manual two-nibbles-per-uint8 packing (s4 jit operands crash arg
    # placement on the TPU relay backend — quant.py module docstring, r5).
    assert node["q"].dtype == jnp.uint8
    assert node["q"].shape == (3, 3, 8, 8)
    back = np.asarray(dequantize_array(node))
    # per-out-channel symmetric int4: |err| ≤ scale/2 = amax/14
    amax = np.abs(w).max(axis=(0, 1, 2))
    assert np.all(np.abs(back - w) <= amax / 14 + 1e-7)
    assert node["scale"].shape == (1, 1, 1, 16)


def test_pack_int4_odd_and_negatives():
    from sshslie_tpu.ops.quant import _pack_int4, _unpack_int4

    q = jnp.asarray(np.arange(-7, 8, dtype=np.int8).reshape(3, 5))
    p = _pack_int4(q)
    assert p.dtype == jnp.uint8 and p.shape == (3, 3)  # 5 -> pad to 6 -> 3
    np.testing.assert_array_equal(np.asarray(_unpack_int4(p, 5)),
                                  np.asarray(q, np.int32))


def test_quantize_tree_int4_byte_accounting():
    params = {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}}
    _, stats = quantize_tree(params, "int4", min_size=64)
    n = 3 * 3 * 4 * 8
    # packed int4 (uint8 nibbles): two values per byte, plus the fp32 per-out-channel scales
    assert stats["bytes_quant"] == (n + 1) // 2 + 8 * 4
    assert stats["bytes_fp32"] == n * 4


def test_quantize_zero_channel(rng):
    w = np.zeros((3, 3, 2, 4), np.float32)
    node = quantize_array(jnp.asarray(w), "int8")
    np.testing.assert_array_equal(np.asarray(dequantize_array(node)), w)


def test_quantize_tree_structure_and_stats():
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones((8,))},
        "dense": {"kernel": jnp.ones((16, 4))},
    }
    qtree, stats = quantize_tree(params, "int8", min_size=64)
    assert "__quantized__" in qtree["conv"]["kernel"]
    # bias too small/1-D → untouched
    assert isinstance(qtree["conv"]["bias"], jnp.ndarray)
    # dense kernel 64 elements → quantized
    assert "__quantized__" in qtree["dense"]["kernel"]
    assert stats["tensors_quantized"] == 2
    assert stats["bytes_quant"] < stats["bytes_fp32"]
    back = dequantize_tree(qtree)
    np.testing.assert_allclose(np.asarray(back["conv"]["kernel"]),
                               np.ones((3, 3, 4, 8)), rtol=1e-6)


def test_quantize_tree_unknown_format():
    with pytest.raises(ValueError):
        quantize_tree({"k": jnp.ones((8, 8))}, "int2")


@pytest.fixture(scope="module")
def small_model():
    cfg = Config(channels=6, patch_size=16, attention_impl="xla")
    model = build_model(cfg, 6)
    params = init_params(model, 0, 16)
    return model, params


def test_quantized_inference_close_to_fp32(small_model, rng):
    model, params = small_model
    cubes = [(rng.rand(24, 24, 6) * 0.8).astype(np.float32) for _ in range(2)]
    report = quantization_impact(model, params, cubes, "int8")
    assert report["tensors_quantized"] > 10
    assert report["compression"] > 3.0
    # int8 weight-only on a sigmoid-bounded model: near-lossless output
    assert report["psnr_vs_fp32_avg"] > 35.0, report


def test_quantized_inference_int4(small_model, rng):
    model, params = small_model
    cubes = [(rng.rand(24, 24, 6) * 0.8).astype(np.float32) for _ in range(2)]
    report = quantization_impact(model, params, cubes, "int4")
    assert report["tensors_quantized"] > 10
    # packed int4 → close to 8× on the kernel bytes (scales + fp32 biases eat in)
    assert report["compression"] > 5.0
    # 15 quantization levels per channel: measurably lossy but usable
    assert report["psnr_vs_fp32_avg"] > 25.0, report


def test_quantized_inferencer_pads(small_model, rng):
    model, params = small_model
    qparams, _ = quantize_tree(params)
    inf = QuantizedInferencer(model, qparams, pad_multiple=16)
    cube = (rng.rand(20, 22, 6)).astype(np.float32)
    R, I, Id, S = inf(None, cube)
    assert S.shape == cube.shape
    assert I.shape == (20, 22, 1)


def test_quant_report_cli(tmp_path, small_model, rng):
    import scipy.io as sio

    from sshslie_tpu import checkpoints
    from sshslie_tpu.train import make_optimizer

    model, params = small_model
    tx = make_optimizer()
    ckpt = checkpoints.save_checkpoint(
        str(tmp_path / "m.ckpt"), params, tx.init(params), epoch=1
    )
    data_dir = tmp_path / "cubes"
    data_dir.mkdir()
    sio.savemat(data_dir / "a.mat",
                {"data": (rng.rand(24, 24, 6) * 4000).astype(np.float32)})

    import json
    import sys
    sys.path.insert(0, "scripts")
    import quant_report

    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        quant_report.main([
            "--checkpoint", ckpt, "--data", str(data_dir), "--channels", "6",
            "--fmt", "int8",
        ])
    out = json.loads(buf.getvalue())
    assert out["files"] == ["a.mat"]
    assert out["int8"]["psnr_vs_fp32_avg"] > 30.0


def test_mse_calibration_reduces_weight_error(rng):
    """Weight-space MSE calibration must never increase per-tensor weight
    reconstruction error (its grid includes the absmax point r=1.0)."""
    from sshslie_tpu.ops.quant import dequantize_array

    w = (rng.randn(3, 3, 8, 16) * (1 + 4 * (rng.rand(3, 3, 8, 16) > 0.99))
         ).astype(np.float32)  # heavy-tailed: outliers make clipping pay
    w_j = jnp.asarray(w)
    err_absmax = float(jnp.sum(jnp.square(
        dequantize_array(quantize_array(w_j, "int4", "absmax")) - w_j)))
    err_mse = float(jnp.sum(jnp.square(
        dequantize_array(quantize_array(w_j, "int4", "mse")) - w_j)))
    assert err_mse <= err_absmax
    assert err_mse < 0.9 * err_absmax  # outliers present → real reduction


def test_output_calibration_never_worse(small_model, rng):
    """Output-aware calibration's grid includes absmax and keeps only
    improvements, so calibrated int4 output PSNR >= absmax PSNR."""
    model, params = small_model
    cubes = [(rng.rand(24, 24, 6) * 0.8).astype(np.float32) for _ in range(2)]
    base = quantization_impact(model, params, cubes, "int4",
                               calibration="absmax")
    cal = quantization_impact(model, params, cubes, "int4",
                              calibration="output")
    assert cal["calibration"] == "output"
    assert cal["psnr_vs_fp32_avg"] >= base["psnr_vs_fp32_avg"] - 1e-6
    # auto resolves to output for int4 (and to absmax for int8)
    auto8 = quantization_impact(model, params, cubes, "int8")
    assert auto8["calibration"] == "absmax"


def test_calibrate_quantize_tree_ratios(small_model, rng):
    from sshslie_tpu.ops.quant import calibrate_quantize_tree

    model, params = small_model
    cubes = [(rng.rand(24, 24, 6) * 0.8).astype(np.float32)]
    qtree, stats, ratios = calibrate_quantize_tree(model, params, cubes, "int4")
    assert stats["tensors_quantized"] == len(ratios) > 10
    assert all(0.5 <= r <= 1.0 for r in ratios.values())
    # the calibrated tree still round-trips through the normal dequant path
    back = dequantize_tree(qtree)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x, dict(params)))


def test_quantize_unknown_calibration():
    with pytest.raises(ValueError):
        quantize_array(jnp.ones((8, 8)), "int4", "percentile")


def test_quantize_denormal_amax_stays_finite():
    """A tiny-but-positive channel amax must not underflow the scale to 0 —
    w/scale would be inf and the fp8 cast emits NaN weights that poison
    every output (int8 silently zeroed the tensor)."""
    from sshslie_tpu.ops.quant import dequantize_array, quantize_array

    w = jnp.full((3, 4), 2e-38, jnp.float32)
    for fmt in ("int8", "fp8"):
        node = quantize_array(w, fmt)
        assert bool(jnp.all(jnp.isfinite(node["scale"])))
        assert bool(jnp.all(jnp.isfinite(dequantize_array(node))))
