"""Adversarial tests for the serving wire surface (VERDICT r4 #6).

serve.py decodes client-supplied ``X-Cube-*`` headers, raw bodies, and zlib
streams on an unauthenticated endpoint. Every hostile case here must produce
a **bounded 4xx** — never a 5xx, a hang, or a multi-GB allocation — and the
server must keep serving valid requests afterwards. Caps under test:
``_MAX_BODY_BYTES`` (request bodies and declared binary cube shapes) and the
shape-derived deflate inflation bound in ``decode_cube_response``.
"""

import http.client
import io
import json
import zlib

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.config import Config
from sshslie_tpu.serve import EnhanceServer, EnhanceService, decode_cube_response

CHANNELS = 6


@pytest.fixture(scope="module")
def server():
    cfg = Config(
        channels=CHANNELS, patch_size=16, global_min=0.0, global_max=4095.0,
        attention_impl="xla", serve_pad_multiple=16,
    ).finalize()
    srv = EnhanceServer(EnhanceService(cfg, CHANNELS), port=0).start()
    yield srv
    srv.shutdown()


def _post(server, body, headers=None, query="", timeout=30):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=timeout)
    try:
        conn.request("POST", "/enhance" + query, body=body,
                     headers=headers or {})
        resp = conn.getresponse()
        data = resp.read()
    finally:
        conn.close()
    return resp.status, data


def _err(data):
    return json.loads(data).get("error", "")


def _errors_total(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("GET", "/metrics")
    text = conn.getresponse().read().decode()
    conn.close()
    for line in text.splitlines():
        if line.startswith("sshslie_request_errors_total"):
            return int(float(line.split()[-1]))
    raise AssertionError("errors counter missing from /metrics")


# -- dimension bombs ----------------------------------------------------------

def test_dimension_bomb_rejected_before_allocation(server):
    """A declared 100000×100000×224 f32 cube (~8.9 TB) with a tiny body must
    400 on the declared size, allocating nothing."""
    status, data = _post(server, b"\x00" * 64, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": "100000x100000x224",
    })
    assert status == 400
    assert "body cap" in _err(data)


def test_bignum_shape_is_400_not_overflowerror(server):
    """Shape dims past C ssize_t must not reach numpy (OverflowError → 500)."""
    status, data = _post(server, b"\x00" * 64, {
        "X-Cube-Encoding": "u16",
        "X-Cube-Shape": "999999999999999999999999x2x3",
        "X-Cube-Scale": "1.0", "X-Cube-Offset": "0.0",
    })
    assert status == 400
    assert "body cap" in _err(data)


@pytest.mark.parametrize("shape", ["0x8x6", "-1x8x6", "8x8", "8x8x6x1",
                                   "axbxc", "", "8x8x", "1e3x8x6"])
def test_malformed_shapes(server, shape):
    status, _ = _post(server, b"\x00" * 16, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": shape,
    })
    assert status == 400, shape


def test_missing_shape_header(server):
    status, data = _post(server, b"\x00" * 16, {"X-Cube-Encoding": "f32"})
    assert status == 400
    assert "X-Cube-Shape" in _err(data)


# -- truncated / oversized / misaligned bodies -------------------------------

def test_truncated_binary_body(server):
    """Half the bytes the shape demands → 400 (reshape mismatch), not 5xx."""
    n = 8 * 8 * CHANNELS * 4 // 2
    status, _ = _post(server, b"\x00" * n, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
    })
    assert status == 400


def test_oversized_binary_body(server):
    n = 8 * 8 * CHANNELS * 4 * 2
    status, _ = _post(server, b"\x00" * n, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
    })
    assert status == 400


def test_misaligned_body_not_multiple_of_itemsize(server):
    status, _ = _post(server, b"\x00" * (8 * 8 * CHANNELS * 4 + 3), {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
    })
    assert status == 400


# -- u16 scale/offset hostility -----------------------------------------------

@pytest.mark.parametrize("scale,offset", [
    ("inf", "0.0"), ("nan", "0.0"), ("1e999", "0.0"),
    ("1.0", "-inf"), ("abc", "0.0"), ("1.0", "0,5"),
])
def test_nonfinite_or_garbage_u16_scales(server, scale, offset):
    body = np.zeros((4, 4, CHANNELS), "<u2").tobytes()
    status, data = _post(server, body, {
        "X-Cube-Encoding": "u16", "X-Cube-Shape": f"4x4x{CHANNELS}",
        "X-Cube-Scale": scale, "X-Cube-Offset": offset,
    })
    assert status == 400, (scale, offset)
    assert "X-Cube-Scale" in _err(data)


def test_u16_missing_scale_headers(server):
    body = np.zeros((4, 4, CHANNELS), "<u2").tobytes()
    status, _ = _post(server, body, {
        "X-Cube-Encoding": "u16", "X-Cube-Shape": f"4x4x{CHANNELS}",
    })
    assert status == 400


# -- deflate bombs ------------------------------------------------------------

def test_zlib_bomb_bounded_by_declared_shape(server):
    """16 MB of zeros deflates to ~16 KB; declared as an 8×8×C cube it must
    stop inflating at the declared byte bound + 1, then 400."""
    bomb = zlib.compress(b"\x00" * (16 << 20), 9)
    assert len(bomb) < 128 << 10
    status, data = _post(server, bomb, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
        "Content-Encoding": "deflate",
    })
    assert status == 400
    assert "bound" in _err(data)


def test_deflate_garbage_stream(server):
    status, data = _post(server, b"not-deflate-data" * 4, {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
        "Content-Encoding": "deflate",
    })
    assert status == 400
    assert "decompress" in _err(data)


def test_deflate_truncated_stream(server):
    full = zlib.compress(np.zeros((8, 8, CHANNELS), "<f4").tobytes(), 1)
    status, data = _post(server, full[: len(full) // 2], {
        "X-Cube-Encoding": "f32", "X-Cube-Shape": f"8x8x{CHANNELS}",
        "Content-Encoding": "deflate",
    })
    assert status == 400
    assert "truncated" in _err(data) or "decompress" in _err(data)


# -- hostile .mat containers ----------------------------------------------------

def test_garbage_mat_body(server):
    status, data = _post(server, b"A" * 4096)
    assert status == 400
    assert ".mat" in _err(data)


def test_fake_hdf5_magic_body(server):
    """HDF5 signature + junk: the v7.3 reader must fail as a 400."""
    status, data = _post(server, b"\x89HDF\r\n\x1a\n" + b"junk" * 1024)
    assert status == 400
    assert "v7.3" in _err(data)


def test_mat_with_char_variable(server):
    buf = io.BytesIO()
    sio.savemat(buf, {"data": "not a cube"})
    status, _ = _post(server, buf.getvalue())
    assert status == 400


def test_mat_with_wrong_rank(server):
    buf = io.BytesIO()
    sio.savemat(buf, {"data": np.zeros((8, 8), np.float32)})
    status, data = _post(server, buf.getvalue())
    assert status == 400
    assert "expected (H, W" in _err(data)


def test_mat_wrong_channels(server):
    buf = io.BytesIO()
    sio.savemat(buf, {"data": np.zeros((8, 8, CHANNELS + 3), np.float32)})
    status, _ = _post(server, buf.getvalue())
    assert status == 400


# -- Content-Length hostility ---------------------------------------------------

def test_content_length_past_cap_is_413_before_read(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    try:
        conn.putrequest("POST", "/enhance")
        conn.putheader("Content-Length", str(64 << 30))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
    finally:
        conn.close()


def test_content_length_garbage(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    try:
        conn.putrequest("POST", "/enhance")
        conn.putheader("Content-Length", "zebra")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        conn.close()


def test_content_length_negative(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    try:
        conn.putrequest("POST", "/enhance")
        conn.putheader("Content-Length", "-5")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        conn.close()


# -- unit-level decoder checks ----------------------------------------------------

def test_decode_rejects_unknown_encoding_header():
    with pytest.raises(ValueError):
        decode_cube_response(b"", {"X-Cube-Encoding": "pickle"})


def test_decode_u16_f32_affine_accuracy():
    """The f32 in-place affine (allocation cap) stays far inside the u16
    quantization error."""
    rng = np.random.RandomState(0)
    cube = (rng.rand(16, 16, 4) * 4000).astype(np.float32)
    from sshslie_tpu.serve import encode_cube

    blob, headers = encode_cube(cube, "u16")
    back = decode_cube_response(blob, headers)
    step = (cube.max() - cube.min()) / 65535.0
    assert np.max(np.abs(back - cube)) <= step


# -- the server must still be alive and counting ------------------------------

def test_server_survives_hostility_and_counts_errors(server):
    errors = _errors_total(server)
    assert errors >= 15  # every hostile case above bumped the counter
    rng = np.random.RandomState(2)
    buf = io.BytesIO()
    sio.savemat(buf, {"data": (rng.rand(8, 8, CHANNELS) * 100).astype(np.float32)})
    status, data = _post(server, buf.getvalue(), timeout=120)
    assert status == 200
    out = decode_cube_response(
        data, {"X-Cube-Encoding": "mat"}, mat_key="data")
    assert out.shape == (8, 8, CHANNELS)
