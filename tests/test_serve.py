"""Serving path: EnhanceService math, shape buckets, and the HTTP surface."""

import http.client
import sys
import io
import json

import numpy as np
import pytest
import scipy.io as sio

from sshslie_tpu.config import Config
from sshslie_tpu.serve import EnhanceServer, EnhanceService, parse_warmup


CHANNELS = 6


@pytest.fixture(scope="module")
def service():
    cfg = Config(
        channels=CHANNELS, patch_size=16, global_min=0.0, global_max=4095.0,
        attention_impl="xla", serve_pad_multiple=16,
    ).finalize()
    return EnhanceService(cfg, CHANNELS)


@pytest.fixture(scope="module")
def server(service):
    srv = EnhanceServer(service, port=0).start()
    yield srv
    srv.shutdown()


def _post_mat(server, cube, query="", key="data"):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=60)
    buf = io.BytesIO()
    sio.savemat(buf, {key: cube})
    conn.request("POST", "/enhance" + query, body=buf.getvalue())
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp, body


def test_enhance_matches_batch_path_math(service):
    rng = np.random.RandomState(0)
    cube = (rng.rand(20, 24, CHANNELS) * 4000).astype(np.float32)
    out = service.enhance(cube)
    S = out["S"]
    assert S.shape == cube.shape
    # Denormalization applied: outputs are back on the raw data scale.
    assert S.max() > 1.5
    assert out["seconds"] > 0


def test_shape_buckets_shared(service):
    rng = np.random.RandomState(1)
    before = len(service.stats()["buckets"])
    # 17x18 and 20x24 both pad to the (32, 32)-free (16-multiple) buckets:
    # 17→32, 18→32 vs 20→32, 24→32 — same bucket, one compile.
    service.enhance((rng.rand(17, 18, CHANNELS) * 100).astype(np.float32))
    service.enhance((rng.rand(20, 24, CHANNELS) * 100).astype(np.float32))
    stats = service.stats()
    assert (32, 32) in [tuple(b) for b in stats["buckets"]]
    assert len(stats["buckets"]) <= before + 1


def test_enhance_rejects_wrong_channels(service):
    with pytest.raises(ValueError):
        service.enhance(np.zeros((8, 8, CHANNELS + 1), np.float32))


def test_warmup_precompiles(service):
    service.warmup([(40, 40)])
    assert (48, 48) in [tuple(b) for b in service.stats()["buckets"]]


def test_parse_warmup():
    assert parse_warmup("512x512, 1024X768,") == [(512, 512), (1024, 768)]
    assert parse_warmup("") == []


def test_http_health(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert payload["status"] == "ok"
    assert payload["channels"] == CHANNELS


def test_http_enhance_roundtrip(server, service):
    rng = np.random.RandomState(2)
    cube = (rng.rand(18, 18, CHANNELS) * 4000).astype(np.float32)
    resp, body = _post_mat(server, cube)
    assert resp.status == 200
    assert float(resp.headers["X-Inference-Seconds"]) > 0
    mat = sio.loadmat(io.BytesIO(body))
    S_http = np.asarray(mat["data"])
    S_direct = service.enhance(cube)["S"]
    np.testing.assert_allclose(S_http, S_direct, rtol=1e-5, atol=1e-5)


def test_http_enhance_artifacts(server):
    rng = np.random.RandomState(3)
    cube = (rng.rand(16, 16, CHANNELS) * 100).astype(np.float32)
    resp, body = _post_mat(server, cube, query="?artifacts=1")
    assert resp.status == 200
    mat = sio.loadmat(io.BytesIO(body))
    assert {"data", "R_low", "I_low", "I_delta"} <= set(mat)
    assert mat["R_low"].shape == cube.shape
    assert mat["I_delta"].shape == (16, 16, 1)


def test_http_custom_key(server):
    rng = np.random.RandomState(4)
    cube = (rng.rand(16, 16, CHANNELS) * 100).astype(np.float32)
    resp, _ = _post_mat(server, cube, query="?key=ref", key="ref")
    assert resp.status == 200


def test_http_bad_requests(server):
    # wrong variable name → 400 with a helpful message
    rng = np.random.RandomState(5)
    cube = (rng.rand(8, 8, CHANNELS)).astype(np.float32)
    resp, body = _post_mat(server, cube, key="wrong")
    assert resp.status == 400
    assert "not found" in json.loads(body)["error"]
    # empty body → 400
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("POST", "/enhance", body=b"")
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()
    # malformed Content-Length → 400, not a reset connection
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.putrequest("POST", "/enhance")
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    assert "Content-Length" in json.loads(resp.read())["error"]
    conn.close()
    # unknown path → 404
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("GET", "/nope")
    resp = conn.getresponse()
    assert resp.status == 404
    conn.close()


def test_stats_accumulate(server):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("GET", "/stats")
    payload = json.loads(conn.getresponse().read())
    conn.close()
    assert payload["requests"] >= 4
    assert payload["avg_seconds"] > 0


def test_metrics_text_histogram_contract(service):
    """metrics_text follows the Prometheus exposition rules: cumulative
    monotone buckets, +Inf == count, sum/count consistent with /stats."""
    txt = service.metrics_text()
    lines = [l for l in txt.splitlines() if not l.startswith("#")]
    vals = {}
    cum = []
    for l in lines:
        name, v = l.rsplit(" ", 1)
        if name.startswith("sshslie_inference_seconds_bucket"):
            cum.append(float(v))
        else:
            vals[name] = float(v)
    n = service.stats()["requests"]
    assert vals["sshslie_requests_total"] == n
    assert vals["sshslie_inference_seconds_count"] == n
    assert cum == sorted(cum)           # cumulative histogram is monotone
    assert cum[-1] == n                 # +Inf bucket counts everything
    assert vals["sshslie_inference_seconds_sum"] == pytest.approx(
        service.stats()["avg_seconds"] * n)
    assert vals["sshslie_compiled_buckets"] == len(service.stats()["buckets"])


def test_metrics_endpoint_and_error_counter(server, service):
    """GET /metrics serves the exposition; 4xx responses bump the error
    counter through the single _json choke point."""
    def scrape():
        conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        body = resp.read().decode()
        ctype = resp.getheader("Content-Type")
        conn.close()
        return resp.status, ctype, body

    status, ctype, body = scrape()
    assert status == 200
    assert ctype.startswith("text/plain")
    before = float(
        [l for l in body.splitlines()
         if l.startswith("sshslie_request_errors_total ")][0].split()[-1])
    # provoke a 400 (unknown encoding) and a 404
    rng = np.random.RandomState(3)
    cube = (rng.rand(8, 8, CHANNELS) * 100).astype(np.float32)
    resp, _ = _post_mat(server, cube, query="?encoding=nope")
    assert resp.status == 400
    conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
    conn.request("GET", "/bogus")
    assert conn.getresponse().status == 404
    conn.close()
    _, _, body = scrape()
    after = float(
        [l for l in body.splitlines()
         if l.startswith("sshslie_request_errors_total ")][0].split()[-1])
    assert after >= before + 2


class TestMicroBatching:
    @pytest.fixture(scope="class")
    def batched_service(self):
        cfg = Config(
            channels=CHANNELS, patch_size=16, global_min=0.0, global_max=4095.0,
            attention_impl="xla", serve_pad_multiple=16,
            serve_max_batch=4, serve_batch_window_ms=50.0,
        ).finalize()
        return EnhanceService(cfg, CHANNELS)

    def test_concurrent_requests_coalesce_and_match_single(self, batched_service):
        import concurrent.futures as cf

        rng = np.random.RandomState(9)
        cubes = [(rng.rand(16, 16, CHANNELS) * 4000).astype(np.float32)
                 for _ in range(4)]
        # Warm the compile so the window isn't consumed by compilation skew.
        batched_service.enhance(cubes[0])
        with cf.ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(lambda c: batched_service.enhance(c)["S"], cubes))

        # reference: a plain (non-batched) service with identical params
        plain_cfg = Config(
            channels=CHANNELS, patch_size=16, global_min=0.0, global_max=4095.0,
            attention_impl="xla", serve_pad_multiple=16,
        ).finalize()
        plain = EnhanceService(plain_cfg, CHANNELS,
                               params=batched_service.params)
        for cube, got in zip(cubes, outs):
            want = plain.enhance(cube)["S"]
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

        stats = batched_service.stats()
        assert stats["batched_runs"] >= 1
        assert stats["max_batch_seen"] >= 2, stats  # coalescing happened

    def test_metrics_include_batcher_series(self, batched_service):
        txt = batched_service.metrics_text()
        assert "sshslie_batched_runs_total" in txt
        assert "sshslie_max_batch_seen" in txt

    def test_batcher_pow2_padding(self):
        from sshslie_tpu.serve import _round_up_pow2

        assert _round_up_pow2(1, 8) == 1
        assert _round_up_pow2(3, 8) == 4
        assert _round_up_pow2(5, 4) == 4

    def test_batcher_propagates_errors(self, batched_service):
        with pytest.raises(ValueError):
            batched_service.enhance(np.zeros((8, 8, CHANNELS + 2), np.float32))

    def test_batcher_submit_after_close_fails_fast(self):
        from sshslie_tpu.serve import _MicroBatcher

        b = _MicroBatcher(lambda xs: xs, max_batch=2, window_ms=1.0)
        b.close()
        fut = b.submit((8, 8), np.zeros((8, 8, 1), np.float32))
        # Must not hang: the loop thread has exited, so the future must
        # already carry the failure.
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=1)


def test_reload_hot_swaps_params(tmp_path):
    """service.reload swaps params in place: same buckets, new weights.
    Uses its own service — reload mutates state, and the module fixture is
    shared with the HTTP tests."""
    import jax
    import jax.numpy as jnp

    from sshslie_tpu import checkpoints
    from sshslie_tpu.train import make_optimizer

    cfg = Config(channels=CHANNELS, patch_size=16, global_min=0.0,
                 global_max=4095.0, attention_impl="xla",
                 serve_pad_multiple=16).finalize()
    svc = EnhanceService(cfg, CHANNELS)
    rng = np.random.RandomState(11)
    cube = (rng.rand(16, 16, CHANNELS) * 100).astype(np.float32)
    before = svc.enhance(cube)["S"]

    # perturb params, write a checkpoint, reload
    new_params = jax.tree.map(lambda x: jnp.asarray(x) * 1.1, svc.params)
    tx = make_optimizer()
    ckpt = checkpoints.save_checkpoint(
        str(tmp_path / "hot.ckpt"), new_params, tx.init(new_params), epoch=9)
    info = svc.reload(ckpt)
    assert info["epoch"] == 9 and info["reloads"] >= 1
    after = svc.enhance(cube)["S"]
    assert not np.allclose(before, after)
    # stats/buckets survive the swap
    assert len(svc.stats()["buckets"]) >= 1


def test_reload_requires_path():
    cfg = Config(channels=CHANNELS, patch_size=16, attention_impl="xla",
                 serve_pad_multiple=16).finalize()
    svc = EnhanceService(cfg, CHANNELS)
    with pytest.raises(ValueError):
        svc.reload()


def test_http_reload_requires_token_for_paths(tmp_path, server):
    """Explicit-checkpoint reload without a configured token → 403."""
    import http.client

    conn = http.client.HTTPConnection(server.host, server.port, timeout=60)
    conn.request("POST", "/reload?checkpoint=/nope/missing.ckpt")
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    assert resp.status == 403
    assert "X-Reload-Token" in payload["error"]


def test_http_reload_with_token(tmp_path):
    """A token-configured server accepts authenticated path reloads and
    rejects bad tokens."""
    import http.client
    import jax

    from sshslie_tpu import checkpoints
    from sshslie_tpu.train import make_optimizer

    cfg = Config(channels=CHANNELS, patch_size=16, global_min=0.0,
                 global_max=4095.0, attention_impl="xla",
                 serve_pad_multiple=16, serve_reload_token="s3cret").finalize()
    svc = EnhanceService(cfg, CHANNELS)
    srv = EnhanceServer(svc, port=0).start()
    try:
        params = jax.tree.map(np.asarray, svc.params)
        tx = make_optimizer()
        ckpt = checkpoints.save_checkpoint(
            str(tmp_path / "h2.ckpt"), params, tx.init(params), epoch=3)
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=60)
        conn.request("POST", f"/reload?checkpoint={ckpt}",
                     headers={"X-Reload-Token": "s3cret"})
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200 and payload["epoch"] == 3
        # wrong token → 403
        conn.request("POST", f"/reload?checkpoint={ckpt}",
                     headers={"X-Reload-Token": "wrong"})
        resp = conn.getresponse()
        assert resp.status == 403
        resp.read()
        # authenticated bogus path → 400/500, not a dropped connection
        conn.request("POST", "/reload?checkpoint=/nope/missing.ckpt",
                     headers={"X-Reload-Token": "s3cret"})
        resp = conn.getresponse()
        assert resp.status in (400, 500)
        resp.read()
        conn.close()
    finally:
        srv.shutdown()


def test_quantized_serving_close_to_fp32(tmp_path):
    """serve_quantize='int8': the quantized service's outputs stay within
    int8 weight-quantization error of the fp32 service."""
    rng = np.random.RandomState(21)
    base_cfg = dict(channels=CHANNELS, patch_size=16, global_min=0.0,
                    global_max=4095.0, attention_impl="xla",
                    serve_pad_multiple=16)
    fp32 = EnhanceService(Config(**base_cfg).finalize(), CHANNELS)
    q = EnhanceService(Config(**base_cfg, serve_quantize="int8").finalize(),
                       CHANNELS, params=fp32._params_template)
    cube = (rng.rand(20, 20, CHANNELS) * 4000).astype(np.float32)
    S_f = fp32.enhance(cube)["S"]
    S_q = q.enhance(cube)["S"]
    assert S_q.shape == cube.shape
    # near-lossless on the 0..4095 output scale
    assert np.abs(S_f - S_q).max() < 30.0, np.abs(S_f - S_q).max()
    # reload re-quantizes without structural errors
    import jax
    from sshslie_tpu import checkpoints
    from sshslie_tpu.train import make_optimizer

    params = jax.tree.map(np.asarray, fp32._params_template)
    tx = make_optimizer()
    ckpt = checkpoints.save_checkpoint(str(tmp_path / "q.ckpt"), params,
                                       tx.init(params), epoch=1)
    info = q.reload(ckpt)
    assert info["epoch"] == 1
    S_q2 = q.enhance(cube)["S"]
    np.testing.assert_allclose(S_q, S_q2, atol=1e-4)


def test_int4_quantized_serving(tmp_path):
    """serve_quantize='int4': lossier than int8 by design, but the service
    must stay structurally sound and within int4 error on the output scale."""
    rng = np.random.RandomState(22)
    base_cfg = dict(channels=CHANNELS, patch_size=16, global_min=0.0,
                    global_max=4095.0, attention_impl="xla",
                    serve_pad_multiple=16)
    fp32 = EnhanceService(Config(**base_cfg).finalize(), CHANNELS)
    q = EnhanceService(Config(**base_cfg, serve_quantize="int4").finalize(),
                       CHANNELS, params=fp32._params_template)
    cube = (rng.rand(20, 20, CHANNELS) * 4000).astype(np.float32)
    S_f = fp32.enhance(cube)["S"]
    S_q = q.enhance(cube)["S"]
    assert S_q.shape == cube.shape
    # int4 keeps 15 levels/channel: allow ~10× the int8 budget on 0..4095,
    # but it must still track the fp32 output (not collapse to garbage)
    assert np.abs(S_f - S_q).max() < 300.0, np.abs(S_f - S_q).max()


def test_quantized_serving_rejects_mesh():
    from sshslie_tpu.parallel.mesh import make_mesh

    cfg = Config(channels=CHANNELS, patch_size=16, attention_impl="xla",
                 serve_quantize="int8").finalize()
    with pytest.raises(ValueError, match="single-chip"):
        EnhanceService(cfg, CHANNELS, mesh=make_mesh("8"))


def test_mesh_serving_matches_single_device():
    """EnhanceService over an 8-device mesh (ShardedInferencer: cube height
    sharded, conv halos via GSPMD) returns the same enhancement as the
    single-device service with the same params."""
    from sshslie_tpu.parallel.mesh import make_mesh

    cfg = Config(channels=CHANNELS, patch_size=16, global_min=0.0,
                 global_max=4095.0, attention_impl="xla")
    cfg.finalize()
    single = EnhanceService(cfg, CHANNELS)
    meshed = EnhanceService(cfg, CHANNELS, params=single.params,
                            mesh=make_mesh("8"))
    rng = np.random.RandomState(5)
    cube = (rng.rand(32, 24, CHANNELS) * 4000).astype(np.float32)
    a = single.enhance(cube)
    b = meshed.enhance(cube)
    np.testing.assert_allclose(a["S"], b["S"], rtol=1e-5, atol=1e-3)


def test_serve_phase_wiring_from_checkpoint(tmp_path, monkeypatch):
    """The --phase serve construction path: resolve the checkpoint from
    test_timestamp, build the service, answer /health and /enhance."""
    import os

    from sshslie_tpu import checkpoints
    from sshslie_tpu.serve import build_server_from_config
    from sshslie_tpu.train import Trainer

    monkeypatch.chdir(tmp_path)
    train_cfg = Config(channels=CHANNELS, patch_size=16, attention_impl="xla",
                       model_name="srv", global_min=0.0, global_max=4095.0)
    train_cfg.finalize()
    trainer = Trainer(train_cfg, channels=CHANNELS)
    ckpt_dir = os.path.join(train_cfg.model_ckpt_dir,
                            "Decomposition_" + train_cfg.timestamp)
    checkpoints.save_checkpoint(checkpoints.latest_path(ckpt_dir),
                                trainer.state.params, trainer.state.opt_state, 1)

    cfg = Config(channels=CHANNELS, phase="serve", model_name="srv",
                 test_timestamp=train_cfg.timestamp, serve_port=0,
                 serve_pad_multiple=16, global_min=0.0, global_max=4095.0,
                 attention_impl="xla")
    cfg.finalize()
    srv = build_server_from_config(cfg).start()
    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
        conn.request("GET", "/health")
        health = json.loads(conn.getresponse().read())
        conn.close()
        assert health["status"] == "ok" and health["channels"] == CHANNELS
        rng = np.random.RandomState(6)
        cube = (rng.rand(16, 16, CHANNELS) * 4000).astype(np.float32)
        resp, body = _post_mat(srv, cube)
        assert resp.status == 200
        assert sio.loadmat(io.BytesIO(body))["data"].shape == cube.shape
    finally:
        srv.shutdown()


def test_serve_phase_missing_checkpoint_is_actionable(tmp_path, monkeypatch):
    from sshslie_tpu.serve import build_server_from_config

    monkeypatch.chdir(tmp_path)
    cfg = Config(channels=CHANNELS, phase="serve", model_name="ghost",
                 test_timestamp="20990101_000000", serve_port=0)
    cfg.finalize()
    with pytest.raises(FileNotFoundError, match="test_timestamp"):
        build_server_from_config(cfg)


def test_serve_bench_script_run_case():
    """scripts/serve_bench.py's core loop: concurrent requests through the
    real EnhanceService, sane stats for both the sequential and the
    micro-batched case."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sshslie_scripts_serve_bench",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "serve_bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    res = mod.run_case({"serve_max_batch": 1}, 32, CHANNELS, 6, 2, "seq")
    assert res["requests_per_sec"] > 0 and res["latency_p50_ms"] > 0
    res_mb = mod.run_case(
        {"serve_max_batch": 4, "serve_batch_window_ms": 20.0},
        32, CHANNELS, 6, 3, "mb",
    )
    assert res_mb["batched_runs"] >= 1 and res_mb["max_batch_seen"] >= 1

    # Interleaved wire A/B: one session, per-encoding stats, f32-relative
    # speedups present for every encoding (the drift-cancelling mode the
    # 512² relay measurement needs).
    res_il = mod.interleaved_wire_case(32, CHANNELS, 3, ["f32", "bf16", "u16"])
    assert res_il["case"] == "wire_interleaved_t1"
    for enc in ("f32", "bf16", "u16"):
        stats = res_il["encodings"][enc]
        assert stats["latency_p50_ms"] > 0
        assert stats["speedup_p50_vs_f32"] > 0
    assert res_il["encodings"]["f32"]["speedup_p50_vs_f32"] == 1.0


def test_wire_encodings_roundtrip_and_shrink(server, service):
    """Client-negotiated response encodings (VERDICT r3: transport-bound
    serving): f32/bf16/u16/zlib all round-trip through the real HTTP server
    within their precision, and the 2-byte formats halve the payload."""
    from sshslie_tpu.serve import decode_cube_response

    rng = np.random.RandomState(7)
    cube = (rng.rand(24, 24, CHANNELS) * 4000).astype(np.float32)
    ref = service.enhance(cube)["S"]
    rng_span = float(ref.max() - ref.min())

    sizes = {}
    # u16 responses quantize twice (device-side d2h fetch + HTTP encode):
    # ≤ 1 LSB each, so allow 3. bf16: 2^-9 relative, twice.
    for enc, tol in (("mat", 0.0), ("f32", 0.0),
                     ("bf16", 0.004 * float(np.abs(ref).max())),
                     ("u16", 3.0 * rng_span / 65535.0)):
        resp, body = _post_mat(server, cube, query=f"?encoding={enc}")
        assert resp.status == 200, body
        got = decode_cube_response(body, resp.headers)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=max(tol, 1e-6))
        sizes[enc] = len(body)
    assert sizes["bf16"] <= sizes["f32"] // 2 + 64
    assert sizes["u16"] <= sizes["f32"] // 2 + 64
    assert sizes["f32"] <= sizes["mat"]

    # zlib composes with any encoding and still decodes identically.
    resp, body = _post_mat(server, cube, query="?encoding=u16&compress=zlib")
    assert resp.status == 200
    assert resp.headers["Content-Encoding"] == "deflate"
    got = decode_cube_response(body, resp.headers)
    np.testing.assert_allclose(got, ref, atol=3.0 * rng_span / 65535.0)
    # artifacts + zlib keeps the .mat container path working too.
    resp, body = _post_mat(server, cube, query="?artifacts=1&compress=zlib")
    assert resp.status == 200
    import zlib as _zlib

    mat = sio.loadmat(io.BytesIO(_zlib.decompress(body)))
    assert "R_low" in mat and "data" in mat


def test_u16_wire_passthrough_exact(server, service):
    """The HTTP u16 response is the device-quantized cube passed straight to
    the wire (r5): decoding the body with its affine headers reproduces the
    device-side u16 values EXACTLY (zero re-quantization — the legacy host
    dequant -> denorm -> re-quantize path moved up to 1 LSB), and the whole
    thing stays within 1 device-LSB of the f32-wire response."""
    from sshslie_tpu.serve import decode_cube_response

    rng = np.random.RandomState(13)
    cube = (rng.rand(24, 24, CHANNELS) * 4000).astype(np.float32)
    resp, body = _post_mat(server, cube, query="?encoding=u16")
    assert resp.status == 200, body
    got = decode_cube_response(body, resp.headers)

    # Server-side raw fetch on the same request -> identical q/scale/offset
    # after folding the denorm affine (the passthrough contract).
    res = service.enhance(cube, wire="u16_wire")
    sw = res["S_wire"]
    q_wire = np.frombuffer(body, "<u2").reshape(got.shape)
    np.testing.assert_array_equal(q_wire, sw["q"])
    assert float(resp.headers["X-Cube-Scale"]) == pytest.approx(
        sw["scale"], rel=1e-8)
    assert float(resp.headers["X-Cube-Offset"]) == pytest.approx(
        sw["offset"], rel=1e-8, abs=1e-12)

    ref = service.enhance(cube, wire="f32")["S"]
    lsb = (float(ref.max()) - float(ref.min())) / 65000.0
    np.testing.assert_allclose(got, ref, atol=max(lsb, 1e-5))


def test_wire_encoding_bad_requests(server):
    rng = np.random.RandomState(8)
    cube = (rng.rand(16, 16, CHANNELS) * 4000).astype(np.float32)
    resp, body = _post_mat(server, cube, query="?encoding=ascii")
    assert resp.status == 400 and b"unknown encoding" in body
    resp, body = _post_mat(server, cube, query="?compress=gzip")
    assert resp.status == 400 and b"unknown compress" in body
    resp, body = _post_mat(server, cube, query="?artifacts=1&encoding=u16")
    assert resp.status == 400 and b"requires encoding=mat" in body


def test_encode_cube_unit():
    from sshslie_tpu.serve import decode_cube_response, encode_cube

    cube = np.linspace(-3.0, 7.0, 4 * 5 * 2, dtype=np.float32).reshape(4, 5, 2)
    for enc in ("mat", "f32", "bf16", "u16"):
        blob, headers = encode_cube(cube, enc)
        got = decode_cube_response(blob, headers)
        tol = {"mat": 0, "f32": 0, "bf16": 0.05, "u16": 10.0 / 65535}[enc]
        np.testing.assert_allclose(got, cube, atol=max(tol, 1e-7))
    # constant cube: u16 scale degenerates to 1.0, still exact.
    const = np.full((3, 3, 2), 2.5, np.float32)
    blob, headers = encode_cube(const, "u16")
    np.testing.assert_allclose(decode_cube_response(blob, headers), const)
    with pytest.raises(ValueError, match="unknown encoding"):
        encode_cube(cube, "f64")
    with pytest.raises(ValueError, match="unknown compress"):
        encode_cube(cube, "f32", compress="lz4")


def test_reduced_wire_fetch_close_to_f32(service):
    """The on-device bf16/u16 fetch path returns values within precision of
    the f32 fetch (the d2h-halving lever for slow transports)."""
    rng = np.random.RandomState(11)
    cube = (rng.rand(20, 20, CHANNELS) * 4000).astype(np.float32)
    ref = service.enhance(cube, wire="f32")["S"]
    for wire, tol in (("bf16", 0.01 * float(np.abs(ref).max())),
                      ("u16", float(ref.max() - ref.min()) / 65000.0)):
        got = service.enhance(cube, wire=wire)["S"]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=max(tol, 1e-5))


def _post_raw(server, blob, headers, query=""):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=60)
    conn.request("POST", "/enhance" + query, body=blob, headers=dict(headers))
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp, body


def test_binary_request_bodies(server, service):
    """Request-side wire formats: a client can POST a raw f32/bf16/u16 cube
    (the X-Cube-* headers encode_cube produces) instead of a .mat body, and
    gets the same enhancement the .mat path computes on the decoded cube."""
    from sshslie_tpu.serve import decode_cube_response, encode_cube

    rng = np.random.RandomState(12)
    cube = (rng.rand(24, 24, CHANNELS) * 4000).astype(np.float32)
    ref = service.enhance(cube)["S"]
    for enc in ("f32", "bf16", "u16"):
        blob, headers = encode_cube(cube, enc)
        resp, body = _post_raw(server, blob, headers)
        assert resp.status == 200, body
        got = decode_cube_response(body, resp.headers)
        # The jitted forward is deterministic, so the expectation is the
        # .mat-path result on the cube as the server DECODED it (the only
        # difference is the request encoding's input precision). u16/bf16
        # requests take the DEVICE decode path (enhance_encoded: in-graph
        # dequant + normalization) — same f32 affine, jnp-vs-np reduction
        # order, so allow float rounding (measured ≤2.5e-7 relative).
        want = (ref if enc == "f32"
                else service.enhance(decode_cube_response(blob, headers))["S"])
        tol = 1e-5 if enc == "f32" else 1e-3
        np.testing.assert_allclose(got, want, atol=tol, rtol=1e-5)
    # Deflated binary request (Content-Encoding on the way in).
    blob, headers = encode_cube(cube, "f32", compress="zlib")
    resp, body = _post_raw(server, blob, headers)
    assert resp.status == 200, body
    np.testing.assert_allclose(
        decode_cube_response(body, resp.headers), ref, atol=1e-5)


def test_binary_request_bad_headers(server):
    """Malformed binary requests come back as clean 400s, not 500s."""
    from sshslie_tpu.serve import encode_cube

    cube = np.ones((8, 8, CHANNELS), np.float32)
    blob, headers = encode_cube(cube, "f32")
    h = dict(headers)
    del h["X-Cube-Shape"]
    resp, body = _post_raw(server, blob, h)
    assert resp.status == 400 and b"X-Cube-Shape" in body
    h = dict(headers, **{"X-Cube-Shape": "8x8"})
    resp, body = _post_raw(server, blob, h)
    assert resp.status == 400 and b"HxWxC" in body
    h = dict(headers, **{"X-Cube-Shape": "8xNOPEx6"})
    resp, body = _post_raw(server, blob, h)
    assert resp.status == 400 and b"malformed X-Cube-Shape" in body
    # Payload byte count inconsistent with the declared shape.
    resp, body = _post_raw(server, blob[:-8], headers)
    assert resp.status == 400
    # u16 without its scale/offset headers.
    blob_u16, h_u16 = encode_cube(cube, "u16")
    h = {k: v for k, v in h_u16.items() if k != "X-Cube-Scale"}
    resp, body = _post_raw(server, blob_u16, h)
    assert resp.status == 400 and b"X-Cube-Scale" in body
    # Corrupt deflate stream.
    resp, body = _post_raw(
        server, b"\x00not-deflate",
        dict(headers, **{"Content-Encoding": "deflate"}))
    assert resp.status == 400 and b"decompress" in body


def test_serve_client_script(server, service, tmp_path):
    """scripts/serve_client.py drives the full client side: load → encode →
    POST → decode → save, for both the default and a binary+zlib wire."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sshslie_scripts_serve_client",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "serve_client.py"),
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    enhance_over_http, client_main = sc.enhance_over_http, sc.main

    rng = np.random.RandomState(13)
    cube = (rng.rand(20, 20, CHANNELS) * 4000).astype(np.float32)
    inp = tmp_path / "in.mat"
    sio.savemat(inp, {"data": cube})
    ref = service.enhance(cube)["S"]

    url = f"http://{server.host}:{server.port}"
    out1 = tmp_path / "out_mat.mat"
    client_main([str(inp), str(out1), "--url", url])
    got = sio.loadmat(out1)["data"]
    np.testing.assert_allclose(got, ref, atol=1e-5)

    out2 = tmp_path / "out_u16.mat"
    client_main([str(inp), str(out2), "--url", url,
                 "--request_encoding", "u16", "--encoding", "u16",
                 "--compress", "zlib"])
    got2 = sio.loadmat(out2)["data"]
    span = float(ref.max() - ref.min())
    assert np.abs(got2 - ref).max() < 4 * span / 65535 + 1e-4

    # artifacts round-trip through the library entry point
    result, headers, _ = enhance_over_http(url, cube, artifacts=True)
    assert {"data", "R_low", "I_low", "I_delta"} <= set(result)
    np.testing.assert_allclose(result["data"], ref, atol=1e-5)

    # server error surfaces as RuntimeError with the message
    with pytest.raises(RuntimeError, match="requires encoding=mat"):
        enhance_over_http(url, cube, encoding="u16", artifacts=True)


def test_deflate_bomb_rejected(server):
    """A small deflate body that inflates far past the declared cube's byte
    count is rejected (400) before the decompressed allocation happens —
    /enhance is unauthenticated, so an unbounded zlib.decompress is an OOM
    vector (review r4)."""
    import zlib

    from sshslie_tpu.serve import decode_cube_response

    bomb = zlib.compress(b"\x00" * (64 << 20), 1)  # 64 MiB zeros → ~65 KiB
    headers = {"X-Cube-Encoding": "f32",
               "X-Cube-Shape": f"4x4x{CHANNELS}",
               "Content-Encoding": "deflate"}
    with pytest.raises(ValueError, match="bound"):
        decode_cube_response(bomb, headers)
    resp, body = _post_raw(server, bomb, headers)
    assert resp.status == 400 and b"bound" in body

    # A truncated (incomplete) deflate stream is rejected, not short-read.
    from sshslie_tpu.serve import encode_cube

    cube = np.ones((4, 4, CHANNELS), np.float32)
    blob, h = encode_cube(cube, "f32", compress="zlib")
    with pytest.raises(ValueError, match="truncated"):
        decode_cube_response(blob[:-6], h)

    # An in-bound deflated payload still round-trips exactly.
    np.testing.assert_array_equal(decode_cube_response(blob, h), cube)


def test_deflate_bound_clamped_against_giant_declared_shape(monkeypatch):
    """The decompression bound derives from the attacker-declared
    X-Cube-Shape — it must be clamped to the body cap, or declaring
    100000x100000x224 re-raises the 'hard bound' to petabytes and the bomb
    inflates in full before the reshape fails (review r4 follow-up)."""
    import zlib

    import sshslie_tpu.serve as serve_mod
    from sshslie_tpu.serve import decode_cube_response

    # Shrink the cap so the test doesn't allocate real memory.
    monkeypatch.setattr(serve_mod, "_MAX_BODY_BYTES", 1 << 20)
    bomb = zlib.compress(b"\x00" * (8 << 20), 1)  # 8 MiB > 1 MiB cap
    headers = {"X-Cube-Encoding": "f32",
               "X-Cube-Shape": "100000x100000x224",  # declares ~9 PB
               "Content-Encoding": "deflate"}
    # Since r5 the shape-product cap rejects this before any inflation at
    # all (even stronger than the clamped bound this test originally pinned).
    with pytest.raises(ValueError, match="body cap"):
        decode_cube_response(bomb, headers)


def test_reduced_fetch_crops_before_quantizing(service):
    """The u16/bf16 device fetch crops the bucket padding FIRST (review r4):
    the quantization range must cover only real pixels — network output over
    the edge-replicated pad region must not widen the scale — and the
    returned array is already (h, w, C)."""
    import jax.numpy as jnp

    h = w = 20
    bh = bw = 32  # pad_multiple 16 bucket for 20
    real = np.linspace(0.0, 1.0, h * w * CHANNELS, dtype=np.float32).reshape(
        h, w, CHANNELS)
    padded = np.full((bh, bw, CHANNELS), 1e6, np.float32)
    padded[:h, :w, :] = real
    got = service._fetch_reduced(jnp.asarray(padded), "u16", h, w)
    assert got.shape == (h, w, CHANNELS)
    # Range-of-real-pixels is 1.0 → error ≤ ~1 LSB of 1/65535. With the
    # pre-fix padded range (1e6) the step would be ~15, off by ~6 orders.
    assert float(np.abs(got - real).max()) <= 2.0 / 65535.0
    got_bf16 = service._fetch_reduced(jnp.asarray(padded), "bf16", h, w)
    assert got_bf16.shape == (h, w, CHANNELS)
    np.testing.assert_allclose(got_bf16, real, atol=0.01)


class TestDeviceDecodedRequests:
    """Binary u16/bf16 request bodies take the device-decode path (compact
    upload + in-graph dequant/normalization, serve.py::enhance_encoded) —
    results must match the host-decode path up to float rounding of the
    same affine, including on shapes that need bucket padding."""

    def test_accepts_encoded_requests_gating(self, service):
        assert service.accepts_encoded_requests
        bcfg = Config(
            channels=CHANNELS, patch_size=16, global_min=0.0,
            global_max=4095.0, attention_impl="xla", serve_pad_multiple=16,
            serve_max_batch=4,
        ).finalize()
        batched = EnhanceService(bcfg, CHANNELS)
        assert not batched.accepts_encoded_requests  # micro-batcher stacks f32
        if batched.batcher is not None:
            batched.batcher.close()
        scfg = Config(
            channels=CHANNELS, patch_size=16,
            normalization="per_channel_standardization",
            attention_impl="xla", serve_pad_multiple=16,
        ).finalize()
        std = EnhanceService(scfg, CHANNELS)
        assert not std.accepts_encoded_requests  # mean/std shift under pad

    def test_enhance_encoded_matches_host_path(self, service):
        from sshslie_tpu.serve import decode_cube_response, encode_cube

        rng = np.random.RandomState(21)
        # 20x24 needs edge padding to the 32x32 bucket (pad_multiple 16):
        # exercises the pad-invariance of the in-graph normalization.
        cube = (rng.rand(20, 24, CHANNELS) * 4000).astype(np.float32)
        for enc, tol in (("u16", 0.5), ("bf16", 0.5)):
            blob, headers = encode_cube(cube, enc)
            host_vals = decode_cube_response(blob, headers)
            want = service.enhance(host_vals)["S"]
            q, scale, offset = decode_cube_response(blob, headers, raw=True)
            got = service.enhance_encoded(q, enc, scale, offset)["S"]
            assert got.shape == want.shape
            # Same affine + normalization, jnp vs np reduction order: float
            # rounding only (the wire precision itself cancels — both sides
            # start from the identical encoded payload).
            np.testing.assert_allclose(got, want, atol=tol, rtol=1e-4)

    def test_enhance_encoded_rejects_bad_inputs(self, service):
        q = np.zeros((8, 8, CHANNELS), np.uint16)
        with pytest.raises(ValueError, match="u16/bf16"):
            service.enhance_encoded(q, "f32", 1.0, 0.0)
        with pytest.raises(ValueError, match="expected"):
            service.enhance_encoded(q[..., :-1], "u16", 1.0, 0.0)

    def test_http_binary_request_uses_device_path(self, server, service):
        """The HTTP handler routes compact bodies through enhance_encoded
        (counted via the service's jit cache) and the response matches the
        host-decoded reference."""
        from sshslie_tpu.serve import decode_cube_response, encode_cube

        rng = np.random.RandomState(22)
        cube = (rng.rand(24, 24, CHANNELS) * 4000).astype(np.float32)
        blob, headers = encode_cube(cube, "u16")
        resp, body = _post_raw(server, blob, headers)
        assert resp.status == 200, body
        assert "u16" in service._encoded_fns  # device path actually taken
        got = decode_cube_response(body, resp.headers)
        want = service.enhance(decode_cube_response(blob, headers))["S"]
        np.testing.assert_allclose(got, want, atol=1.0, rtol=1e-3)
