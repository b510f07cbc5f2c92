"""Persistent inference serving for enhanced-cube requests.

Net-new capability (the reference has only the batch test phase,
model.py:406-443). A long-lived process keeps the model compiled and the
params resident in HBM so per-request latency is inference-only:

  * **Shape buckets**: incoming cubes are edge-padded up to a multiple of
    ``pad_multiple``, so JAX's jit cache compiles once per bucket instead of
    once per exact cube size; buckets can be pre-compiled at startup
    (``warmup``) to take the 20-40 s XLA compile off the first request.
  * **Device serialization**: one chip ⇒ requests are serialized through a
    lock; the HTTP layer threads handle parsing/serialization concurrently
    so host-side work overlaps device work.
  * **Same math as the batch path**: normalization on the way in matches
    ``CubeStore``; denormalization of S on the way out matches
    evaluate._save_outputs (reference model.py:371-372).

HTTP surface (stdlib only):

  * ``GET /health`` → backend, params checksum, compiled buckets.
  * ``GET /stats``  → request count, latency aggregates.
  * ``GET /metrics`` → Prometheus text exposition (requests/errors/reloads
    counters, inference-latency histogram, compiled-bucket and micro-batch
    gauges) for scrape-based production monitoring.
  * ``POST /enhance`` — body is a ``.mat`` file; query string: ``key`` (input
    variable, default config ``mat_key``), ``artifacts=1`` to include
    R/I_low/I_delta. Response is a ``.mat`` file with the enhanced cube under
    config ``mat_key_prediction``.
  * **Wire-format negotiation** (VERDICT r3: serving is transport-bound on
    slow links — DCN, WAN, this container's ~45 MB/s relay — so response
    bytes ARE latency): ``encoding=mat|f32|bf16|u16`` picks the response
    encoding (default ``mat``), ``compress=zlib`` deflates whatever encoding
    was picked. ``f32`` is the raw little-endian cube (no .mat container);
    ``bf16`` truncates to 2 bytes/value (~3 significant decimal digits);
    ``u16`` is affine-quantized to the cube's own range (2 bytes/value,
    max error = range/131070, i.e. ≥ 20·log10(131070) ≈ 102 dB below full
    scale — far beyond 12-bit sensor noise floors). Binary
    responses carry shape/dtype/scale in ``X-Cube-*`` headers;
    :func:`decode_cube_response` is the client-side inverse. Binary
    encodings cover S only — ``artifacts=1`` requires ``encoding=mat``.
    The same scheme works on the way IN: request bodies default to .mat,
    but a client can POST a raw f32/bf16/u16 cube (optionally deflated)
    by setting the ``X-Cube-*`` / ``Content-Encoding`` request headers
    that :func:`encode_cube` produces — halving the uplink bytes too.

CLI: ``python -m sshslie_tpu.serve --config config/x.yml --test_timestamp TS``
or ``python main.py --config ... --phase serve``.
"""

from __future__ import annotations

import bisect
import hmac
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Sequence, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from sshslie_tpu import checkpoints
from sshslie_tpu.config import Config
from sshslie_tpu.utils import io_hsi


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# -- response wire formats ---------------------------------------------------

WIRE_ENCODINGS = ("mat", "f32", "bf16", "u16")


def encode_cube(
    cube: np.ndarray,
    encoding: str = "mat",
    compress: str = "",
    mat_key: str = "data",
) -> Tuple[bytes, Dict[str, str]]:
    """Serialize an (H, W, C) float cube for the wire → (blob, headers).

    Encodings: ``mat`` (scipy .mat container, the default/compat format),
    ``f32`` (raw little-endian float32), ``bf16`` (2-byte truncation),
    ``u16`` (affine quantization to the cube's own [min, max] — headers
    carry ``X-Cube-Scale``/``X-Cube-Offset`` so value = q·scale+offset).
    ``compress='zlib'`` deflates the blob (Content-Encoding: deflate).
    """
    if encoding not in WIRE_ENCODINGS:
        raise ValueError(
            f"unknown encoding {encoding!r} (choices: {', '.join(WIRE_ENCODINGS)})"
        )
    headers = {
        "X-Cube-Encoding": encoding,
        "X-Cube-Shape": "x".join(str(int(d)) for d in cube.shape),
    }
    if encoding == "mat":
        buf = io.BytesIO()
        import scipy.io as sio

        sio.savemat(buf, {mat_key: cube})
        blob = buf.getvalue()
    elif encoding == "f32":
        blob = np.ascontiguousarray(cube, dtype="<f4").tobytes()
    elif encoding == "bf16":
        import ml_dtypes  # ships with jax

        blob = np.ascontiguousarray(
            cube.astype(ml_dtypes.bfloat16)
        ).tobytes()
    else:  # u16
        lo = float(np.min(cube))
        hi = float(np.max(cube))
        scale = (hi - lo) / 65535.0 or 1.0
        # f32 math, same formula as the device-side quantizer
        # (EnhanceService._fetch_reduced): an f64 intermediate here would
        # allocate 2x the cube and run ~6x slower for <0.01 LSB of accuracy
        # (measured 240 ms -> 40 ms at 512^2x64, r5).
        q = np.round((cube.astype(np.float32, copy=False) - np.float32(lo))
                     / np.float32(scale))
        blob = np.ascontiguousarray(q, dtype="<u2").tobytes()
        headers["X-Cube-Scale"] = f"{scale:.9e}"
        headers["X-Cube-Offset"] = f"{lo:.9e}"
    if compress == "zlib":
        import zlib

        # level 1: this path exists to cut transport latency — a slow high-
        # ratio compress would just move the bottleneck to the host CPU.
        blob = zlib.compress(blob, 1)
        headers["Content-Encoding"] = "deflate"
    elif compress:
        raise ValueError(f"unknown compress {compress!r} (choices: zlib)")
    return blob, headers


def encode_cube_prequantized(
    q: np.ndarray, scale: float, offset: float, compress: str = "",
) -> Tuple[bytes, Dict[str, str]]:
    """Wire-encode an ALREADY-quantized uint16 cube (device-side u16 fetch).

    The u16 response fast path: the device quantizes S once
    (EnhanceService._fetch_reduced raw mode), the denormalization folds into
    the affine headers (value = q*scale + offset is linear, so
    denorm(q*s + o) = q*(s*span) + (o*span + gmin)), and the uint16 buffer
    goes to the wire as-is. Exactly lossless vs the device values — the
    legacy path (host dequant -> denorm -> encode_cube re-quantization)
    moved <=1 LSB and burned ~0.4 s of host math per 512^2x64 response.
    Decodes with the standard :func:`decode_cube_response`."""
    headers = {
        "X-Cube-Encoding": "u16",
        "X-Cube-Shape": "x".join(str(int(d)) for d in q.shape),
        "X-Cube-Scale": f"{scale:.9e}",
        "X-Cube-Offset": f"{offset:.9e}",
    }
    blob = np.ascontiguousarray(q, dtype="<u2").tobytes()
    if compress == "zlib":
        import zlib

        blob = zlib.compress(blob, 1)
        headers["Content-Encoding"] = "deflate"
    elif compress:
        raise ValueError(f"unknown compress {compress!r} (choices: zlib)")
    return blob, headers


def decode_cube_response(
    blob: bytes, headers, mat_key: str = "data", raw: bool = False
) -> np.ndarray:
    """Inverse of :func:`encode_cube` → float32 (H, W, C) cube.

    ``raw=True`` (u16/bf16 payloads only) skips the host-side float32
    expansion and returns ``(array, scale, offset)`` with the array still in
    its compact dtype (uint16 / ml_dtypes.bfloat16; scale/offset are None
    for bf16). The serving device path uploads that compact array as-is —
    2 bytes/value over the host↔device link — and dequantizes in-graph
    (EnhanceService.enhance_encoded). All header/shape/zlib validation is
    identical to the non-raw path.

    ``headers`` is any mapping with ``.get`` — http.client responses AND
    http.server request messages qualify, so this one function is both the
    client-side response decoder and the server-side decoder for binary
    *request* bodies (clients on slow uplinks POST u16/bf16 raw cubes with
    the same ``X-Cube-*`` headers instead of a 4-byte/value .mat). All
    malformed-payload failures raise ValueError (→ HTTP 400 server-side).

    Deflated payloads decompress under a hard output bound (the declared
    cube's exact byte count when X-Cube-Shape is present, ``_MAX_BODY_BYTES``
    for .mat) — a small deflate bomb otherwise inflates ~1000× and can
    demand terabytes from an unauthenticated endpoint before any shape
    validation runs."""
    encoding = headers.get("X-Cube-Encoding", "mat")
    if encoding not in WIRE_ENCODINGS:
        raise ValueError(f"unknown X-Cube-Encoding {encoding!r}")
    shape = None
    if encoding != "mat":
        shape_hdr = headers.get("X-Cube-Shape")
        if not shape_hdr:
            raise ValueError(
                f"binary cube payload (X-Cube-Encoding: {encoding}) is "
                "missing the X-Cube-Shape header (e.g. '128x128x64')"
            )
        try:
            shape = tuple(int(d) for d in shape_hdr.split("x"))
        except ValueError:
            raise ValueError(f"malformed X-Cube-Shape {shape_hdr!r} "
                             "(expected e.g. '128x128x64')")
        if len(shape) != 3 or any(d <= 0 for d in shape):
            raise ValueError(f"X-Cube-Shape {shape_hdr!r} is not a positive "
                             "HxWxC cube shape")
        # Dimension bomb: reject declared cubes past the body cap HERE, with
        # exact Python bignum arithmetic — letting a 10^24-element shape
        # reach numpy's reshape raises OverflowError (ssize_t), which the
        # HTTP layer maps to a 5xx instead of the 4xx this deserves.
        itemsize = 4 if encoding == "f32" else 2
        declared = shape[0] * shape[1] * shape[2] * itemsize
        if declared > _MAX_BODY_BYTES:
            raise ValueError(
                f"X-Cube-Shape {shape_hdr!r} declares a {declared}-byte cube "
                f"(> the {_MAX_BODY_BYTES >> 20} MiB body cap)"
            )
    if headers.get("Content-Encoding", "") == "deflate":
        import zlib

        # The shape-derived bound is attacker-declared (X-Cube-Shape on an
        # unauthenticated endpoint) — clamped to the body cap above, so a
        # bomb can't raise the "hard bound" to petabytes.
        limit = declared if shape is not None else _MAX_BODY_BYTES
        d = zlib.decompressobj()
        try:
            blob = d.decompress(blob, limit + 1)
        except zlib.error as e:
            raise ValueError(f"deflate payload failed to decompress: {e}")
        if len(blob) > limit:
            raise ValueError(
                f"deflated payload decompresses past its {limit}-byte bound "
                "(declared shape × itemsize for binary cubes, the body cap "
                "for .mat)"
            )
        if not d.eof:
            raise ValueError("deflate payload is truncated (incomplete "
                             "stream)")
    if encoding == "mat":
        return io_hsi.load_hsi_bytes(blob, mat_key=mat_key)
    if encoding == "f32":
        return np.frombuffer(blob, dtype="<f4").reshape(shape).astype(np.float32)
    if encoding == "bf16":
        import ml_dtypes

        xb = np.frombuffer(blob, dtype=ml_dtypes.bfloat16).reshape(shape)
        if raw:
            return xb, None, None
        return xb.astype(np.float32)
    if encoding == "u16":
        import math

        scale_hdr = headers.get("X-Cube-Scale")
        offset_hdr = headers.get("X-Cube-Offset")
        if scale_hdr is None or offset_hdr is None:
            raise ValueError("u16 cube payload requires X-Cube-Scale and "
                             "X-Cube-Offset headers")
        try:
            scale, offset = float(scale_hdr), float(offset_hdr)
        except ValueError:
            raise ValueError(
                f"malformed X-Cube-Scale/X-Cube-Offset "
                f"({scale_hdr!r}, {offset_hdr!r})"
            )
        if not (math.isfinite(scale) and math.isfinite(offset)):
            # inf/nan scales would flood the device (and any downstream
            # metric) with non-finite values from a single crafted header.
            raise ValueError("X-Cube-Scale/X-Cube-Offset must be finite "
                             f"({scale_hdr!r}, {offset_hdr!r})")
        q = np.frombuffer(blob, dtype="<u2").reshape(shape)
        if raw:
            return q, scale, offset
        # float32 in-place affine: peak decode allocation stays ~2× body (q
        # view + out), not the ~4× of a float64 intermediate. Rounding cost
        # is ~1e-7 relative — two orders below the u16 quantization step.
        out = q.astype(np.float32)
        out *= np.float32(scale)
        out += np.float32(offset)
        return out
    raise AssertionError(encoding)  # unreachable: validated above


def _round_up_pow2(x: int, cap: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return min(p, cap)


class _MicroBatcher:
    """Coalesces concurrent same-bucket requests into one batched forward.

    Requests that arrive within ``window_ms`` of the first pending request in
    a bucket are stacked (up to ``max_batch``) and run as a single (B, H, W,
    C) forward — under concurrent load this turns B dispatches into one,
    trading ≤ window_ms of added latency. The batch dimension is rounded up
    to a power of two so the jit cache holds at most log2(max_batch)+1
    compiles per shape bucket.
    """

    def __init__(self, run_batch, max_batch: int = 4, window_ms: float = 5.0):
        self._run_batch = run_batch          # (list[np.ndarray]) -> list[outputs]
        self.max_batch = max(int(max_batch), 1)
        self.window_s = window_ms / 1e3
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: Dict[Tuple[int, int], list] = {}
        self._closed = False
        self.batched_runs = 0
        self.max_batch_seen = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, bucket: Tuple[int, int], x: np.ndarray):
        """Enqueue one padded cube; returns a Future of its output tuple."""
        from concurrent.futures import Future

        fut: "Future" = Future()
        with self._cv:
            if self._closed:
                # The loop thread has exited (or is draining); an enqueued
                # entry would never run and the caller's result() would block
                # forever.
                fut.set_exception(RuntimeError("batcher is closed"))
                return fut
            self._pending.setdefault(bucket, []).append((x, time.time(), fut))
            self._cv.notify()
        return fut

    def _take_ready(self):
        """Pop the first bucket whose window expired or batch filled."""
        now = time.time()
        for bucket, entries in self._pending.items():
            if (len(entries) >= self.max_batch
                    or now - entries[0][1] >= self.window_s):
                del self._pending[bucket]
                return bucket, entries[: self.max_batch], entries[self.max_batch:]
        return None

    def _loop(self):
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if self._closed and not self._pending:
                    return
                ready = self._take_ready()
                if ready is None:
                    oldest = min(e[0][1] for e in self._pending.values())
                    self._cv.wait(timeout=max(self.window_s - (time.time() - oldest), 1e-4))
                    continue
                bucket, batch, rest = ready
                if rest:
                    self._pending[bucket] = rest
            xs = [x for x, _, _ in batch]
            futs = [f for _, _, f in batch]
            try:
                outs = self._run_batch(xs)
                with self._lock:
                    self.batched_runs += 1
                    self.max_batch_seen = max(self.max_batch_seen, len(xs))
                for f, o in zip(futs, outs):
                    f.set_result(o)
            except BaseException as e:
                for f in futs:
                    f.set_exception(e)

    def counters(self) -> tuple:
        """Consistent ``(batched_runs, max_batch_seen)`` snapshot under the
        batcher's own lock — the writers in the loop thread hold it, so a
        /metrics scrape never reads a half-updated pair (ADVICE r4)."""
        with self._lock:
            return self.batched_runs, self.max_batch_seen

    def close(self, timeout: float = 60.0) -> bool:
        """Stop the loop thread; returns True when it fully drained. The
        generous default timeout covers an in-flight cold-bucket XLA compile
        (20-40 s) — a 5 s join would return with the batch still running."""
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            print("warning: micro-batcher still draining after "
                  f"{timeout:.0f}s (in-flight batch/compile)")
            return False
        return True


# Prometheus histogram bounds for the device-inference seconds (the
# X-Inference-Seconds contract region — transport excluded). Spans the
# measured range: ~5 ms warm 64² on-chip up to cold-bucket compiles.
_LATENCY_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
                    5.0, 10.0, 60.0)


class EnhanceService:
    """Checkpoint-backed enhancement with a shape-bucketed jit cache."""

    def __init__(
        self,
        cfg: Config,
        channels: int,
        checkpoint_path: Optional[str] = None,
        params: Any = None,
        pad_multiple: Optional[int] = None,
        mesh=None,
    ):
        import jax

        from sshslie_tpu.evaluate import Inferencer, ShardedInferencer
        from sshslie_tpu.train import build_model, init_params

        self.cfg = cfg
        self.channels = channels
        self.pad_multiple = int(pad_multiple or cfg.serve_pad_multiple)
        self.model = build_model(cfg, channels)
        if params is None:
            params = init_params(self.model, cfg.seed_value, cfg.patch_size)
            if checkpoint_path:
                params, _epoch = checkpoints.load_pretrained_params(
                    checkpoint_path, params
                )
        import jax.numpy as jnp

        # Park the params on device once; every request reuses them.
        self.params = jax.device_put(params)
        # fp32 template for checkpoint restores (reload re-quantizes).
        self._params_template = params
        self.checkpoint_path = checkpoint_path
        self.reload_count = 0
        self.quantize = cfg.serve_quantize
        # Validate BEFORE quantizing: the config error must not follow a
        # full param-tree quantization + device transfer + success banner.
        if mesh is not None and self.quantize:
            raise ValueError("serve_quantize is single-chip only")
        if self.quantize:
            self.params = self._quantized(self.params)
        self._mesh = mesh
        if mesh is not None:
            self._infer = ShardedInferencer(self.model, mesh, cfg.data_axis)
            # ShardedInferencer pads internally per its mesh; bucket on top.
        elif self.quantize:
            from sshslie_tpu.ops.quant import QuantizedInferencer

            # Weights stay 8-bit in HBM; dequant fuses into the forward.
            # enhance() passes self.params explicitly, so hot-reload swaps
            # weights without recompiling (same tree structure).
            self._infer = QuantizedInferencer(
                self.model, self.params, pad_multiple=1
            )
        else:
            self._infer = Inferencer(self.model, pad_multiple=1)
        # Serializes all device dispatch. Never held re-entrantly: enhance()
        # releases it after the forward, and _fetch_reduced then re-acquires
        # for its own device ops (same on the micro-batched path, where the
        # forward runs on the batcher thread).
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._buckets: set = set()
        self._encoded_fns: Dict[str, Any] = {}
        self._u16_quant_fns: Dict[Tuple[int, int], Any] = {}
        self.requests = 0
        self.total_secs = 0.0
        self.max_secs = 0.0
        self.error_count = 0
        # Non-cumulative per-bucket counts; the +1 slot is the +Inf overflow.
        # Rendered cumulative by metrics_text (Prometheus histogram contract).
        self._hist = [0] * (len(_LATENCY_BUCKETS) + 1)
        self.batcher: Optional[_MicroBatcher] = None
        if cfg.serve_max_batch > 1 and mesh is None:
            import jax as _jax

            if self.quantize:
                from sshslie_tpu.ops.quant import dequantize_tree as _dq

                self._batched_fn = _jax.jit(
                    lambda qp, x: self.model.apply({"params": _dq(qp)}, x)
                )
            else:
                self._batched_fn = _jax.jit(
                    lambda p, x: self.model.apply({"params": p}, x)
                )
            self.batcher = _MicroBatcher(
                self._run_batch, cfg.serve_max_batch, cfg.serve_batch_window_ms
            )

    def _quantized(self, params):
        import jax

        from sshslie_tpu.ops.quant import quantize_tree

        qparams, stats = quantize_tree(params, self.quantize)
        print(
            f"Serving {self.quantize}-quantized weights: "
            f"{stats['bytes_fp32']} → {stats['bytes_quant']} bytes "
            f"({stats['tensors_quantized']} tensors)"
        )
        return jax.device_put(qparams)

    def _run_batch(self, xs):
        """Stack same-bucket cubes, run one batched forward, split results.

        The batch dim is zero-padded to a power of two so compiles stay
        bounded; zero samples are discarded after the forward."""
        import jax
        import jax.numpy as jnp

        b = len(xs)
        bp = _round_up_pow2(b, self.batcher.max_batch)
        x = np.stack(xs)
        if bp != b:
            x = np.concatenate([x, np.zeros((bp - b,) + x.shape[1:], x.dtype)])
        with self._device_lock:
            R, I, Id, S = self._batched_fn(self.params, jnp.asarray(x))
            jax.block_until_ready(S)
        return [(R[i], I[i], Id[i], S[i]) for i in range(b)]

    # -- core ---------------------------------------------------------------

    def _bucket(self, h: int, w: int) -> Tuple[int, int]:
        m = self.pad_multiple
        return _round_up(h, m), _round_up(w, m)

    def _fetch_reduced(self, S, wire: str, h: int, w: int,
                       raw: bool = False):
        """Device→host fetch of S at reduced precision.

        Returns a float32 host array, or — ``raw=True``, u16 only — the
        still-quantized ``(uint16 array, scale, offset)`` for the wire
        passthrough (:func:`encode_cube_prequantized`), skipping the host
        dequantization entirely.

        The cast (bf16) or affine quantization (u16) runs ON DEVICE, so the
        d2h link moves 2 bytes per value instead of 4 — on a slow transport
        (this container's ~45 MB/s relay, DCN, WAN-attached hosts) the
        transfer is the serving bottleneck and this halves it. The client's
        wire encoding then re-encodes losslessly from the already-reduced
        values (u16 re-quantization moves ≤1 LSB; the raw passthrough is
        exact).

        The bucket padding is cropped to (h, w) ON DEVICE first, so (a) the
        u16 min/max covers only real pixels — network output over the
        edge-replicated pad region must not widen the quantization range —
        and (b) the d2h bytes cover only real pixels too. The whole u16
        reduction is ONE jitted dispatch (crop + min/max + quantize) — the
        r4 eager chain paid a relay round-trip per op. Device dispatches
        serialize on the device lock (callers do NOT hold it here — both
        request paths release it after the forward); the big d2h fetch
        happens outside the lock."""
        import jax
        import jax.numpy as jnp

        with self._device_lock:
            if wire == "bf16":
                if S.shape[0] != h or S.shape[1] != w:
                    S = S[:h, :w, :]
                return np.asarray(
                    jnp.asarray(S, jnp.bfloat16)
                ).astype(np.float32)
            # u16: fused crop + min/max + quantize; one 2-scalar meta fetch.
            fn = self._u16_quant_fns.get((h, w))
            if fn is None:
                def quant(x):
                    x = jax.lax.slice(x, (0, 0, 0), (h, w, x.shape[2]))
                    lo = jnp.min(x)
                    scale = jnp.maximum((jnp.max(x) - lo) / 65535.0,
                                        jnp.float32(1e-30))
                    q = jnp.round((x - lo) / scale).astype(jnp.uint16)
                    return q, jnp.stack([lo, scale])

                fn = jax.jit(quant)
                self._u16_quant_fns[(h, w)] = fn
            q, meta = fn(S)
            meta = np.asarray(meta)
        qa = np.asarray(q)
        if raw:
            return qa, float(meta[1]), float(meta[0])
        return qa.astype(np.float32) * float(meta[1]) + float(meta[0])

    # Normalization modes whose reductions are edge-pad-invariant (padding
    # replicates existing values, adding no new extrema, so max/min over the
    # padded cube equal the unpadded ones). per_channel_standardization's
    # mean/std DO shift under padding — it stays on the host decode path.
    _PAD_SAFE_NORMS = (None, "", "self", "global_normalization",
                       "per_channel_normalization")

    @property
    def accepts_encoded_requests(self) -> bool:
        """Can binary u16/bf16 request bodies take the device-decode path?

        Single-chip, non-micro-batched services with a pad-invariant
        normalization only: the micro-batcher stacks host-f32 cubes, a mesh
        shards them, and standardization must normalize pre-pad."""
        return (self.batcher is None and self._mesh is None
                and self.cfg.normalization in self._PAD_SAFE_NORMS)

    def _encoded_fn(self, encoding: str):
        """Jitted (params, compact_cube, scale, offset) → (R, I, Id, S).

        Dequantization (u16 affine / bf16 cast) and the load-normalization
        run IN-GRAPH (utils/io_hsi.py::normalize_like_load_jnp), so the
        host→device transfer moves the client's 2-byte payload instead of a
        host-expanded f32 cube — on transport-bound links (this container's
        ~40 MB/s relay, DCN/WAN hosts) that halves the uplink leg the same
        way _fetch_reduced halves the downlink (reference contract:
        /root/reference/model.py:442-443, the .mat-in/.mat-out test path).
        One jit per encoding; shape buckets share it via the jit cache.
        scale/offset are traced scalars — value changes don't recompile."""
        import jax
        import jax.numpy as jnp

        fn = self._encoded_fns.get(encoding)
        if fn is not None:
            return fn
        cfg = self.cfg
        if self.quantize:
            from sshslie_tpu.ops.quant import dequantize_tree as _dq

            def apply(p, x):
                return self.model.apply({"params": _dq(p)}, x)
        else:
            def apply(p, x):
                return self.model.apply({"params": p}, x)

        def run(p, q, scale, offset):
            x = q.astype(jnp.float32)
            if encoding == "u16":
                x = x * scale + offset
            x = io_hsi.normalize_like_load_jnp(
                x, cfg.normalization, cfg.global_max, cfg.global_min)
            R, I, Id, S = apply(p, x[None])
            return R[0], I[0], Id[0], S[0]

        fn = jax.jit(run)
        self._encoded_fns[encoding] = fn
        return fn

    def enhance_encoded(self, q: np.ndarray, encoding: str,
                        scale: Optional[float] = None,
                        offset: Optional[float] = None,
                        artifacts: bool = False,
                        wire: str = "f32") -> Dict[str, Any]:
        """Enhance from a compact u16/bf16 request payload (device decode).

        ``q`` is the still-encoded (H, W, C) array from
        ``decode_cube_response(..., raw=True)``. Results match
        :meth:`enhance` on the host-dequantized values up to float rounding
        of the same affine (tests/test_serve.py pins the agreement); the
        compact array is edge-padded on host (still 2 B/value), uploaded
        as-is, and dequant + normalization fuse into the forward jit."""
        import jax
        import jax.numpy as jnp

        if not self.accepts_encoded_requests:
            raise ValueError(
                "device-side encoded requests are unavailable on this "
                "service (micro-batched, sharded, or pad-sensitive "
                "normalization) — decode on host and call enhance()")
        if encoding not in ("u16", "bf16"):
            raise ValueError(
                f"enhance_encoded takes u16/bf16 payloads, got {encoding!r}")
        if q.ndim != 3 or q.shape[-1] != self.channels:
            raise ValueError(
                f"expected (H, W, {self.channels}) cube, got {q.shape}")
        h, w, _ = q.shape
        bh, bw = self._bucket(h, w)
        if (bh, bw) != (h, w):
            q = np.pad(q, ((0, bh - h), (0, bw - w), (0, 0)), mode="edge")
        fn = self._encoded_fn(encoding)
        s = np.float32(0.0 if scale is None else scale)
        o = np.float32(0.0 if offset is None else offset)
        start = time.time()
        with self._device_lock:
            R, I, Id, S = fn(self.params, jnp.asarray(q), s, o)
            jax.block_until_ready(S)
        secs = time.time() - start
        return self._finalize(R, I, Id, S, h, w, bh, bw, secs, wire, artifacts)

    def enhance(self, cube: np.ndarray, artifacts: bool = False,
                wire: str = "f32") -> Dict[str, Any]:
        """Enhance one raw (H, W, C) cube: normalize → forward → denormalize.

        Returns {'S': cube, 'seconds': t} plus R/I_low/I_delta when
        ``artifacts``. Thread-safe; device work is serialized. ``wire``
        ('f32' | 'bf16' | 'u16') sets the device→host fetch precision of S
        (see :meth:`_fetch_reduced`); 'u16_wire' (HTTP u16 responses)
        returns 'S_wire' — the still-quantized uint16 + affine headers —
        instead of 'S'. Artifacts always fetch f32.
        """
        import jax

        cfg = self.cfg
        if cube.ndim != 3 or cube.shape[-1] != self.channels:
            raise ValueError(
                f"expected (H, W, {self.channels}) cube, got {cube.shape}"
            )
        x = io_hsi.normalize_like_load(
            cube.astype(np.float32), cfg.normalization, cfg.global_max, cfg.global_min
        )
        h, w, _ = x.shape
        bh, bw = self._bucket(h, w)
        if (bh, bw) != (h, w):
            x = np.pad(x, ((0, bh - h), (0, bw - w), (0, 0)), mode="edge")
        start = time.time()
        if self.batcher is not None:
            R, I, Id, S = self.batcher.submit((bh, bw), x).result()
        else:
            with self._device_lock:
                R, I, Id, S = self._infer(self.params, x)
                jax.block_until_ready(S)
        # Timed region = device compute only (the round-3 X-Inference-Seconds
        # contract); the d2h fetch below is transport, reported by clients.
        secs = time.time() - start
        return self._finalize(R, I, Id, S, h, w, bh, bw, secs, wire, artifacts)

    def _finalize(self, R, I, Id, S, h, w, bh, bw, secs, wire, artifacts):
        """Shared post-forward tail for both request paths: reduced-precision
        (or f32) d2h fetch, denormalization, artifact fetches, stats.

        ``wire='u16_wire'`` is the HTTP u16-response passthrough: the result
        carries ``S_wire`` — the device-quantized uint16 cube with the
        denormalization folded into its affine headers — instead of ``S``,
        so no 67 MB host dequant/denorm/re-quantize runs at all (exactly
        lossless vs the device values; see encode_cube_prequantized)."""
        cfg = self.cfg
        denorm = (cfg.global_min is not None and cfg.global_max is not None)
        if wire == "u16_wire":
            q, scale, offset = self._fetch_reduced(S, "u16", h, w, raw=True)
            if denorm:
                span = cfg.global_max - cfg.global_min
                scale, offset = scale * span, offset * span + cfg.global_min
            self._record_stats(bh, bw, secs)
            return {"S_wire": {"q": q, "scale": scale, "offset": offset},
                    "seconds": secs}
        if wire in ("bf16", "u16"):
            S = self._fetch_reduced(S, wire, h, w)
        else:
            S = np.asarray(S)[:h, :w, :]
        if denorm:
            S = S * (cfg.global_max - cfg.global_min) + cfg.global_min
        out = {"S": S, "seconds": secs}
        if artifacts:
            out["R_low"] = np.asarray(R)[:h, :w, :]
            out["I_low"] = np.asarray(I)[:h, :w, :]
            out["I_delta"] = np.asarray(Id)[:h, :w, :]
        self._record_stats(bh, bw, secs)
        return out

    def _record_stats(self, bh, bw, secs) -> None:
        with self._stats_lock:
            self.requests += 1
            self.total_secs += secs
            self.max_secs = max(self.max_secs, secs)
            self._buckets.add((bh, bw))
            i = bisect.bisect_left(_LATENCY_BUCKETS, secs)
            self._hist[i] += 1

    def warmup(self, shapes: Sequence[Tuple[int, int]]) -> None:
        """Pre-compile the jit buckets for the given (H, W) shapes.

        With micro-batching enabled the request path runs ``_batched_fn``,
        which has its own jit cache — warm every power-of-two batch size up
        to ``max_batch`` so no request ever pays the XLA compile."""
        import jax
        import jax.numpy as jnp

        for h, w in shapes:
            bh, bw = self._bucket(h, w)
            if (bh, bw) in self._buckets:
                continue
            if self.batcher is not None:
                # Runtime batch dims are min(round_up_pow2(n), max_batch):
                # every power of two below the cap, plus the cap itself
                # (which need not be a power of two) — warm exactly that set.
                sizes, b = [], 1
                while b < self.batcher.max_batch:
                    sizes.append(b)
                    b *= 2
                sizes.append(self.batcher.max_batch)
                for b in sizes:
                    dummy = jnp.zeros((b, bh, bw, self.channels), jnp.float32)
                    with self._device_lock:
                        _, _, _, S = self._batched_fn(self.params, dummy)
                        jax.block_until_ready(S)
            else:
                dummy = np.zeros((bh, bw, self.channels), np.float32)
                with self._device_lock:
                    _, _, _, S = self._infer(self.params, dummy)
                    jax.block_until_ready(S)
            with self._stats_lock:
                self._buckets.add((bh, bw))
            print(f"Warmed bucket ({bh}, {bw})")

    def reload(self, checkpoint_path: Optional[str] = None) -> Dict[str, Any]:
        """Hot-swap params from a checkpoint without restarting the server.

        The jitted graphs and compiled buckets are keyed on shapes, not
        values — new params drop in with zero recompilation. Lets a serving
        process track an ongoing training run (train writes
        ``model_epoch_latest``; POST /reload picks it up)."""
        import jax

        path = checkpoint_path or self.checkpoint_path
        if not path:
            raise ValueError("no checkpoint path configured for reload")
        new_params, epoch = checkpoints.load_pretrained_params(
            path, self._params_template
        )
        self._params_template = new_params
        if self.quantize:
            new_params = self._quantized(new_params)
        with self._device_lock:
            self.params = jax.device_put(new_params)
            if self.quantize and hasattr(self._infer, "qparams"):
                # Drop the inferencer's device copy of the OLD weights —
                # enhance() passes params explicitly, but the stale cached
                # tree would stay pinned in HBM for the server's lifetime.
                self._infer.qparams = self.params
        self.checkpoint_path = path
        with self._stats_lock:
            self.reload_count += 1
        return {"reloaded": path, "epoch": epoch, "reloads": self.reload_count}

    def stats(self) -> Dict[str, Any]:
        with self._stats_lock:
            n = self.requests
            out = {
                "requests": n,
                "avg_seconds": self.total_secs / n if n else 0.0,
                "max_seconds": self.max_secs,
                "buckets": sorted(list(self._buckets)),
                "pad_multiple": self.pad_multiple,
            }
        if self.batcher is not None:
            runs, seen = self.batcher.counters()
            out["batched_runs"] = runs
            out["max_batch_seen"] = seen
            out["max_batch"] = self.batcher.max_batch
        return out

    def record_error(self) -> None:
        """Count one HTTP error response (any 4xx/5xx) for /metrics."""
        with self._stats_lock:
            self.error_count += 1

    def metrics_text(self) -> str:
        """Prometheus text exposition (version 0.0.4) of the service state.

        Stdlib-only by design (like the rest of the HTTP layer): the format
        is lines of ``name{labels} value`` — a client library would be a
        dependency for string concatenation. Latency is the device-compute
        region only (the X-Inference-Seconds contract); transport shows up
        in client-side metrics where it belongs.
        """
        with self._stats_lock:
            n = self.requests
            total = self.total_secs
            mx = self.max_secs
            errors = self.error_count
            hist = list(self._hist)
            buckets = len(self._buckets)
            reloads = self.reload_count
        lines = [
            "# HELP sshslie_requests_total Enhancement requests completed.",
            "# TYPE sshslie_requests_total counter",
            f"sshslie_requests_total {n}",
            "# HELP sshslie_request_errors_total HTTP 4xx/5xx responses.",
            "# TYPE sshslie_request_errors_total counter",
            f"sshslie_request_errors_total {errors}",
            "# HELP sshslie_reloads_total Successful checkpoint hot-reloads.",
            "# TYPE sshslie_reloads_total counter",
            f"sshslie_reloads_total {reloads}",
            "# HELP sshslie_compiled_buckets Compiled jit shape buckets.",
            "# TYPE sshslie_compiled_buckets gauge",
            f"sshslie_compiled_buckets {buckets}",
            "# HELP sshslie_inference_seconds Device inference latency "
            "(compute only; transport excluded).",
            "# TYPE sshslie_inference_seconds histogram",
        ]
        cum = 0
        for bound, count in zip(_LATENCY_BUCKETS, hist):
            cum += count
            lines.append(f'sshslie_inference_seconds_bucket{{le="{bound}"}} {cum}')
        lines.append(f'sshslie_inference_seconds_bucket{{le="+Inf"}} {cum + hist[-1]}')
        lines.append(f"sshslie_inference_seconds_sum {total}")
        lines.append(f"sshslie_inference_seconds_count {n}")
        lines += [
            "# HELP sshslie_inference_seconds_max Worst request since start.",
            "# TYPE sshslie_inference_seconds_max gauge",
            f"sshslie_inference_seconds_max {mx}",
        ]
        if self.batcher is not None:
            runs, seen = self.batcher.counters()
            lines += [
                "# HELP sshslie_batched_runs_total Micro-batched device "
                "dispatches.",
                "# TYPE sshslie_batched_runs_total counter",
                f"sshslie_batched_runs_total {runs}",
                "# HELP sshslie_max_batch_seen Largest micro-batch "
                "coalesced so far.",
                "# TYPE sshslie_max_batch_seen gauge",
                f"sshslie_max_batch_seen {seen}",
            ]
        return "\n".join(lines) + "\n"


# -- HTTP layer -------------------------------------------------------------


# Upper bound on request bodies (covers 1024²×224 float64 cubes with
# headroom). Streaming larger captures should go through the filesystem
# API surfaces, not one HTTP body.
_MAX_BODY_BYTES = 4 << 30


def _make_handler(service: EnhanceService):
    cfg = service.cfg

    class Handler(BaseHTTPRequestHandler):
        # Socket read timeout: a stalled upload must release its handler
        # thread instead of pinning it (and its buffered body) forever.
        timeout = 120

        # Quiet the default per-request stderr lines.
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        def _json(self, code: int, payload: Dict[str, Any]) -> None:
            if code >= 400:
                # Single choke point: every JSON error reply (bad encodings,
                # decode failures, 404s, reload refusals) lands here.
                service.record_error()
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/metrics":
                blob = service.metrics_text().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            elif path == "/health":
                import jax

                self._json(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "channels": service.channels,
                    **service.stats(),
                })
            elif path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802
            parsed = urlparse(self.path)
            if parsed.path == "/reload":
                query = parse_qs(parsed.query)
                target = query.get("checkpoint", [None])[0]
                if target is not None:
                    # Reloading an arbitrary filesystem path is a weight-swap
                    # primitive — gate it behind a shared token so a reachable
                    # port can't point the server at attacker-chosen files or
                    # probe path existence. Token-less servers may still
                    # reload their configured checkpoint (no path choice).
                    token = cfg.serve_reload_token
                    supplied = self.headers.get("X-Reload-Token", "")
                    # compare_digest: constant-time — `!=` would leak token
                    # contents via timing on a reachable port. It raises
                    # TypeError on non-ASCII str input — compare bytes so a
                    # crafted header gets a 403, not a connection reset.
                    ok = token and hmac.compare_digest(
                        supplied.encode("utf-8", "surrogateescape"),
                        token.encode("utf-8", "surrogateescape"),
                    )
                    if not ok:
                        self._json(403, {
                            "error": "reload with an explicit checkpoint path "
                                     "requires a matching X-Reload-Token "
                                     "(config serve_reload_token)"
                        })
                        return
                try:
                    info = service.reload(target)
                    self._json(200, info)
                except (ValueError, FileNotFoundError) as e:
                    self._json(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if parsed.path != "/enhance":
                self._json(404, {"error": f"unknown path {parsed.path}"})
                return
            query = parse_qs(parsed.query)
            key = query.get("key", [cfg.mat_key])[0]
            artifacts = query.get("artifacts", ["0"])[0] in ("1", "true")
            encoding = query.get("encoding", ["mat"])[0]
            compress = query.get("compress", [""])[0]
            if encoding not in WIRE_ENCODINGS:
                self._json(400, {
                    "error": f"unknown encoding {encoding!r} "
                             f"(choices: {', '.join(WIRE_ENCODINGS)})"
                })
                return
            if compress not in ("", "zlib"):
                self._json(400, {
                    "error": f"unknown compress {compress!r} (choices: zlib)"
                })
                return
            if artifacts and encoding != "mat":
                self._json(400, {
                    "error": "artifacts=1 requires encoding=mat (binary "
                             "encodings carry only the enhanced cube)"
                })
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                # Malformed header must yield a 400, not an uncaught
                # ValueError and a reset connection.
                self._json(400, {"error": "invalid Content-Length header"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body; POST a .mat file"})
                return
            if length > _MAX_BODY_BYTES:
                # 413 before reading: a multi-GB Content-Length must not
                # commit the server to buffering it.
                self._json(413, {
                    "error": f"body of {length} bytes exceeds the "
                             f"{_MAX_BODY_BYTES >> 20} MiB limit"
                })
                return
            body = self.rfile.read(length)
            try:
                # bf16/u16 responses also fetch device→host at 2 bytes/value
                # (the d2h link is the latency on slow transports). u16
                # takes the full passthrough: device-quantized uint16
                # straight to the wire, denorm folded into the headers.
                wire = encoding if encoding in ("bf16", "u16") else "f32"
                if encoding == "u16" and not artifacts:
                    wire = "u16_wire"
                req_enc = self.headers.get("X-Cube-Encoding", "mat")
                if (req_enc in ("u16", "bf16")
                        and service.accepts_encoded_requests):
                    # Compact request payloads skip the host f32 expansion:
                    # the 2-byte array uploads as-is and dequantizes
                    # in-graph — halves the h2d leg on slow transports.
                    q, scale, offset = decode_cube_response(
                        body, self.headers, mat_key=key, raw=True)
                    result = service.enhance_encoded(
                        q, req_enc, scale, offset,
                        artifacts=artifacts, wire=wire)
                else:
                    # Request bodies default to .mat; clients on slow uplinks
                    # can instead POST binary cubes (f32/bf16/u16, optionally
                    # deflated) with the same X-Cube-* headers the responses
                    # use — decode_cube_response handles both directions.
                    cube = decode_cube_response(body, self.headers,
                                                mat_key=key)
                    result = service.enhance(cube, artifacts=artifacts,
                                             wire=wire)
            except (KeyError, ValueError) as e:
                # str(KeyError) is the repr of its argument — unwrap so the
                # client sees the message, not a quoted-inside-quoted string.
                msg = e.args[0] if isinstance(e, KeyError) and e.args else str(e)
                self._json(400, {"error": msg})
                return
            except Exception as e:  # noqa: BLE001 — client must get an HTTP error,
                # not a reset socket (corrupt files, device failures, ...).
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if artifacts:
                # artifacts implies encoding=mat (gated above): one container
                # holding S + R/I_low/I_delta.
                payload = {
                    cfg.mat_key_prediction: result["S"],
                    "R_low": result["R_low"],
                    "I_low": result["I_low"],
                    "I_delta": result["I_delta"],
                }
                buf = io.BytesIO()
                import scipy.io as sio

                sio.savemat(buf, payload)
                blob, extra = buf.getvalue(), {}
                if compress == "zlib":
                    import zlib

                    blob = zlib.compress(blob, 1)
                    extra["Content-Encoding"] = "deflate"
            elif "S_wire" in result:
                sw = result["S_wire"]
                blob, extra = encode_cube_prequantized(
                    sw["q"], sw["scale"], sw["offset"], compress)
            else:
                blob, extra = encode_cube(
                    result["S"], encoding, compress,
                    mat_key=cfg.mat_key_prediction,
                )
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(blob)))
            self.send_header("X-Inference-Seconds", f"{result['seconds']:.6f}")
            for h, v in extra.items():
                self.send_header(h, v)
            self.end_headers()
            self.wfile.write(blob)

    return Handler


class EnhanceServer:
    """ThreadingHTTPServer wrapper; ``port=0`` picks an ephemeral port."""

    def __init__(self, service: EnhanceService, host: str = "127.0.0.1", port: int = 8900):
        self.service = service
        self.httpd = ThreadingHTTPServer((host, port), _make_handler(service))
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "EnhanceServer":
        self._serving = True
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        print(f"Serving on http://{self.host}:{self.port} "
              f"(buckets of {self.service.pad_multiple}px)")
        self._serving = True
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        # socketserver's shutdown() waits on an event only serve_forever()
        # sets — calling it on a built-but-never-started server deadlocks
        # the caller (e.g. an error path between construction and start).
        if getattr(self, "_serving", False):
            self.httpd.shutdown()
        self.httpd.server_close()
        if self.service.batcher is not None:
            # Without this the batcher loop thread outlives the server and
            # keeps the service's on-device params pinned via _run_batch.
            self.service.batcher.close()
        if self._thread:
            self._thread.join(timeout=5)


def parse_warmup(spec: str) -> list[Tuple[int, int]]:
    """'512x512,1024x768' → [(512, 512), (1024, 768)]."""
    shapes = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        h, w = part.lower().split("x")
        shapes.append((int(h), int(w)))
    return shapes


def build_server_from_config(cfg: Config, mesh=None) -> "EnhanceServer":
    """Resolve the checkpoint, build the service + server (not yet serving).

    The construction half of ``--phase serve``, separated from the blocking
    accept loop so the wiring (checkpoint resolution via test_timestamp,
    channel checks, warmup) is independently drivable and testable.
    """
    if cfg.device:
        # Standalone `python -m sshslie_tpu.serve` path — main.py applies this
        # before any jax use; do the same here.
        import jax

        jax.config.update("jax_platforms", cfg.device)
    channels = cfg.channels
    if channels is None:
        raise ValueError("phase=serve requires an explicit 'channels' config")
    ckpt = checkpoints.latest_path(cfg.test_model_dir)
    if not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"no checkpoint at {ckpt}; train first or set test_timestamp"
        )
    service = EnhanceService(cfg, channels, checkpoint_path=ckpt, mesh=mesh)
    if cfg.serve_warmup:
        service.warmup(parse_warmup(cfg.serve_warmup))
    return EnhanceServer(service, cfg.serve_host, cfg.serve_port)


def serve_from_config(cfg: Config, mesh=None) -> None:
    """main.py --phase serve entry: load the test checkpoint and serve."""
    build_server_from_config(cfg, mesh=mesh).serve_forever()


if __name__ == "__main__":
    from sshslie_tpu.config import parse_args

    _cfg = parse_args()
    if _cfg.phase != "serve":
        # Force the serve phase and re-derive run names so test_timestamp is
        # adopted for the checkpoint directory (finalize already ran inside
        # parse_args with the YAML's phase).
        _cfg.phase = "serve"
        _cfg.timestamp = ""
        _cfg.finalize()
    serve_from_config(_cfg)
