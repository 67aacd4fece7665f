"""HTTP serving front end (streaming/http_server.py): request/response
contract, micro-batch aggregation, error paths, metrics."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from d3roma_tpu.streaming import InferenceHTTPServer


def _infer_batch_stub(frames):
    """Depth 'model': returns raw_depth + mean(rgb)/255 per frame —
    enough structure to verify per-frame routing through a batch."""
    return [raw + np.float32(rgb.mean() / 255.0) for rgb, raw in frames]


def _post_npz(port, rgb, raw_depth, path="/v1/infer_rgb_raw"):
    buf = io.BytesIO()
    np.savez_compressed(buf, rgb=rgb, raw_depth=raw_depth)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=buf.getvalue(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read()


@pytest.fixture
def server():
    s = InferenceHTTPServer(_infer_batch_stub, max_batch=4, max_wait_ms=20)
    port = s.start()
    yield s, port
    s.stop()


def test_infer_roundtrip(server):
    _, port = server
    rgb = np.full((8, 12, 3), 255, np.uint8)
    raw = np.arange(96, dtype=np.float32).reshape(8, 12)
    status, body = _post_npz(port, rgb, raw)
    assert status == 200
    depth = np.load(io.BytesIO(body))["depth"]
    np.testing.assert_allclose(depth, raw + 1.0, rtol=1e-6)


def test_concurrent_requests_micro_batch(server):
    s, port = server
    rgb = np.zeros((4, 4, 3), np.uint8)
    results = {}

    def call(i):
        raw = np.full((4, 4), float(i), np.float32)
        _, body = _post_npz(port, rgb, raw)
        results[i] = np.load(io.BytesIO(body))["depth"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        np.testing.assert_allclose(results[i], float(i))  # no cross-talk
    m = s.metrics
    assert m["frames_served"] == 8
    # 8 concurrent frames at max_batch=4 must NOT take 8 batches
    assert m["batches"] < 8


def test_healthz_and_metrics(server):
    _, port = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"
    rgb = np.zeros((4, 4, 3), np.uint8)
    _post_npz(port, rgb, np.ones((4, 4), np.float32))
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
        m = json.loads(r.read())
    assert m["requests"] == 1 and m["errors"] == 0
    assert "latency_ms" in m and m["latency_ms"]["p50"] >= 0


def test_bad_payload_is_400(server):
    _, port = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/infer_rgb_raw",
        data=b"not an npz", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    # missing key
    buf = io.BytesIO()
    np.savez_compressed(buf, rgb=np.zeros((2, 2, 3), np.uint8))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/infer_rgb_raw", data=buf.getvalue(),
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_model_failure_is_500_and_counted():
    def boom(frames):
        raise RuntimeError("device fell over")

    s = InferenceHTTPServer(boom, max_batch=2, max_wait_ms=5)
    port = s.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npz(port, np.zeros((2, 2, 3), np.uint8),
                      np.ones((2, 2), np.float32))
        assert ei.value.code == 500
        assert json.loads(ei.value.read())["error"].startswith("RuntimeError")
        assert s.metrics["errors"] == 1
    finally:
        s.stop()


def test_unknown_path_404(server):
    _, port = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/nope", timeout=10)
    assert ei.value.code == 404


def test_malformed_arrays_are_400_not_batched(server):
    """Shape/dtype validation happens per request BEFORE the micro-batch:
    a malformed frame must get 400 and never poison co-batched clients."""
    s, port = server
    good_raw = np.ones((4, 4), np.float32)
    cases = [
        (np.zeros((3, 4, 4), np.uint8), good_raw),          # channel-first
        (np.zeros((4, 4, 3), np.float32), good_raw),        # float rgb
        (np.zeros((4, 4, 3), np.uint8), good_raw.ravel()),  # 1-D depth
        (np.zeros((4, 4, 3), np.uint8),
         np.ones((8, 8), np.float32)),                      # H,W mismatch
        (np.zeros((4, 4, 3), np.uint8),
         np.ones((4, 4), np.int32)),                        # int depth
    ]
    for rgb, raw in cases:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npz(port, rgb, raw)
        assert ei.value.code == 400, (rgb.shape, rgb.dtype, raw.shape)
    # none of them reached the model
    assert s.metrics["batched_items"] == 0
    # and a well-formed frame still works afterwards
    status, _ = _post_npz(port, np.zeros((4, 4, 3), np.uint8), good_raw)
    assert status == 200


def test_float_rgb_rejected_not_truncated():
    """float [0,1] rgb must 400, not be C-truncated to a black image and
    served as a plausible 200."""
    seen = []

    def record(frames):
        seen.extend(frames)
        return [raw for _, raw in frames]

    s = InferenceHTTPServer(record, max_batch=2, max_wait_ms=5)
    port = s.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npz(port, np.random.rand(4, 4, 3).astype(np.float32),
                      np.ones((4, 4), np.float32))
        assert ei.value.code == 400
        assert "uint8" in json.loads(ei.value.read())["error"]
        assert seen == []
    finally:
        s.stop()


def test_stalled_model_times_out_504():
    hang = threading.Event()

    def stall(frames):
        hang.wait(30)
        return [raw for _, raw in frames]

    s = InferenceHTTPServer(stall, max_batch=2, max_wait_ms=5,
                            request_timeout_s=0.3)
    port = s.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npz(port, np.zeros((2, 2, 3), np.uint8),
                      np.ones((2, 2), np.float32))
        assert ei.value.code == 504
        assert s.metrics["errors"] == 1
    finally:
        hang.set()
        s.stop()


def test_healthz_warming_until_warmup_done():
    release = threading.Event()
    done = threading.Event()

    def slow_first(frames):
        release.wait(30)
        done.set()
        return [raw for _, raw in frames]

    warm = (np.zeros((2, 2, 3), np.uint8), np.ones((2, 2), np.float32))
    s = InferenceHTTPServer(slow_first, max_batch=2, max_wait_ms=5,
                            warmup_input=warm)
    port = s.start()
    try:
        # warm-up inference is still inside the model: not ready
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10)
        assert ei.value.code == 503
        assert json.loads(ei.value.read())["status"] == "warming"
        release.set()
        assert done.wait(10)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
                    assert json.loads(r.read())["status"] == "ok"
                    break
            except urllib.error.HTTPError:
                time.sleep(0.02)
        else:
            raise AssertionError("healthz never became ready")
    finally:
        release.set()
        s.stop()
