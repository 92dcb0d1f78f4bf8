"""Micro-batching serving server (serve_server.py): request coalescing,
per-client result routing, error propagation, and the HTTP surface."""

import io
import threading
import time
import urllib.request

import numpy as np
import pytest


class _FakePredictor:
    """Records batch sizes; mask = mean of each frame (identifies it)."""

    batch_size = 4
    image_size = (8, 12)

    def __init__(self, fail: bool = False, delay: float = 0.0):
        self.fail = fail
        self.delay = delay
        self.batches = []

    def predict(self, frames):
        if self.fail:
            raise RuntimeError("device on fire")
        if self.delay:
            time.sleep(self.delay)
        self.batches.append(frames.shape[0])
        fill = frames.reshape(frames.shape[0], -1).mean(axis=1).astype(np.int32)
        return np.broadcast_to(fill[:, None, None],
                               (frames.shape[0], *self.image_size)).copy()


def _frame(v):
    return np.full((8, 12, 3), v, np.uint8)


def test_microbatcher_routes_results_to_the_right_client():
    from rtsds_tpu.serve_server import MicroBatcher

    pred = _FakePredictor(delay=0.02)
    mb = MicroBatcher(pred, max_wait_ms=20)
    try:
        futures = {v: mb.submit(_frame(v)) for v in (3, 60, 200, 117, 9)}
        for v, fut in futures.items():
            mask = fut.result(timeout=10)
            assert mask.shape == (8, 12)
            assert int(mask[0, 0]) == v  # each client got ITS frame's mask
    finally:
        mb.close()


def test_microbatcher_coalesces_under_load():
    from rtsds_tpu.serve_server import MicroBatcher

    pred = _FakePredictor(delay=0.05)
    mb = MicroBatcher(pred, max_batch=4, max_wait_ms=30)
    try:
        futures = [mb.submit(_frame(i)) for i in range(12)]
        for fut in futures:
            fut.result(timeout=20)
        # 12 requests against a busy device must coalesce: strictly fewer
        # device calls than requests, none exceeding the compiled batch
        sizes = list(mb.batch_sizes)
        assert len(sizes) < 12
        assert max(sizes) <= 4
        assert sum(sizes) == 12
        # pad_to_max keeps the device on ONE compiled shape
        assert set(pred.batches) == {4}
    finally:
        mb.close()


def test_microbatcher_propagates_errors():
    from rtsds_tpu.serve_server import MicroBatcher

    mb = MicroBatcher(_FakePredictor(fail=True), max_wait_ms=1)
    try:
        fut = mb.submit(_frame(1))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=10)
        # the collector survives a failing batch and serves the next one
        fut2 = mb.submit(_frame(2))
        with pytest.raises(RuntimeError):
            fut2.result(timeout=10)
    finally:
        mb.close()


def test_microbatcher_rejects_batched_input_and_close():
    from rtsds_tpu.serve_server import MicroBatcher

    mb = MicroBatcher(_FakePredictor(), max_wait_ms=1)
    with pytest.raises(ValueError, match="HWC"):
        mb.submit(np.zeros((2, 8, 12, 3), np.uint8))
    # a wrong-size frame is rejected at submit, BEFORE it can poison a
    # coalesced batch shared with innocent clients
    with pytest.raises(ValueError, match="compiled for"):
        mb.submit(np.zeros((16, 24, 3), np.uint8))
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(_frame(1))


def test_microbatcher_survives_cancelled_futures():
    from rtsds_tpu.serve_server import MicroBatcher

    pred = _FakePredictor(delay=0.05)
    mb = MicroBatcher(pred, max_wait_ms=20)
    try:
        futs = [mb.submit(_frame(v)) for v in (1, 2, 3)]
        futs[1].cancel()  # may or may not land before the claim
        results = []
        for i, fut in enumerate(futs):
            if fut.cancelled():
                continue
            results.append((i, fut.result(timeout=10)))
        # collector is still alive and serving
        assert int(mb.predict(_frame(77))[0, 0]) == 77
    finally:
        mb.close()


def test_http_server_end_to_end():
    from PIL import Image

    from rtsds_tpu.serve_server import MicroBatcher, make_http_server

    pred = _FakePredictor()
    mb = MicroBatcher(pred, max_wait_ms=1)
    server = make_http_server(mb, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert r.read() == b"ok"

        buf = io.BytesIO()
        Image.fromarray(_frame(42)).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            mask = np.asarray(Image.open(io.BytesIO(r.read())))
        assert mask.shape == (8, 12)
        assert int(mask[0, 0]) == 42

        # wrong-size input is host-resized, not rejected
        buf = io.BytesIO()
        Image.fromarray(np.full((30, 40, 3), 90, np.uint8)).save(
            buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            mask = np.asarray(Image.open(io.BytesIO(r.read())))
        assert mask.shape == (8, 12)
    finally:
        server.shutdown()
        mb.close()


@pytest.mark.slow
def test_microbatcher_with_real_predictor():
    from rtsds_tpu.serve import Predictor
    from rtsds_tpu.serve_server import MicroBatcher

    pred = Predictor(model_name="bisenet", image_size=(64, 128),
                     batch_size=2, num_classes=19)
    mb = MicroBatcher(pred, max_wait_ms=50)
    try:
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (3, 64, 128, 3), np.uint8)
        futs = [mb.submit(f) for f in frames]
        masks = np.stack([f.result(timeout=300) for f in futs])
        np.testing.assert_array_equal(masks, pred.predict(frames))
    finally:
        mb.close()

def test_server_main_mesh_batch(tmp_path, monkeypatch):
    """--mesh batch reaches Predictor through serve_server.main: the
    warmup predict fans over the 8-device mesh, then one real request
    round-trips (serve_forever stubbed to a single handle_request)."""
    import threading
    import urllib.request

    from rtsds_tpu import serve_server

    served = {}
    real_make = serve_server.make_http_server

    def one_shot_make(batcher, host, port, colored=False):
        import time

        server = real_make(batcher, host=host, port=0, colored=colored)

        def one_request_then_drain():
            # ThreadingHTTPServer.handle_request returns once the handler
            # THREAD starts; wait for the client to actually receive its
            # response before main proceeds to batcher.close()
            server.handle_request()
            for _ in range(600):
                if "status" in served or "error" in served:
                    return
                time.sleep(0.1)

        server.serve_forever = one_request_then_drain
        server.shutdown = lambda: None  # not inside the real loop
        served["server"] = server
        return server

    monkeypatch.setattr(serve_server, "make_http_server", one_shot_make)

    def post():
        import io
        import time

        import numpy as np
        from PIL import Image

        for _ in range(600):  # wait until main built + bound the server
            if "server" in served:
                break
            time.sleep(0.1)
        port = served["server"].server_address[1]
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(buf, "PNG")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
                    timeout=120) as r:
                body = r.read()  # read BEFORE recording status: 'status'
                served["body"] = body  # in served releases the server
                served["status"] = r.status
        except Exception as e:  # surfaced by the final assert
            served["error"] = repr(e)

    t = threading.Thread(target=post, daemon=True)
    t.start()
    serve_server.main(["--host", "127.0.0.1", "--port", "0",
                       "--size", "16, 32", "--batch", "8",
                       "--mesh", "batch"])
    t.join(timeout=120)
    assert "error" not in served, served["error"]
    assert served.get("status") == 200 and served.get("body")


def test_server_main_mesh_rejects_artifact():
    import pytest

    from rtsds_tpu import serve_server

    with pytest.raises(SystemExit):
        serve_server.main(["--artifact", "x.rtsds", "--mesh", "batch"])


def test_stats_counters_and_latency():
    from rtsds_tpu.serve_server import MicroBatcher

    mb = MicroBatcher(_FakePredictor(), max_wait_ms=1.0)
    try:
        futs = [mb.submit(_frame(i)) for i in range(6)]
        for f in futs:
            f.result(timeout=10)
        s = mb.stats()
        assert s["requests"] == 6
        assert s["batches"] >= 2  # max_batch 4 -> at least two batches
        assert s["errors"] == 0
        assert s["max_batch"] == 4
        assert 1 <= s["mean_batch_size"] <= 4
        assert s["latency_p50_ms"] is not None
        assert 0 < s["latency_p50_ms"] <= s["latency_p99_ms"] + 1e-9
    finally:
        mb.close()

    # errors counted
    mb = MicroBatcher(_FakePredictor(fail=True), max_wait_ms=0.0)
    try:
        fut = mb.submit(_frame(1))
        with pytest.raises(RuntimeError):
            fut.result(timeout=10)
        assert mb.stats()["errors"] == 1
    finally:
        mb.close()


def test_http_stats_endpoint():
    import json

    from rtsds_tpu.serve_server import MicroBatcher, make_http_server

    mb = MicroBatcher(_FakePredictor(), max_wait_ms=0.0)
    server = make_http_server(mb, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(_frame(3)).save(buf, format="PNG")
        urllib.request.urlopen(f"http://127.0.0.1:{port}/predict",
                               data=buf.getvalue(), timeout=10).read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1 and stats["errors"] == 0
        assert stats["latency_p50_ms"] is not None
    finally:
        server.shutdown()
        mb.close()


def test_sigterm_graceful_shutdown():
    """SIGTERM triggers server.shutdown() from another thread and the
    previous handler is restored afterwards."""
    import os
    import signal

    from rtsds_tpu.serve_server import _install_graceful_shutdown

    done = threading.Event()

    class FakeServer:
        def shutdown(self):
            done.set()

    previous = signal.getsignal(signal.SIGTERM)
    restore = _install_graceful_shutdown(FakeServer())
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        assert done.wait(timeout=10)
    finally:
        restore()
    assert signal.getsignal(signal.SIGTERM) is previous


def test_http_raw_octet_stream_roundtrip():
    """application/octet-stream skips both PNG codecs: H*W*3 uint8 in,
    H*W uint8 mask out; wrong byte count is a 400, not a batch poison."""
    from rtsds_tpu.serve_server import MicroBatcher, make_http_server

    mb = MicroBatcher(_FakePredictor(), max_wait_ms=0.0)
    server = make_http_server(mb, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        frame = _frame(37)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=frame.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.headers["Content-Type"] == "application/octet-stream"
            mask = np.frombuffer(r.read(), np.uint8).reshape(8, 12)
        assert int(mask[0, 0]) == 37

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"\x00" * 10,
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        mb.close()


def test_backpressure_rejects_when_queue_full():
    """max_queue converts overload into fast Overloaded rejections
    (HTTP 503) instead of unbounded latency; stats counts them."""
    from rtsds_tpu.serve_server import MicroBatcher, Overloaded

    pred = _FakePredictor(delay=0.2)  # slow device so the queue builds
    mb = MicroBatcher(pred, max_batch=2, max_wait_ms=0.0, max_queue=3)
    try:
        futs = []
        rejected = 0
        for v in range(20):
            try:
                futs.append(mb.submit(_frame(v % 200)))
            except Overloaded:
                rejected += 1
        assert rejected > 0
        for f in futs:
            f.result(timeout=30)  # accepted work still completes
        assert mb.stats()["rejected"] == rejected
        # queue drained: accepting again
        assert mb.predict(_frame(5)) is not None
    finally:
        mb.close()


def test_backpressure_http_503():
    import urllib.error

    from rtsds_tpu.serve_server import MicroBatcher, make_http_server

    pred = _FakePredictor(delay=0.3)
    mb = MicroBatcher(pred, max_batch=1, max_wait_ms=0.0, max_queue=1)
    server = make_http_server(mb, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        frame = _frame(9).tobytes()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=frame,
                headers={"Content-Type": "application/octet-stream"})
            return urllib.request.urlopen(req, timeout=30)

        results = []

        def worker():
            try:
                with post() as r:
                    results.append(r.status)
            except urllib.error.HTTPError as e:
                results.append(e.code)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert 503 in results  # overload rejected fast
        assert 200 in results  # accepted work served
    finally:
        server.shutdown()
        mb.close()


def test_stats_is_safe_under_concurrent_mutation():
    """GET /stats must never die while the collector appends: hammer
    stats() from one thread while a client floods submits — an unguarded
    deque raises RuntimeError('deque mutated during iteration') here."""
    from rtsds_tpu.serve_server import MicroBatcher

    mb = MicroBatcher(_FakePredictor(), max_wait_ms=0.0)
    stop = threading.Event()
    errors = []

    def hammer_stats():
        while not stop.is_set():
            try:
                s = mb.stats()
                assert s["requests"] >= 0
            except Exception as e:  # pragma: no cover - the failure mode
                errors.append(e)
                return

    t = threading.Thread(target=hammer_stats)
    t.start()
    try:
        futs = [mb.submit(_frame(v % 251)) for v in range(400)]
        for fut in futs:
            fut.result(timeout=30)
    finally:
        stop.set()
        t.join(timeout=10)
        mb.close()
    assert not errors, errors
    s = mb.stats()
    assert s["requests"] == 400
    assert s["latency_p50_ms"] is not None


def test_server_main_quantize_flags(tmp_path):
    """--quantize int8 flag validation is pure (before any model work);
    a valid invocation builds the quantized predictor (construction
    checked via the Predictor error surface, not a full server run)."""
    import pytest

    from rtsds_tpu import serve_server

    with pytest.raises(SystemExit):  # artifact conflicts
        serve_server.main(["--artifact", "x.rtsds", "--quantize", "int8",
                           "--calib_images", "a.png"])
    with pytest.raises(SystemExit):  # missing calib images
        serve_server.main(["--model", "deeplab", "--quantize", "int8"])
    with pytest.raises(SystemExit):  # missing calib images (bisenet is
        serve_server.main(["--quantize", "int8"])  # accepted since r4)


def test_server_main_quantize_serves(tmp_path, monkeypatch):
    """A quantized server round-trips one request (same one-shot harness
    as the mesh test)."""
    import io
    import threading
    import time
    import urllib.request

    import numpy as np
    from PIL import Image

    from rtsds_tpu import serve_server

    calib = tmp_path / "calib.png"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (16, 32, 3), dtype=np.uint8)).save(calib)

    served = {}
    real_make = serve_server.make_http_server

    def one_shot_make(batcher, host, port, colored=False):
        server = real_make(batcher, host=host, port=0, colored=colored)

        def one_request_then_drain():
            server.handle_request()
            for _ in range(600):
                if "status" in served or "error" in served:
                    return
                time.sleep(0.1)

        server.serve_forever = one_request_then_drain
        server.shutdown = lambda: None
        served["server"] = server
        return server

    monkeypatch.setattr(serve_server, "make_http_server", one_shot_make)

    def post():
        for _ in range(600):
            if "server" in served:
                break
            time.sleep(0.1)
        port = served["server"].server_address[1]
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(buf, "PNG")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
                    timeout=120) as r:
                body = r.read()
                served["body"] = body
                served["status"] = r.status
        except Exception as e:
            served["error"] = repr(e)

    t = threading.Thread(target=post, daemon=True)
    t.start()
    serve_server.main(["--host", "127.0.0.1", "--port", "0",
                       "--size", "16, 32", "--batch", "2",
                       "--model", "deeplab", "--quantize", "int8",
                       "--calib_images", str(calib)])
    t.join(timeout=120)
    assert "error" not in served, served["error"]
    assert served.get("status") == 200 and served.get("body")
