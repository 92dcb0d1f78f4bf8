"""Serving server: concurrent clients -> micro-batched TPU inference.

The production pattern the reference's latency loop gestures at
(``utils.py:109-134``) but never ships: many clients submit single
frames; a collector thread coalesces them into the predictor's compiled
batch (up to ``max_batch`` frames or ``max_wait_ms``, whichever first),
runs ONE device call, and resolves each client's future with its own
mask.  Device utilization scales with load while per-frame latency stays
bounded by ``max_wait_ms`` + one batch time.

Two layers:

* :class:`MicroBatcher` -- the in-process batching engine over any
  predictor-like object (``predict(frames) -> masks``); use it directly
  when embedding the framework in a service.
* :func:`main` -- a stdlib ThreadingHTTPServer speaking PNG over HTTP
  (``POST /predict`` body = PNG image -> PNG trainId/color mask;
  ``GET /healthz``), built on MicroBatcher.  Zero extra dependencies.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np


class Overloaded(RuntimeError):
    """Raised by :meth:`MicroBatcher.submit` when the pending queue
    exceeds ``max_queue`` (mapped to HTTP 503 by the server)."""


class MicroBatcher:
    """Coalesce concurrent single-frame requests into device batches.

    Args:
      predictor: object with ``predict(frames: (N,H,W,3) uint8) -> (N,H,W)``
        and (for sizing) ``batch_size``/``image_size`` attributes.
      max_batch: largest coalesced batch (default: predictor.batch_size --
        the compiled batch, so no padding waste).
      max_wait_ms: how long the collector waits to fill a batch after the
        first request arrives.  0 = greedy (take whatever is queued).
      pad_to_max: zero-pad every coalesced batch to ``max_batch`` before
        the device call (results are sliced back).  Keeps dynamic-batch
        predictors (e.g. a dynamic AOT artifact) on ONE compiled shape
        instead of recompiling per load-dependent batch size.
    """

    def __init__(self, predictor, max_batch: int | None = None,
                 max_wait_ms: float = 2.0, pad_to_max: bool = True,
                 max_queue: int | None = None):
        self.pad_to_max = bool(pad_to_max)
        self.predictor = predictor
        self.max_batch = int(max_batch or getattr(predictor, "batch_size", 8))
        self.max_wait = max(float(max_wait_ms), 0.0) / 1e3
        # backpressure: refuse new work beyond this queue depth (None =
        # unbounded).  Without it a slow device lets latency grow without
        # limit (measured: p99 13 s under 2x-capacity HTTP load) -- a
        # bounded queue converts overload into fast, explicit rejections
        self.max_queue = None if max_queue is None else int(max_queue)
        self._queue: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        # observability: recent coalesced batch sizes + request latencies
        # (bounded deques; counters are monotonic).  _stats_lock guards
        # every mutation AND the stats() snapshot: sorted()/list() over a
        # deque raises RuntimeError if the collector appends concurrently,
        # which would kill GET /stats exactly when serving is busy
        self._stats_lock = threading.Lock()
        self.batch_sizes = collections.deque(maxlen=1024)
        self.latencies = collections.deque(maxlen=4096)
        self._requests = 0
        self._errors = 0
        self._batches = 0
        self._rejected = 0
        self._thread = threading.Thread(target=self._collector, daemon=True)
        self._thread.start()

    def submit(self, frame: np.ndarray) -> Future:
        """(H, W, 3) uint8 -> Future resolving to the (H, W) int32 mask."""
        if self._closed.is_set():
            raise RuntimeError("MicroBatcher is closed")
        frame = np.asarray(frame, dtype=np.uint8)
        if frame.ndim != 3:
            raise ValueError(f"submit() takes one HWC frame, got shape "
                             f"{frame.shape}")
        # validate the size HERE: a mismatched frame inside a coalesced
        # batch would otherwise fail the whole batch for innocent clients
        expected = getattr(self.predictor, "image_size", None)
        if expected is not None and frame.shape[:2] != tuple(expected):
            raise ValueError(
                f"predictor compiled for {tuple(expected)}, got "
                f"{frame.shape[:2]}")
        if (self.max_queue is not None
                and self._queue.qsize() >= self.max_queue):
            with self._stats_lock:
                self._rejected += 1
            raise Overloaded(
                f"queue depth {self._queue.qsize()} >= max_queue "
                f"{self.max_queue}; retry later")
        fut: Future = Future()
        with self._stats_lock:
            self._requests += 1
        self._queue.put((frame, fut, time.monotonic()))
        if self._closed.is_set():
            # close() may have drained the queue between our check and the
            # put -- sweep again so this future can never be stranded
            self._drain_failed()
        return fut

    def predict(self, frame: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(frame).result()

    def _collect_one_batch(self):
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return None
        if first is None:
            return None
        batch = [first]
        t_end = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = t_end - time.monotonic()
            try:
                item = self._queue.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post the shutdown token
                break
            batch.append(item)
        return batch

    @staticmethod
    def _fail(futures, exc):
        for fut in futures:
            try:
                fut.set_exception(exc)
            except Exception:
                pass  # already resolved/cancelled

    def _collector(self):
        while not self._closed.is_set():
            futures = []
            try:
                batch = self._collect_one_batch()
                if not batch:
                    continue
                # claim the futures: a client cancel after this point can
                # no longer race the result delivery
                claimed = [(frame, fut, t0) for frame, fut, t0 in batch
                           if fut.set_running_or_notify_cancel()]
                if not claimed:
                    continue
                futures = [fut for _, fut, _ in claimed]
                frames = np.stack([frame for frame, _, _ in claimed])
                with self._stats_lock:
                    self.batch_sizes.append(len(claimed))
                    self._batches += 1
                n = frames.shape[0]
                if self.pad_to_max and n < self.max_batch:
                    pad = np.zeros((self.max_batch - n, *frames.shape[1:]),
                                   np.uint8)
                    frames = np.concatenate([frames, pad])
                masks = self.predictor.predict(frames)[:n]
                done = time.monotonic()
                for (_, fut, t0), mask in zip(claimed, masks):
                    try:
                        fut.set_result(np.asarray(mask))
                        with self._stats_lock:
                            self.latencies.append(done - t0)
                    except Exception:
                        pass  # client cancelled mid-flight
            except Exception as e:
                # the collector thread must survive anything (a dead
                # collector strands every future forever); the failed
                # batch's clients get the error
                with self._stats_lock:
                    self._errors += len(futures)
                self._fail(futures, e)
                continue

    def _drain_failed(self):
        """Fail everything still queued (idempotent, thread-safe)."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None and item[1].set_running_or_notify_cancel():
                item[1].set_exception(RuntimeError("MicroBatcher is closed"))

    def stats(self) -> dict:
        """Serving statistics snapshot (for ``GET /stats`` / monitoring):
        monotonic request/batch/error counters plus recent-window mean
        coalesced batch size and p50/p99 end-to-end request latency."""
        with self._stats_lock:
            lat = sorted(self.latencies)
            sizes = list(self.batch_sizes)
            requests, batches = self._requests, self._batches
            errors, rejected = self._errors, self._rejected

        def pct(p):
            return (round(lat[min(int(len(lat) * p), len(lat) - 1)] * 1e3, 3)
                    if lat else None)

        return {
            "requests": requests,
            "batches": batches,
            "errors": errors,
            "rejected": rejected,
            "queued": self._queue.qsize(),
            "max_batch": self.max_batch,
            "mean_batch_size": (round(sum(sizes) / len(sizes), 2)
                                if sizes else None),
            "latency_p50_ms": pct(0.50),
            "latency_p99_ms": pct(0.99),
        }

    def close(self):
        """Stop the collector; pending/late requests fail fast."""
        self._closed.set()
        self._queue.put(None)
        self._thread.join(timeout=5)
        self._drain_failed()  # strand nothing


def make_http_server(batcher: MicroBatcher, host: str = "127.0.0.1",
                     port: int = 8000, colored: bool = False):
    """ThreadingHTTPServer: POST /predict (PNG in -> PNG mask out),
    GET /healthz.  Frames are resized on host to the compiled size."""
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    size = tuple(batcher.predictor.image_size)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stats":
                import json

                body = json.dumps(batcher.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                ctype = self.headers.get("Content-Type", "")
                raw = ctype.startswith("application/octet-stream")
                if raw:
                    # raw fast path: exactly H*W*3 uint8 bytes at the
                    # compiled size, response = H*W uint8 mask bytes.
                    # PNG codec work dominated the measured HTTP serving
                    # cost (~300x the device time at 1024x2048) -- this
                    # path skips it entirely on both sides
                    expected = size[0] * size[1] * 3
                    if length != expected:
                        self.send_error(
                            400, f"octet-stream body must be exactly "
                                 f"{expected} bytes (H*W*3 uint8 at the "
                                 f"compiled size {size})")
                        return
                    frame = np.frombuffer(self.rfile.read(length),
                                          np.uint8).reshape(*size, 3)
                else:
                    img = Image.open(io.BytesIO(self.rfile.read(length)))
                    img = img.convert("RGB")
                    if img.size != (size[1], size[0]):
                        img = img.resize((size[1], size[0]), Image.BILINEAR)
                    frame = np.asarray(img, dtype=np.uint8)
                mask = batcher.submit(frame).result(timeout=60)
                if raw:
                    body = np.ascontiguousarray(
                        mask.astype(np.uint8)).tobytes()
                    content_type = "application/octet-stream"
                elif colored:
                    from rtsds_tpu.serve import colorize_masks

                    buf = io.BytesIO()
                    Image.fromarray(colorize_masks(mask)).save(buf, "PNG")
                    body = buf.getvalue()
                    content_type = "image/png"
                else:
                    buf = io.BytesIO()
                    Image.fromarray(mask.astype(np.uint8),
                                    mode="L").save(buf, "PNG")
                    body = buf.getvalue()
                    content_type = "image/png"
                self.send_response(200)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Overloaded as e:
                self.send_error(503, " ".join(str(e).split())[:200])
            except Exception as e:
                # one line only: newlines in the status line would split
                # the HTTP response
                msg = " ".join(str(e).split())[:200] or "internal error"
                self.send_error(500, msg)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    """``python -m rtsds_tpu.serve_server --port 8000 [--checkpoint DIR |
    --artifact PATH]`` -- segmentation-as-a-service on one chip."""
    import argparse

    parser = argparse.ArgumentParser(
        description="RTSDS-TPU micro-batching inference server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--artifact", default=None,
                        help="serve from an AOT artifact (serve_export.py)")
    parser.add_argument("--model", default="bisenet",
                        choices=["bisenet", "deeplab"])
    parser.add_argument("--backbone", default="resnet18")
    parser.add_argument("--size", default="1024, 2048")
    parser.add_argument("--batch", type=int, default=8,
                        help="compiled micro-batch size")
    parser.add_argument("--max_wait_ms", type=float, default=2.0)
    parser.add_argument("--max_queue", type=int, default=None,
                        help="backpressure: reject (HTTP 503) when this "
                             "many requests are already queued; default "
                             "unbounded")
    parser.add_argument("--colored", action="store_true")
    parser.add_argument("--protocol", default="plain",
                        choices=["plain", "ensemble", "sliding"],
                        help="inference protocol (see rtsds_tpu.serve)")
    parser.add_argument("--scales", default="0.75, 1.0, 1.25",
                        help='ensemble scales "s1, s2, ..."')
    parser.add_argument("--window", default="512, 1024",
                        help='sliding window "H, W"')
    parser.add_argument("--stride", default="",
                        help='sliding stride "H, W" (default 3/4 window)')
    parser.add_argument("--window_chunk", type=int, default=0,
                        help="max sliding windows stacked per forward; "
                             "0 = all in one batched forward")
    parser.add_argument("--mesh", default=None, choices=["batch", "spatial"],
                        help="serve across ALL visible chips: 'batch' "
                             "shards each micro-batch over chips "
                             "(throughput), 'spatial' shards image height "
                             "(single-frame latency)")
    parser.add_argument("--compilation_cache", default=None, metavar="DIR",
                        help="persistent XLA compile cache: restarted "
                             "servers skip the minutes-long first compile")
    parser.add_argument("--quantize", default=None, choices=["int8"],
                        help="serve through the W8A8 quantized path "
                             "(needs --calib_images)")
    parser.add_argument("--calib_images", nargs="*", default=None,
                        metavar="PNG",
                        help="representative frames to calibrate the int8 "
                             "activation scales (resized to --size)")
    parser.add_argument("--calib_stat", default="max",
                        choices=["max", "percentile"],
                        help="activation-scale statistic: max-abs or an "
                             "outlier-robust percentile (PERF.md ablation)")
    parser.add_argument("--calib_percentile", type=float, default=99.9,
                        help="percentile for --calib_stat percentile")
    parser.add_argument("--recalibrate", action="store_true",
                        help="ignore a QAT act-scales sidecar in the "
                             "checkpoint and recalibrate from "
                             "--calib_images (otherwise the sidecar takes "
                             "precedence over --calib_stat/"
                             "--calib_percentile)")
    args = parser.parse_args(argv)

    if args.quantize:
        if args.artifact:
            parser.error("--quantize happens at predictor build time; "
                         "the artifact is already a compiled program")
        if not args.calib_images:
            if args.recalibrate:
                parser.error("--recalibrate needs --calib_images to "
                             "calibrate from")
            # a QAT write-back checkpoint carries its own scales sidecar
            has_sidecar = False
            if args.checkpoint:
                from rtsds_tpu.train.qat import load_act_scales

                has_sidecar = load_act_scales(args.checkpoint) is not None
            if not has_sidecar:
                parser.error("--quantize needs --calib_images (or a QAT "
                             "checkpoint carrying qat_act_scales.json)")

    if args.compilation_cache:
        from rtsds_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    if args.artifact:
        if args.mesh:
            parser.error("--mesh is live multi-chip serving; AOT artifacts "
                         "are single-device programs")
        from rtsds_tpu.serve_export import load_predictor

        predictor = load_predictor(args.artifact)
        max_batch = (args.batch if predictor.batch == "dynamic"
                     else int(predictor.batch))
    else:
        from rtsds_tpu.serve import Predictor

        size = tuple(int(v) for v in args.size.replace(" ", "").split(","))
        from rtsds_tpu.serve import protocol_kwargs_from_flags

        protocol_kwargs = protocol_kwargs_from_flags(
            args.protocol, args.scales, args.window, args.stride,
            args.window_chunk)
        kwargs = dict(model_name=args.model, image_size=size,
                      batch_size=args.batch, backbone=args.backbone,
                      protocol=args.protocol,
                      protocol_kwargs=protocol_kwargs)
        if args.quantize:
            kwargs["quantize"] = args.quantize
            if args.calib_images:
                from rtsds_tpu.data.pipeline import decode_image

                kwargs["calib_frames"] = np.stack(
                    [decode_image(p, size) for p in args.calib_images])
            kwargs["calib_stat"] = args.calib_stat
            kwargs["calib_percentile"] = args.calib_percentile
            if args.recalibrate and args.checkpoint:
                kwargs["use_qat_scales"] = False
        if args.mesh:
            from rtsds_tpu.parallel.mesh import make_mesh

            kwargs["mesh"] = make_mesh(
                batch_size=args.batch if args.mesh == "batch" else None)
            kwargs["sharding"] = args.mesh
        if args.checkpoint:
            predictor = Predictor.from_checkpoint(args.checkpoint, **kwargs)
        else:
            print("serve_server: no --checkpoint, serving RANDOM weights")
            predictor = Predictor(**kwargs)
        max_batch = args.batch

    # compile up front (minutes on TPU), for BOTH paths, at the exact
    # padded shape the batcher will use -- requests never hit a cold chip
    print("serve_server: warming up (first compile)...")
    predictor.predict(np.zeros(
        (max_batch, *predictor.image_size, 3), np.uint8))

    batcher = MicroBatcher(predictor, max_batch=max_batch,
                           max_wait_ms=args.max_wait_ms,
                           max_queue=args.max_queue)
    server = make_http_server(batcher, host=args.host, port=args.port,
                              colored=args.colored)
    restore_sigterm = _install_graceful_shutdown(server)
    print(f"serving on http://{args.host}:{args.port}/predict "
          f"(micro-batch <= {max_batch}, wait {args.max_wait_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.close()
        restore_sigterm()


def _install_graceful_shutdown(server):
    """SIGTERM -> stop accepting, drain in-flight requests, exit 0 (the
    serving analog of training's ``utils/preemption.py``).  The handler
    must call ``shutdown()`` from ANOTHER thread: signals are delivered
    on the main thread, which is inside ``serve_forever`` -- a same-
    thread shutdown() deadlocks.  Returns a restore function; no-op when
    not on the main thread (e.g. under a test runner)."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return lambda: None

    def handler(signum, frame):
        print("serve_server: SIGTERM -- draining in-flight requests "
              "and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    previous = signal.signal(signal.SIGTERM, handler)
    return lambda: signal.signal(signal.SIGTERM, previous)


if __name__ == "__main__":
    main()
