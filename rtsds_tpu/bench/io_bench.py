"""Host input-pipeline throughput bench: PNG decode (+resize) FPS.

The serving gate is >292 FPS/chip at 1024x2048 (BENCH_r01); the host
pipeline must at least match that or training/serving starves.  The
reference hides this cost in 4 torchvision DataLoader worker processes
(``main.py:101-106``); ours is one C++ call per batch with an internal
thread pool (``native/rtsds_host_ops.cpp``).

Run: ``python -m rtsds_tpu.bench.io_bench`` (env: IO_N, IO_THREADS, IO_HW).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def io_benchmark(n_images: int = 24, hw=(1024, 2048), out_hw=None,
                 n_threads: int = 8, repeats: int = 3) -> dict:
    from PIL import Image

    from rtsds_tpu.data import native
    from rtsds_tpu.data.pipeline import decode_image

    out_hw = tuple(out_hw or hw)
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n_images):
            # structured content (realistic PNG entropy, not white noise)
            base = rng.integers(0, 256, size=(hw[0] // 16, hw[1] // 16, 3),
                                dtype=np.uint8)
            img = np.kron(base, np.ones((16, 16, 1), dtype=np.uint8))
            p = os.path.join(d, f"{i}.png")
            Image.fromarray(img).save(p)
            paths.append(p)

        result: dict = {"n_images": n_images, "hw": list(hw),
                        "out_hw": list(out_hw), "threads": n_threads,
                        # decode thread-scales across cores; report count so
                        # single-core CI numbers aren't misread (real v5e
                        # hosts have >100 vCPUs)
                        "host_cores": os.cpu_count(),
                        "native_available": native.png_available()}

        if native.png_available():
            native.decode_image_batch(paths[:2], out_hw)  # warm
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = native.decode_image_batch(paths, out_hw,
                                                n_threads=n_threads)
                times.append(time.perf_counter() - t0)
                assert out is not None
            best = min(times)
            result["native_fps"] = n_images / best
            result["native_ms_per_image"] = best / n_images * 1e3

        t0 = time.perf_counter()
        for p in paths:
            decode_image(p, out_hw)
        pil = time.perf_counter() - t0
        result["pil_fps"] = n_images / pil
        if "native_fps" in result:
            result["speedup_vs_pil"] = result["native_fps"] / result["pil_fps"]
        return result


def main():
    n = int(os.environ.get("IO_N", "24"))
    threads = int(os.environ.get("IO_THREADS", "8"))
    hw = tuple(int(v) for v in os.environ.get("IO_HW", "1024,2048").split(","))
    stats = io_benchmark(n_images=n, hw=hw, n_threads=threads)
    print(json.dumps({
        "metric": "host_png_decode_fps_1024x2048",
        "value": round(stats.get("native_fps", stats["pil_fps"]), 1),
        "unit": "images/sec",
        **{k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in stats.items()},
    }))


if __name__ == "__main__":
    main()
