"""Driver benchmark: BiSeNet 1024x2048 real-time inference FPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the 200 FPS/chip v5e target from BASELINE.md (the reference
publishes no numbers of its own; literature GPU baselines are 65-105 FPS).
``vs_baseline`` is value / 200.

Env knobs: BENCH_BATCH (default 64), BENCH_ITERS (default 4),
BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from rtsds_tpu.bench.latency import bisenet_inference_benchmark

    stats = bisenet_inference_benchmark(
        image_size=(1024, 2048), batch_size=batch, iterations=iters,
        repeats=repeats, warmup=1)

    # MFU against the v5e bf16 peak (197 TFLOP/s/chip); flops from the HLO
    flops = stats.get("flops_per_call", float("nan"))
    mean_s = stats["mean_ms"] / 1e3
    mfu = flops / mean_s / 197e12 if flops == flops and mean_s > 0 else None

    result = {
        "metric": "bisenet_1024x2048_inference_fps_per_chip",
        "value": round(stats["fps"], 2),
        "unit": "images/sec",
        "vs_baseline": round(stats["fps"] / 200.0, 3),
        "p50_ms": round(stats["p50_ms"], 3),          # per batch call
        "p50_ms_per_image": round(stats["p50_ms"] / batch, 3),
        "p99_ms": round(stats["p99_ms"], 3),
        "batch_size": batch,
        "dtype": stats["dtype"],
        "flops_per_image": (round(flops / batch) if flops == flops else None),
        "mfu_vs_v5e_bf16_peak": (round(mfu, 4) if mfu is not None else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
