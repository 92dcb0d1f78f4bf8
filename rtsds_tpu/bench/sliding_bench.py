"""Sliding-window panorama serving: bf16 vs W8A8 int8, whole-chain.

The round-3 probe measured bf16 sliding inference over a 2048x4096
panorama (9 windows of 1024x2048, 25% overlap) at 97.1 ms/frame on one
chip (PERF.md).  Round 5 composes the sliding protocol with the int8
serving path (``tests/test_quant.py::test_quantize_composes_with_
sliding_protocol`` proves numerics); this bench answers what the
composition is worth on hardware: each window forward rides the W8A8
BiSeNet path (``models/bisenet_int8.py``) that wins 1.25x at b48, but
sliding runs windows at n=1 inside one program -- closer to the b1
regime where int8 measured only 1.04x (PERF.md round-5 probe), with 9
windows sharing one dispatch.

Run (one TPU process): ``python -m rtsds_tpu.bench.sliding_bench``.
Env: SL_IMAGE ("2048,4096"), SL_WINDOW ("1024,2048"), SL_BATCH (1),
SL_ITERS (4), SL_REPEATS (2), SL_MODEL (bisenet), SL_INT8 (1),
SL_CHUNK (0 = all windows in one batched forward; 1 = the sequential
per-window schedule, for A/B).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from rtsds_tpu.bench.latency import latency_benchmark


def bench_sliding(image_size=(2048, 4096), window=(1024, 2048), batch=1,
                  iterations=4, repeats=2, model_name="bisenet",
                  include_int8=True, window_chunk=None):
    """Time the full sliding predict (windows + softmax blend + argmax,
    ONE jit program) in bf16 and, optionally, through the int8 path.
    ``window_chunk=1`` reproduces the sequential per-window schedule
    (the pre-round-5 behavior) for A/B comparison."""
    from rtsds_tpu.eval.sliding import make_sliding_predict

    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, *image_size, 3), jnp.float32)
    if model_name == "bisenet":
        from rtsds_tpu.models.bisenet import BiSeNet
        model = BiSeNet(num_classes=19, context_path="resnet18",
                        dtype=jnp.bfloat16, output_f32=False)
        from rtsds_tpu.models.bisenet_int8 import (
            build_quantized, calibrate, bisenet_int8_apply as int8_apply)
    elif model_name == "deeplab":
        from rtsds_tpu.models.deeplabv2 import DeepLabV2
        model = DeepLabV2(num_classes=19, dtype=jnp.bfloat16,
                          output_f32=False)
        from rtsds_tpu.models.deeplab_int8 import (
            build_quantized, calibrate, deeplab_int8_apply as int8_apply)
    else:
        raise ValueError(f"unknown model {model_name!r}")

    wkey = jax.random.key(1)
    wx = jax.random.normal(wkey, (batch, *window, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(wkey, wx)

    def bf16_apply(variables, x, train=False):
        return model.apply(variables, x, train=train)

    predict_bf16 = make_sliding_predict(bf16_apply, image_size,
                                        window=window,
                                        window_chunk=window_chunk)
    bf = latency_benchmark(predict_bf16, (variables, x),
                           iterations=iterations, repeats=repeats,
                           warmup=1, images_per_call=batch, chain_index=1)
    from rtsds_tpu.eval.sliding import _positions
    n_windows = (len(_positions(image_size[0], window[0],
                                window[0] * 3 // 4))
                 * len(_positions(image_size[1], window[1],
                                  window[1] * 3 // 4)))
    out = {
        "bench": f"{model_name}_sliding_serving",
        "image_size": list(image_size),
        "window": list(window),
        "windows_per_frame": n_windows,
        "batch": batch,
        "window_chunk": window_chunk,
        "bf16_ms": round(bf["mean_ms"], 3),
        "bf16_fps": round(bf["fps"], 2),
    }
    if include_int8:
        # calibrate on window-shaped activations (what serving sees)
        scales = calibrate(variables, [wx])
        qtree = build_quantized(variables, scales)

        def q_apply(qtree, x, train=False):
            return int8_apply(qtree, x)

        predict_int8 = make_sliding_predict(q_apply, image_size,
                                            window=window,
                                            window_chunk=window_chunk)
        q8 = latency_benchmark(predict_int8, (qtree, x),
                               iterations=iterations, repeats=repeats,
                               warmup=1, images_per_call=batch,
                               chain_index=1)
        out.update({
            "int8_ms": round(q8["mean_ms"], 3),
            "int8_fps": round(q8["fps"], 2),
            "speedup": (round(bf["mean_ms"] / q8["mean_ms"], 3)
                        if q8["mean_ms"] > 0 else None),
        })
    return out


def main():
    size = tuple(int(v) for v in
                 os.environ.get("SL_IMAGE", "2048,4096").split(","))
    window = tuple(int(v) for v in
                   os.environ.get("SL_WINDOW", "1024,2048").split(","))
    out = bench_sliding(
        image_size=size, window=window,
        batch=int(os.environ.get("SL_BATCH", "1")),
        iterations=int(os.environ.get("SL_ITERS", "4")),
        repeats=int(os.environ.get("SL_REPEATS", "2")),
        model_name=os.environ.get("SL_MODEL", "bisenet"),
        include_int8=os.environ.get("SL_INT8", "1") != "0",
        window_chunk=int(os.environ.get("SL_CHUNK", "0")) or None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
