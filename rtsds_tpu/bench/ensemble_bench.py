"""Multi-scale + flip ensemble serving bench: the whole blended predict
(``eval/ensemble.py``) through the chained-slope harness.

Round 3 measured the ensemble protocol at 101.7 ms/frame b1 @1024x2048
(~12x plain) with SEQUENTIAL plain/flipped forwards per scale; round 5
stacks each flip pair into one 2n-batch forward.  This bench records
what that is worth on hardware (and optionally the int8 composition).

Run (one TPU process): ``python -m rtsds_tpu.bench.ensemble_bench``.
Env: ENS_IMAGE ("1024,2048"), ENS_SCALES ("0.75,1.0,1.25"), ENS_BATCH
(1), ENS_ITERS (4), ENS_REPEATS (2), ENS_MODEL (bisenet), ENS_INT8 (0).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from rtsds_tpu.bench.latency import latency_benchmark


def bench_ensemble(image_size=(1024, 2048), scales=(0.75, 1.0, 1.25),
                   batch=1, iterations=4, repeats=2, model_name="bisenet",
                   include_int8=False):
    from rtsds_tpu.eval.ensemble import make_ensemble_predict

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

    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)

    def bf16_apply(variables, x, train=False):
        return model.apply(variables, x, train=train)

    predict = make_ensemble_predict(bf16_apply, image_size, scales=scales)
    bf = latency_benchmark(predict, (variables, x), iterations=iterations,
                           repeats=repeats, warmup=1, images_per_call=batch,
                           chain_index=1)
    out = {
        "bench": f"{model_name}_ensemble_serving",
        "image_size": list(image_size),
        "scales": list(scales),
        "batch": batch,
        "bf16_ms": round(bf["mean_ms"], 3),
        "bf16_fps": round(bf["fps"], 2),
    }
    if include_int8:
        scales_q = calibrate(variables, [x])
        qtree = build_quantized(variables, scales_q)

        def q_apply(qtree, x, train=False):
            return int8_apply(qtree, x)

        predict_q = make_ensemble_predict(q_apply, image_size,
                                          scales=scales)
        q8 = latency_benchmark(predict_q, (qtree, x), iterations=iterations,
                               repeats=repeats, warmup=1,
                               images_per_call=batch, chain_index=1)
        out.update({
            "int8_ms": round(q8["mean_ms"], 3),
            "int8_fps": round(q8["fps"], 2),
            "speedup": (round(bf["mean_ms"] / q8["mean_ms"], 3)
                        if q8["mean_ms"] > 0 else None),
        })
    return out


def main():
    size = tuple(int(v) for v in
                 os.environ.get("ENS_IMAGE", "1024,2048").split(","))
    scales = tuple(float(v) for v in
                   os.environ.get("ENS_SCALES", "0.75,1.0,1.25").split(","))
    out = bench_ensemble(
        image_size=size, scales=scales,
        batch=int(os.environ.get("ENS_BATCH", "1")),
        iterations=int(os.environ.get("ENS_ITERS", "4")),
        repeats=int(os.environ.get("ENS_REPEATS", "2")),
        model_name=os.environ.get("ENS_MODEL", "bisenet"),
        include_int8=os.environ.get("ENS_INT8", "0") != "0")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
