"""Latency / FPS harness for real-time inference.

Replaces the reference's wall-clock loop (``utils.py:109-134``, spec
``README.md:157-177``) -- which has no warmup, no device synchronization
and a crashing mean/std computation -- with an honest async-dispatch-aware
harness: jit + warmup, ``block_until_ready`` fencing, p50/p95/p99
percentiles, and per-chip FPS.  Input staging (device_put) happens outside
the timed region, as a production serving loop would hold inputs
device-resident.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def latency_benchmark(fn, args, iterations: int = 10, repeats: int = 5,
                      warmup: int = 1, images_per_call: int = 1,
                      chain_index: int | None = None) -> dict:
    """Benchmark ``fn(*args)`` with tamper-proof device timing.

    Async dispatch (and, on tunneled backends, unreliable
    ``block_until_ready``) makes per-call host timing meaningless, so the
    measured unit is a jit program that runs ``fn`` ``iterations`` times
    with a scalar data dependency chained through the designated input
    (``chain_index``: index into ``args`` of a float array; defaults to the
    last array argument) and is fenced by a host scalar fetch.

    Two defenses against compiler/runtime cheating:
      * the chain consumes the FULL output (``sum``), so XLA cannot
        dead-code-eliminate work feeding unread output elements;
      * each sample is the SLOPE between a k-iteration and a 2k-iteration
        program, cancelling the constant dispatch+fetch round trip (~30 ms
        on tunneled backends).
    """
    args = tuple(jax.tree_util.tree_map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, args))
    if chain_index is None:
        chain_index = len(args) - 1

    @partial(jax.jit, static_argnums=(1,))
    def run_k(args, k):
        def body(_, acc):
            perturbed = list(args)
            x = perturbed[chain_index]
            perturbed[chain_index] = x + (acc * 1e-12).astype(x.dtype)
            out = fn(*perturbed)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            # consume everything: no dead-code elimination of the output
            return acc + jnp.sum(leaf).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for _ in range(warmup):
        float(run_k(args, iterations))
        float(run_k(args, 2 * iterations))  # compile both variants

    per_call_ms = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_k(args, iterations))
        t1 = time.perf_counter()
        float(run_k(args, 2 * iterations))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / iterations
        per_call_ms.append(max(slope, 0.0) * 1000.0)
    times_ms = np.asarray(per_call_ms)

    mean_s = max(float(times_ms.mean()) / 1000.0, 1e-9)
    return {
        "iterations": iterations,
        "repeats": repeats,
        "images_per_call": images_per_call,
        "mean_ms": float(times_ms.mean()),
        "std_ms": float(times_ms.std()),
        "p50_ms": float(np.percentile(times_ms, 50)),
        "p95_ms": float(np.percentile(times_ms, 95)),
        "p99_ms": float(np.percentile(times_ms, 99)),
        "fps": images_per_call / mean_s,
    }


def program_flops(fn, *args) -> float:
    """FLOPs of ``jit(fn)(*args)`` from the HLO alone (host-side
    ``lowered.cost_analysis()`` -- no backend compile, so it is safe to call
    on slow remote-compile backends)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        costs = lowered.cost_analysis()
        if costs is None:  # some backends only cost the compiled module
            costs = lowered.compile().cost_analysis()
        if isinstance(costs, list):
            costs = costs[0] if costs else {}
        return float(costs.get("flops", float("nan")))
    except Exception:
        return float("nan")


def bisenet_inference_benchmark(image_size=(1024, 2048), batch_size: int = 1,
                                context_path: str = "resnet18",
                                dtype=jnp.bfloat16, iterations: int = 10,
                                repeats: int = 5, warmup: int = 1,
                                num_classes: int = 19,
                                mode: str = "masks") -> dict:
    """The headline bench: BiSeNet real-time inference at 1024x2048
    (BASELINE.md).  bf16 compute on the MXU.

    ``mode="masks"`` measures the serving path (forward + per-pixel argmax
    -> int32 masks) -- what a real-time segmentation consumer reads, and a
    nonlinearity the compiler cannot algebraically fold.  ``mode="logits"``
    measures the raw forward (the reference harness's definition,
    utils.py:118-120).
    """
    from rtsds_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_classes=num_classes, context_path=context_path,
                    dtype=dtype, output_f32=(mode != "masks"))
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch_size, *image_size, 3), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)

    if mode == "masks":
        def forward(variables, x):
            logits = model.apply(variables, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        def forward(variables, x):
            return model.apply(variables, x, train=False)

    stats = latency_benchmark(forward, (variables, x), iterations=iterations,
                              repeats=repeats, warmup=warmup,
                              images_per_call=batch_size, chain_index=1)
    stats["flops_per_call"] = program_flops(forward, variables, x)
    stats.update({"model": f"bisenet-{context_path}",
                  "image_size": list(image_size),
                  "batch_size": batch_size,
                  "mode": mode,
                  "dtype": str(dtype.__name__ if hasattr(dtype, '__name__')
                               else dtype)})
    return stats


def deeplab_inference_benchmark(image_size=(512, 1024), batch_size: int = 4,
                                dtype=jnp.bfloat16, iterations: int = 10,
                                repeats: int = 5, warmup: int = 1,
                                num_classes: int = 19) -> dict:
    """DeepLabV2-ResNet101 serving-path bench (BASELINE.md config 2 shape)."""
    from rtsds_tpu.models.deeplabv2 import DeepLabV2

    model = DeepLabV2(num_classes=num_classes, dtype=dtype,
                      output_f32=False)
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch_size, *image_size, 3), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)

    def forward(variables, x):
        logits = model.apply(variables, x, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    stats = latency_benchmark(forward, (variables, x), iterations=iterations,
                              repeats=repeats, warmup=warmup,
                              images_per_call=batch_size, chain_index=1)
    stats["flops_per_call"] = program_flops(forward, variables, x)
    stats.update({"model": "deeplabv2-resnet101",
                  "image_size": list(image_size),
                  "batch_size": batch_size,
                  "dtype": str(getattr(dtype, "__name__", dtype))})
    return stats
