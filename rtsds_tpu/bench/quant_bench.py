"""int8 (W8A8) vs bf16 conv microbench over the DeepLabV2-R101 serving
profile.

Round 2 measured int8 on the *BiSeNet* conv profile and rejected it
(early high-res 64-ch convs got SLOWER; weighted win <15% -- PERF.md).
DeepLab's profile is the opposite shape: 80+% of its serving FLOPs are
1024/2048-channel bottleneck convs at /8 resolution (output-stride 8,
``models/deeplabv2.py``), exactly where the round-2 microbench saw the
MXU's 2x int8 peak start to pay (1.46x at 256 ch).  This bench answers,
per conv shape and weighted by the block counts of R101 at 512x1024:
would a W8A8 serving path beat the measured bf16 165 FPS / MFU 0.617?

Round-4 postscript: the QB_E2E_MODEL=bisenet whole-network mode
OVERTURNED the round-2 BiSeNet rejection -- e2e, every segment except
the two 3-channel stems wins, composing to 1.249x (316 -> 395 FPS at
b48 @1024x2048; ``models/bisenet_int8.default_policy``).  The
shape-weighted microbench under-predicted by 10x on this workload:
trust only whole-network numbers for quantization decisions.

Variants per shape:
  * ``bf16``        -- the production serving path's conv.
  * ``int8_static`` -- weights AND activations pre-quantized (the upper
    bound: what a fully-quantized network sees, since each layer's input
    is the previous layer's already-int8 output).
  * ``int8_dynamic``-- bf16 activation, per-tensor max-abs quant in the
    program (what the FIRST quantized layer after an f32 input pays).

Run (one TPU process): ``python -m rtsds_tpu.bench.quant_bench``.
Env: QB_BATCH (8), QB_ITERS (8), QB_REPEATS (2), QB_SHAPES (csv filter);
``QB_E2E=1`` benches the WHOLE quantized network instead
(``QB_POLICIES`` csv selects policy variants; default ships the
measured winner; ``QB_E2E_MODEL=bisenet`` switches the e2e comparison
to the BiSeNet serving path, ``models/bisenet_int8.py``).

MEASUREMENT CAVEAT (learned here): through the tunneled backend the
per-shape slope numbers are NOISE below ~1 ms at the default iteration
counts (observed 0.0-ms slopes and impossible >peak rates under load) --
use QB_ITERS>=64 on an idle box for per-shape numbers, and trust the
QB_E2E whole-network comparison (tens of ms per call) for decisions.
The round-4 policy choice was made exclusively on QB_E2E numbers.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from rtsds_tpu.bench.latency import latency_benchmark, program_flops

# (name, count, H, W, Cin, Cout, k, dilation) -- DeepLabV2-R101 @512x1024,
# output stride 8 (deeplabv2.py: layer3 dilation 2, layer4 dilation 4,
# ASPP 3x3 dilated 6/12/18/24 straight to num_classes).  Counts are the
# per-network occurrences used for the weighted verdict.
DEEPLAB_CONVS = [
    ("l1_3x3_64", 3, 128, 256, 64, 64, 3, 1),
    ("l1_1x1_256", 3, 128, 256, 64, 256, 1, 1),
    ("l2_1x1_red", 4, 64, 128, 512, 128, 1, 1),
    ("l2_3x3_128", 4, 64, 128, 128, 128, 3, 1),
    ("l2_1x1_exp", 4, 64, 128, 128, 512, 1, 1),
    ("l3_1x1_red", 23, 64, 128, 1024, 256, 1, 1),
    ("l3_3x3_d2", 23, 64, 128, 256, 256, 3, 2),
    ("l3_1x1_exp", 23, 64, 128, 256, 1024, 1, 1),
    ("l4_1x1_red", 3, 64, 128, 2048, 512, 1, 1),
    ("l4_3x3_d4", 3, 64, 128, 512, 512, 3, 4),
    ("l4_1x1_exp", 3, 64, 128, 512, 2048, 1, 1),
    ("aspp_3x3_d6", 4, 64, 128, 2048, 19, 3, 6),
]

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, dilation, acc_dtype=None):
    pad = "SAME"
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad,
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        preferred_element_type=acc_dtype)


def bench_shape(name, batch, h, w, cin, cout, k, dilation,
                iterations=8, repeats=2):
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    x_f = jax.random.normal(kx, (batch, h, w, cin), jnp.float32)
    w_f = jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * 0.05

    x_bf = x_f.astype(jnp.bfloat16)
    w_bf = w_f.astype(jnp.bfloat16)

    # per-output-channel weight scales, per-tensor activation scale
    w_scale = jnp.max(jnp.abs(w_f), axis=(0, 1, 2)) / 127.0
    w_q = jnp.clip(jnp.round(w_f / w_scale), -127, 127).astype(jnp.int8)
    x_scale = jnp.max(jnp.abs(x_f)) / 127.0
    x_q = jnp.clip(jnp.round(x_f / x_scale), -127, 127).astype(jnp.int8)
    deq = (w_scale * x_scale).astype(jnp.float32)

    # every variant ends in relu: (a) realistic -- the production convs
    # are conv->BN->relu, and (b) REQUIRED for honest timing: the
    # harness's chained sum() folds through a purely linear conv (XLA
    # rewrites sum(conv(x)) into a column-sum dot -- observed as
    # above-peak "bf16" rates), while the int8 round/clip is nonlinear,
    # so a relu-free comparison times a folded bf16 graph against a real
    # int8 one
    def run_bf16(w, x):
        return jax.nn.relu(_conv(x, w, dilation))

    def run_int8_static(w, x, deq):
        acc = _conv(x, w, dilation, acc_dtype=jnp.int32)
        return jax.nn.relu((acc.astype(jnp.float32) * deq)
                           .astype(jnp.bfloat16))

    def run_int8_dynamic(w, x, w_scale):
        s = jnp.max(jnp.abs(x)) / 127.0
        xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        acc = _conv(xq, w, dilation, acc_dtype=jnp.int32)
        return jax.nn.relu((acc.astype(jnp.float32) * (w_scale * s))
                           .astype(jnp.bfloat16))

    out = {"name": name, "shape": [batch, h, w, cin, cout, k, dilation]}
    r = latency_benchmark(run_bf16, (w_bf, x_bf), iterations=iterations,
                          repeats=repeats, warmup=1, chain_index=1)
    out["bf16_ms"] = round(r["mean_ms"], 4)
    # chain through x_q (NOT the dequant scale): a scale-chained conv has
    # loop-invariant operands and XLA hoists it out of the timing loop.
    # The int8 perturbation (acc*1e-12).astype(int8) rounds to zero but
    # is data-dependent at compile time, so the dependency holds.
    r = latency_benchmark(run_int8_static, (w_q, x_q, deq),
                          iterations=iterations, repeats=repeats, warmup=1,
                          chain_index=1)
    out["int8_static_ms"] = round(r["mean_ms"], 4)
    r = latency_benchmark(run_int8_dynamic, (w_q, x_bf, w_scale),
                          iterations=iterations, repeats=repeats, warmup=1,
                          chain_index=1)
    out["int8_dynamic_ms"] = round(r["mean_ms"], 4)
    out["static_speedup"] = round(out["bf16_ms"] / out["int8_static_ms"], 3) \
        if out["int8_static_ms"] > 0 else None
    out["dynamic_speedup"] = round(
        out["bf16_ms"] / out["int8_dynamic_ms"], 3) \
        if out["int8_dynamic_ms"] > 0 else None
    return out


def bench_e2e(batch=8, image_size=(512, 1024), iterations=8, repeats=2,
              policy_names=None):
    """Whole-network serving comparison at the production shape: the W8A8
    quantized DeepLabV2 (``models/deeplab_int8.py``, default policy)
    vs the bf16 flax serving path, both through forward+argmax.  This is
    the decision number -- it includes the inter-layer quantize ops and
    the bf16 residual/ASPP segments the per-shape sweep cannot see."""
    from rtsds_tpu.models.deeplabv2 import DeepLabV2
    from rtsds_tpu.models.deeplab_int8 import (
        build_quantized, calibrate, deeplab_int8_apply, default_policy)

    model = DeepLabV2(num_classes=19, dtype=jnp.bfloat16, output_f32=False)
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, *image_size, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)

    def fwd_bf16(variables, x):
        return jnp.argmax(model.apply(variables, x, train=False),
                          -1).astype(jnp.int32)

    scales = calibrate(variables, [x])

    # candidate policies; the sub-ms per-shape sweep is noise-prone
    # through the tunnel, so the POLICY decision is made on these
    # whole-network numbers (QB_POLICIES csv selects a subset).
    # 'default' is the shipped models/deeplab_int8.default_policy
    # (3x3s + 1x1 expansions -- the measured winner, 1.13x)
    def p_all_backbone(name, shape):
        return not name.startswith("layer6/")

    def p_3x3_only(name, shape):
        return shape[0] == 3 and not name.startswith("layer6/")

    def p_no_l4(name, shape):
        return not (name.startswith("layer6/") or name.startswith("layer4"))

    def p_3x3_stem(name, shape):
        return shape[0] >= 3 and not name.startswith("layer6/")

    def p_3x3_exp(name, shape):
        return ((shape[0] == 3 or name.endswith("/conv3"))
                and not name.startswith("layer6/"))

    def p_3x3_stem_exp(name, shape):
        return ((shape[0] >= 3 or name.endswith("/conv3"))
                and not name.startswith("layer6/"))

    policies = {"default": default_policy, "all_backbone": p_all_backbone,
                "conv3x3": p_3x3_only,
                "no_l4": p_no_l4, "conv3x3_stem": p_3x3_stem,
                "conv3x3_exp": p_3x3_exp,
                "conv3x3_stem_exp": p_3x3_stem_exp}
    # default run benches only the shipped policy (each variant is a
    # full-network compile); QB_POLICIES=a,b,c selects others for the
    # CLI, while programmatic callers (bench.py) pass policy_names
    # explicitly so a leftover env knob cannot redirect the driver bench
    if policy_names is None:
        policy_names = os.environ.get("QB_POLICIES", "default").split(",")
    unknown = [k for k in policy_names if k not in policies]
    if unknown:
        raise ValueError(f"unknown QB policies {unknown}; "
                         f"choose from {sorted(policies)}")
    policies = {k: policies[k] for k in policy_names}

    def fwd_int8(qtree, x):
        return jnp.argmax(deeplab_int8_apply(qtree, x), -1).astype(jnp.int32)

    bf = latency_benchmark(fwd_bf16, (variables, x), iterations=iterations,
                           repeats=repeats, warmup=1,
                           images_per_call=batch, chain_index=1)
    out = {
        "e2e": "deeplabv2_r101_serving",
        "image_size": list(image_size),
        "batch": batch,
        "bf16_ms": round(bf["mean_ms"], 3),
        "bf16_fps": round(bf["fps"], 2),
        # math-op count of the serving forward (HLO cost analysis on the
        # bf16 graph; the int8 network performs the same convolutions, so
        # the same count divided by int8 wall time against the int8 peak
        # is the honest int8 MFU)
        "flops_per_call": program_flops(fwd_bf16, variables, x),
    }
    for pname, policy in policies.items():
        qtree = build_quantized(variables, scales, policy=policy)
        q8 = latency_benchmark(fwd_int8, (qtree, x), iterations=iterations,
                               repeats=repeats, warmup=1,
                               images_per_call=batch, chain_index=1)
        out[pname] = {
            "int8_ms": round(q8["mean_ms"], 3),
            "int8_fps": round(q8["fps"], 2),
            "speedup": (round(bf["mean_ms"] / q8["mean_ms"], 3)
                        if q8["mean_ms"] > 0 else None),
            "quantized_convs": len(qtree["q8"]),
        }
    return out


def bench_e2e_bisenet(batch=48, image_size=(1024, 2048), iterations=8,
                      repeats=2, policy_names=None,
                      include_folded=True):
    """Whole-network serving comparison for BiSeNet at its production
    shape (b48 @1024x2048 -- the headline inference config).  Settles
    the round-2 microbench rejection with e2e numbers: the flax bf16
    serving path vs the BN-folded walk vs W8A8 policies
    (``models/bisenet_int8.py``)."""
    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.models.bisenet_int8 import (
        bisenet_int8_apply, build_quantized, calibrate, default_policy,
        fold_bisenet)

    model = BiSeNet(num_classes=19, context_path="resnet18",
                    dtype=jnp.bfloat16, output_f32=False)
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, *image_size, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)

    def fwd_bf16(variables, x):
        return jnp.argmax(model.apply(variables, x, train=False),
                          -1).astype(jnp.int32)

    folded = fold_bisenet(variables)
    scales = calibrate(variables, [x], folded=folded)

    def p_ctx234(name, shape):
        import re
        m = re.match(r"context_path/layer([1-4])", name)
        return bool(m) and int(m.group(1)) >= 2

    def p_ctx1234(name, shape):
        return name.startswith("context_path/layer")

    def p_default_sp2(name, shape):
        return default_policy(name, shape) \
            or name == "spatial_path/convblock2"

    def p_default_ffm(name, shape):
        return default_policy(name, shape) \
            or name.startswith("ffm/convblock:")

    def p_all_convs(name, shape):
        return not name.startswith(("arm", "ffm/conv", "conv"))

    def p_best(name, shape):
        return (name.startswith("context_path/layer")
                or name == "spatial_path/convblock3"
                or name.startswith("ffm/convblock:"))

    def p_best_sp2(name, shape):
        return p_best(name, shape) or name == "spatial_path/convblock2"

    policies = {"default": default_policy, "ctx234": p_ctx234,
                "ctx1234": p_ctx1234, "default_sp2": p_default_sp2,
                "default_ffm": p_default_ffm, "all_convs": p_all_convs,
                "best": p_best, "best_sp2": p_best_sp2}
    if policy_names is None:
        policy_names = os.environ.get("QB_POLICIES", "default").split(",")
    unknown = [k for k in policy_names if k not in policies]
    if unknown:
        raise ValueError(f"unknown QB policies {unknown}; "
                         f"choose from {sorted(policies)}")
    policies = {k: policies[k] for k in policy_names}

    def fwd_int8(qtree, x):
        return jnp.argmax(bisenet_int8_apply(qtree, x), -1).astype(jnp.int32)

    bf = latency_benchmark(fwd_bf16, (variables, x), iterations=iterations,
                           repeats=repeats, warmup=1,
                           images_per_call=batch, chain_index=1)

    out = {
        "e2e": "bisenet_r18_serving",
        "image_size": list(image_size),
        "batch": batch,
        "bf16_ms": round(bf["mean_ms"], 3),
        "bf16_fps": round(bf["fps"], 2),
        # see bench_e2e: bf16-graph math-op count, reused for int8 MFU
        "flops_per_call": program_flops(fwd_bf16, variables, x),
    }
    if include_folded:
        # the BN-folded walk in pure bf16 (zero quantized convs):
        # isolates what the fold itself buys from what int8 buys
        # (measured: NOTHING on v5e -- 151.7 vs 151.7 ms at b48; XLA
        # already fuses the BN affine into the convs)
        empty = build_quantized(variables, scales,
                                policy=lambda n, s: False, folded=folded)

        def fwd_folded(qtree, x):
            return jnp.argmax(bisenet_int8_apply(qtree, x),
                              -1).astype(jnp.int32)

        fl = latency_benchmark(fwd_folded, (empty, x),
                               iterations=iterations, repeats=repeats,
                               warmup=1, images_per_call=batch,
                               chain_index=1)
        out["folded_bf16_ms"] = round(fl["mean_ms"], 3)
        out["folded_bf16_fps"] = round(fl["fps"], 2)
    for pname, policy in policies.items():
        qtree = build_quantized(variables, scales, policy=policy,
                                folded=folded)
        q8 = latency_benchmark(fwd_int8, (qtree, x), iterations=iterations,
                               repeats=repeats, warmup=1,
                               images_per_call=batch, chain_index=1)
        out[pname] = {
            "int8_ms": round(q8["mean_ms"], 3),
            "int8_fps": round(q8["fps"], 2),
            "speedup": (round(bf["mean_ms"] / q8["mean_ms"], 3)
                        if q8["mean_ms"] > 0 else None),
            "quantized_convs": len(qtree["q8"]),
        }
    return out


def main():
    batch = int(os.environ.get("QB_BATCH", "8"))
    iters = int(os.environ.get("QB_ITERS", "8"))
    repeats = int(os.environ.get("QB_REPEATS", "2"))

    if os.environ.get("QB_E2E", "0") == "1":
        if os.environ.get("QB_E2E_MODEL", "deeplab") == "bisenet":
            print(json.dumps(bench_e2e_bisenet(batch=batch,
                                               iterations=iters,
                                               repeats=repeats)),
                  flush=True)
        else:
            print(json.dumps(bench_e2e(batch=batch, iterations=iters,
                                       repeats=repeats)), flush=True)
        return
    only = os.environ.get("QB_SHAPES")
    names = set(only.split(",")) if only else None

    rows, bf_total, int8_total = [], 0.0, 0.0
    for name, count, h, w, cin, cout, k, dil in DEEPLAB_CONVS:
        if names and name not in names:
            continue
        row = bench_shape(name, batch, h, w, cin, cout, k, dil,
                          iterations=iters, repeats=repeats)
        row["count"] = count
        rows.append(row)
        print(json.dumps(row), flush=True)
        bf_total += count * row["bf16_ms"]
        int8_total += count * row["int8_static_ms"]

    summary = {
        "weighted_bf16_ms": round(bf_total, 2),
        "weighted_int8_static_ms": round(int8_total, 2),
        "weighted_speedup": (round(bf_total / int8_total, 3)
                             if int8_total > 0 else None),
        "batch": batch,
        "note": "counts weight each shape by its occurrences in "
                "DeepLabV2-R101 @512x1024 OS8; static = fully-quantized "
                "network upper bound",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
