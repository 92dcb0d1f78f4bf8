"""W8A8 int8 serving path for DeepLabV2 (post-training quantization).

Pipeline: ``fold_deeplab`` (freeze BN into convs, exact) ->
``calibrate`` (static per-conv activation scales from max-abs over a few
batches) -> ``build_quantized`` (per-output-channel int8 weights; a
policy keeps measured-slow shapes in bf16) -> ``deeplab_int8_apply``
(the jittable serving forward: int8 convs accumulate int32 on the MXU,
dequant + bias + relu in bf16).

The topology walk exists ONCE (:func:`_forward`, parameterized by a conv
op) and mirrors ``models/deeplabv2.py`` exactly: stem 7x7/s2 + BN + relu
+ ceil-mode maxpool, Bottleneck stages [3,4,23,3] with stride on the 1x1
and dilation 2/4 on stages 3/4 (reference deeplabv2.py:69-131), summed
4-branch ASPP, bilinear upsample.  Activation quantization is symmetric
per-tensor (MXU takes s8 x s8); relu outputs use effectively 7 bits,
which PTQ tolerates at this task (argmax-agreement tested).

The reference has no quantization; this is a TPU-native serving
extension justified per-shape by ``bench/quant_bench.py``.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from rtsds_tpu.models.layers import max_pool_3x3_s2
from rtsds_tpu.ops.quant import (
    build_quantized_net,
    calibrate_net,
    fold_bn,
    make_bf16_op,
    make_quant_op,
)
from rtsds_tpu.ops.resize import resize_bilinear

ASPP_DILATIONS = (6, 12, 18, 24)
# (width, stride, dilation) per stage -- deeplabv2.py:80-83
STAGES = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]


def _block_counts(names) -> list[int]:
    """Stage block counts from 'layer{s}_{i}'-style names.  Names are
    Python dict keys, so this stays STATIC under jit (never traced)."""
    counts = [0, 0, 0, 0]
    for name in names:
        m = re.match(r"layer([1-4])_(\d+)", name)
        if m:
            s, i = int(m.group(1)), int(m.group(2))
            counts[s - 1] = max(counts[s - 1], i + 1)
    if not all(counts):
        raise ValueError("param tree does not look like DeepLabV2 "
                         f"(stage blocks found: {counts})")
    return counts


def fold_deeplab(variables) -> dict:
    """Fold every frozen BN into its conv: {conv_name: (kernel, bias)}.

    Exact at serving time (BNs run on running stats,
    ``models/deeplabv2.py:17-22``); unit-tested against the flax model.
    """
    p = variables["params"]
    st = variables["batch_stats"]

    def fold(kernel, bias, bnp, bns):
        return fold_bn(kernel, bias, bnp["scale"], bnp["bias"],
                       bns["mean"], bns["var"])

    folded = {"conv1": fold(p["conv1"]["kernel"], None, p["bn1"],
                            st["bn1"])}
    for name in p:
        if not re.fullmatch(r"layer[1-4]_\d+", name):
            continue
        pairs = [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
        if "downsample_conv" in p[name]:
            pairs.append(("downsample_conv", "downsample_bn"))
        for cv, bn in pairs:
            folded[f"{name}/{cv}"] = fold(
                p[name][cv]["kernel"], None, p[name][bn], st[name][bn])
    for i in range(len(ASPP_DILATIONS)):
        branch = p["layer6"][f"conv2d_list_{i}"]
        folded[f"layer6/conv2d_list_{i}"] = (branch["kernel"],
                                             branch["bias"])
    return folded


def _forward(op, x, block_counts):
    """The single topology walk; ``op(name, x, stride, padding, dilation)``
    performs one (BN-folded) conv."""
    in_size = (x.shape[1], x.shape[2])
    x = jax.nn.relu(op("conv1", x, 2, 3, 1))
    x = max_pool_3x3_s2(x, ceil_mode=True)
    for stage_idx, ((width, stride, dilation), n_blocks) in enumerate(
            zip(STAGES, block_counts)):
        for block_idx in range(n_blocks):
            name = f"layer{stage_idx + 1}_{block_idx}"
            first = block_idx == 0
            s = stride if first else 1
            needs_proj = first and (
                stride != 1 or x.shape[-1] != width * 4
                or dilation in (2, 4))
            identity = x
            out = jax.nn.relu(op(f"{name}/conv1", x, s, 0, 1))
            out = jax.nn.relu(op(f"{name}/conv2", out, 1, dilation,
                                 dilation))
            out = op(f"{name}/conv3", out, 1, 0, 1)
            if needs_proj:
                identity = op(f"{name}/downsample_conv", x, s, 0, 1)
            x = jax.nn.relu(out + identity)
    logits = None
    for i, d in enumerate(ASPP_DILATIONS):
        branch = op(f"layer6/conv2d_list_{i}", x, 1, d, d)
        logits = branch if logits is None else logits + branch
    return resize_bilinear(logits, in_size)


def calibrate(variables, batches, folded=None, stat: str = "max",
              percentile: float = 99.9) -> dict:
    """Static per-conv-input activation scales from calibration batches.

    ``batches``: iterable of (N, H, W, 3) image arrays (AFTER the
    production preprocess).  Returns {conv_name: float scale} with
    ``scale = bound / 127`` where the bound is max-abs or an approximate
    percentile of |x| per ``stat``/``percentile`` (see
    ``ops/quant.py:calibrate_net``), observed across all batches.  One
    jitted bf16 forward per batch shape; convs sharing an input
    (bottleneck conv1 + downsample, the ASPP branches) naturally record
    identical bounds.  ``folded``: pass a precomputed
    :func:`fold_deeplab` tree to avoid refolding (the fold is ~300 eager
    dispatches -- seconds on tunneled backends).
    """
    if folded is None:
        folded = fold_deeplab(variables)
    block_counts = _block_counts(variables["params"])
    return calibrate_net(
        lambda op, x: _forward(op, x, block_counts), folded, batches,
        stat=stat, percentile=percentile)


def default_policy(name: str, kernel_shape) -> bool:
    """Quantize a conv only where the whole-network measurement says
    int8 wins (``bench/quant_bench.py`` QB_E2E on v5e, b8 @512x1024):

      * 3x3 convs + the 1x1 bottleneck EXPANSIONS (``conv3``): 42.8 ms
        vs 48.3 bf16 = 1.13x (187 vs 165.5 FPS).
      * quantizing everything (104 convs) LOSES (0.897x): the per-tensor
        quantize pass over the wide 1024/2048-ch inputs of the 1x1
        reductions costs more than their MXU win.
      * adding the 7x7 stem also loses (1.05x vs 1.108x for plain 3x3s).
      * ASPP stays bf16: 19-channel outputs are tiny and they are the
        accuracy-critical logits.
    """
    if name.startswith("layer6/"):
        return False
    return kernel_shape[0] == 3 or name.endswith("/conv3")


def build_quantized(variables, act_scales: dict, policy=default_policy,
                    folded=None):
    """Quantized param tree: {'q8': {name: (w_q, w_scale, x_scale, bias)},
    'bf16': {name: (kernel bf16, bias f32)}}.  ``folded``: reuse a
    precomputed :func:`fold_deeplab` tree."""
    if folded is None:
        folded = fold_deeplab(variables)
    return build_quantized_net(folded, act_scales, policy)


def deeplab_int8_apply(qtree, x, output_f32: bool = False):
    """The quantized serving forward (jittable; ``qtree`` is a pytree --
    stage structure is recovered from its static dict keys)."""
    block_counts = _block_counts(list(qtree["q8"]) + list(qtree["bf16"]))
    logits = _forward(make_quant_op(qtree), x.astype(jnp.bfloat16),
                      block_counts)
    return logits.astype(jnp.float32) if output_f32 else logits


def deeplab_bf16_apply(variables, x, output_f32: bool = False,
                       dtype=jnp.bfloat16):
    """BN-folded forward through the SAME walk -- the apples-to-apples
    baseline for accuracy/perf comparisons, and (at ``dtype=float32``)
    the fold-exactness test surface against the flax model."""
    folded = fold_deeplab(variables)
    block_counts = _block_counts(variables["params"])
    logits = _forward(make_bf16_op(folded, out_dtype=dtype),
                      x.astype(dtype), block_counts)
    return logits.astype(jnp.float32) if output_f32 else logits
