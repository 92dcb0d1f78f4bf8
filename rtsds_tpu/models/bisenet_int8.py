"""W8A8 int8 serving path for BiSeNet (post-training quantization).

Same pipeline as the DeepLab path (``models/deeplab_int8.py``):
``fold_bisenet`` (every serving-time BN folded into its conv -- exact,
BiSeNet serves on running stats) -> ``calibrate`` (static per-conv
activation scales) -> ``build_quantized`` (per-output-channel int8
weights under a measured policy) -> ``bisenet_int8_apply``.

The topology walk exists ONCE (:func:`_forward`) and mirrors
``models/bisenet.py`` in its production serving configuration
(``fast_head=True``, reference graph ``build_bisenet.py:84-172``):
spatial path (3x ConvBlock stride 2), ResNet context path (BasicBlock
or Bottleneck stages derived from the param names), ARM channel gates,
tail multiply, bilinear upsample to 1/8, split-form FFM (the concat
conv computed as a sum of per-part convs -- the round-2 serving win --
with each part carrying its OWN activation scale), SE gate, final 1x1
conv before the 8x upsample.

Round 2 rejected BiSeNet int8 on a microbench-weighted estimate
(<15%, with predicted losses on the 64-ch convs); the e2e measurement
this module enabled OVERTURNED that: the shipped policy runs **1.249x**
(316 -> 395 FPS/chip at b48 @1024x2048 on v5e) -- see
:func:`default_policy` for the measured policy space
(``bench/quant_bench.py`` QB_E2E_MODEL=bisenet).  int8 b64 exceeds HBM
(the bf16 batch plateau b64 = 324 FPS is beaten at b48 int8), so b48
stays the headline batch.  The reference has no quantization; this is
a TPU-native serving extension.
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
from rtsds_tpu.ops.resize import resize_bilinear, upsample_bilinear

_WIDTHS = (64, 128, 256, 512)


def _structure(names):
    """(block counts per stage, bottleneck?) from the static conv names --
    dict keys, so this never traces under jit."""
    counts = [0, 0, 0, 0]
    bottleneck = False
    for name in names:
        m = re.match(r"context_path/layer([1-4])_(\d+)/(\w+)", name)
        if m:
            s, i = int(m.group(1)), int(m.group(2))
            counts[s - 1] = max(counts[s - 1], i + 1)
            bottleneck |= m.group(3) == "conv3"
    if not all(counts):
        raise ValueError("param tree does not look like BiSeNet "
                         f"(context stage blocks found: {counts})")
    return counts, bottleneck


def fold_bisenet(variables) -> dict:
    """Fold every serving-time BN into its conv: {name: (kernel, bias)}.

    Exact at serving time (eval mode normalizes with running stats).
    The FFM's split-form 3x3 kernel is sliced into per-part entries
    ``ffm/convblock:p{i}`` (part 0 carries the folded bias so it is
    added exactly once across the summed parts); supervision heads are
    train-only and skipped.
    """
    p = variables["params"]
    st = variables["batch_stats"]

    def fold(kernel, bias, bnp, bns):
        return fold_bn(kernel, bias, bnp["scale"], bnp["bias"],
                       bns["mean"], bns["var"])

    folded = {}
    for i in (1, 2, 3):
        cb = p["spatial_path"][f"convblock{i}"]
        folded[f"spatial_path/convblock{i}"] = fold(
            cb["conv1"]["kernel"], None, cb["bn"],
            st["spatial_path"][f"convblock{i}"]["bn"])

    cp, cst = p["context_path"], st["context_path"]
    folded["context_path/conv1"] = fold(
        cp["conv1"]["kernel"], None, cp["bn1"], cst["bn1"])
    for name in cp:
        if not re.fullmatch(r"layer[1-4]_\d+", name):
            continue
        pairs = [("conv1", "bn1"), ("conv2", "bn2")]
        if "conv3" in cp[name]:
            pairs.append(("conv3", "bn3"))
        if "downsample_conv" in cp[name]:
            pairs.append(("downsample_conv", "downsample_bn"))
        for cv, bn in pairs:
            folded[f"context_path/{name}/{cv}"] = fold(
                cp[name][cv]["kernel"], None, cp[name][bn], cst[name][bn])

    for a in ("arm1", "arm2"):
        folded[f"{a}/conv"] = fold(p[a]["conv"]["kernel"],
                                   p[a]["conv"]["bias"], p[a]["bn"],
                                   st[a]["bn"])

    kernel = p["ffm"]["convblock"]["conv1"]["kernel"]
    kf, bias_f = fold(kernel, None, p["ffm"]["convblock"]["bn"],
                      st["ffm"]["convblock"]["bn"])
    # part channel ranges: (spatial 256, c16, c32) -- recover the context
    # widths from the ARM conv shapes so resnet18/101 both work
    c16 = p["arm1"]["conv"]["kernel"].shape[2]
    c32 = p["arm2"]["conv"]["kernel"].shape[2]
    offset = 0
    for i, c in enumerate((kernel.shape[2] - c16 - c32, c16, c32)):
        folded[f"ffm/convblock:p{i}"] = (kf[:, :, offset:offset + c],
                                         bias_f if i == 0 else None)
        offset += c

    for nm, node in (("ffm/conv1", p["ffm"]["conv1"]),
                     ("ffm/conv2", p["ffm"]["conv2"]),
                     ("conv", p["conv"])):
        folded[nm] = (node["kernel"], node["bias"])
    return folded


def _gap(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _forward(op, x, blocks, bottleneck):
    """The single topology walk (production serving graph: eval mode,
    ``fast_head`` ordering -- exact identity, ``models/bisenet.py:161``)."""
    sx = x
    for i in (1, 2, 3):
        sx = jax.nn.relu(op(f"spatial_path/convblock{i}", sx, 2, 1, 1))

    c = jax.nn.relu(op("context_path/conv1", x, 2, 3, 1))
    c = max_pool_3x3_s2(c)
    expansion = 4 if bottleneck else 1
    feats = []
    for stage_idx, (width, n_blocks) in enumerate(zip(_WIDTHS, blocks)):
        for block_idx in range(n_blocks):
            name = f"context_path/layer{stage_idx + 1}_{block_idx}"
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            needs_proj = block_idx == 0 and (
                stride != 1 or c.shape[-1] != width * expansion)
            identity = c
            if bottleneck:  # torchvision v1.5: stride on the 3x3
                out = jax.nn.relu(op(f"{name}/conv1", c, 1, 0, 1))
                out = jax.nn.relu(op(f"{name}/conv2", out, stride, 1, 1))
                out = op(f"{name}/conv3", out, 1, 0, 1)
            else:
                out = jax.nn.relu(op(f"{name}/conv1", c, stride, 1, 1))
                out = op(f"{name}/conv2", out, 1, 1, 1)
            if needs_proj:
                identity = op(f"{name}/downsample_conv", c, stride, 0, 1)
            c = jax.nn.relu(out + identity)
        feats.append(c)

    cx1, cx2 = feats[2], feats[3]
    tail = _gap(cx2)  # of the PRE-ARM feature (build_contextpath.py:27-29)
    cx1 = cx1 * jax.nn.sigmoid(op("arm1/conv", _gap(cx1), 1, 0, 1))
    cx2 = cx2 * jax.nn.sigmoid(op("arm2/conv", _gap(cx2), 1, 0, 1))
    cx2 = cx2 * tail

    sx_size = (sx.shape[1], sx.shape[2])
    cx1 = resize_bilinear(cx1, sx_size)
    cx2 = resize_bilinear(cx2, sx_size)

    feature = None
    for i, part in enumerate((sx, cx1, cx2)):
        y = op(f"ffm/convblock:p{i}", part, 1, 1, 1)
        feature = y if feature is None else feature + y
    feature = jax.nn.relu(feature)
    gate = jax.nn.relu(op("ffm/conv1", _gap(feature), 1, 0, 1))
    gate = jax.nn.sigmoid(op("ffm/conv2", gate, 1, 0, 1))
    out = feature * gate + feature

    out = op("conv", out, 1, 0, 1)
    return upsample_bilinear(out, 8)


def calibrate(variables, batches, folded=None, stat: str = "max",
              percentile: float = 99.9) -> dict:
    """Static activation scales over calibration batches (see
    ``ops/quant.py:calibrate_net``, incl. the ``stat``/``percentile``
    statistic choice).  ``folded``: pass a precomputed
    :func:`fold_bisenet` tree to avoid refolding."""
    if folded is None:
        folded = fold_bisenet(variables)
    blocks, bottleneck = _structure(folded)
    return calibrate_net(
        lambda op, x: _forward(op, x, blocks, bottleneck), folded, batches,
        stat=stat, percentile=percentile)


def default_policy(name: str, kernel_shape) -> bool:
    """Quantize everything EXCEPT the two 3-channel input stems, the
    tiny pooled gate convs, and the final logits conv.

    Measured e2e (``bench/quant_bench.py`` QB_E2E_MODEL=bisenet, v5e,
    b48 @1024x2048, the production serving config): this policy runs
    121.5 ms vs 151.7 bf16 = **1.249x** (316 -> 395 FPS/chip).  The
    round-2 shape-weighted microbench predicted <15% and even losses on
    the 64-ch convs -- e2e, every segment wins EXCEPT the 3-channel
    full-resolution stems (quantizing those two convs alone costs
    ~17 ms: ``all_convs`` measured 1.093x).  Partial policies stack
    sublinearly (ctx-only 1.154x, ctx+ffm 1.157x) -- quantize
    everything the stems/gates rule allows.  ARM/FFM gates are
    1x1-on-pooled (nothing to win); the final 1x1 produces the
    accuracy-critical logits."""
    if kernel_shape[2] <= 3:  # the 3-channel stems (spatial cb1 + 7x7)
        return False
    # ARM gates, FFM SE gates (NOT the split convblock parts), logits
    if name.startswith("arm") or name in ("ffm/conv1", "ffm/conv2",
                                          "conv"):
        return False
    return True


def build_quantized(variables, act_scales: dict, policy=default_policy,
                    folded=None):
    """Quantized param tree (see ``ops/quant.py:build_quantized_net``)."""
    if folded is None:
        folded = fold_bisenet(variables)
    return build_quantized_net(folded, act_scales, policy)


def bisenet_int8_apply(qtree, x, output_f32: bool = False):
    """The quantized serving forward (jittable; structure is recovered
    from the static dict keys)."""
    blocks, bottleneck = _structure(list(qtree["q8"]) + list(qtree["bf16"]))
    logits = _forward(make_quant_op(qtree), x.astype(jnp.bfloat16),
                      blocks, bottleneck)
    return logits.astype(jnp.float32) if output_f32 else logits


def bisenet_bf16_apply(variables, x, output_f32: bool = False,
                       dtype=jnp.bfloat16):
    """BN-folded forward through the SAME walk -- the apples-to-apples
    baseline, and (at ``dtype=float32``) the fold-exactness test surface
    against the flax model."""
    folded = fold_bisenet(variables)
    blocks, bottleneck = _structure(folded)
    logits = _forward(make_bf16_op(folded, out_dtype=dtype),
                      x.astype(dtype), blocks, bottleneck)
    return logits.astype(jnp.float32) if output_f32 else logits
