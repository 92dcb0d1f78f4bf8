"""Quantization-aware fine-tuning (QAT) over the W8A8 serving grid.

PTQ (``ops/quant.py``) measures ~zero mIoU cost at the shipped policies
and calibrations -- but PTQ failures are distribution-dependent, and a
user who DOES measure a drop (aggressive policy, clipped calibration,
hard data) needs a recovery path.  This module is that path, the
standard production recipe (Jacob et al. CVPR'18, applied post-hoc as a
fine-tune): take the trained checkpoint, fold BN, calibrate activation
scales exactly as serving would, then fine-tune the FOLDED weights with
the quantizers in the forward graph as straight-through estimators
(``ops/quant.py:fake_quant_{kernel,act}``).  The tuned weights re-export
onto the REAL int8 serving path with identical quantization -- the
fake-quant grid and ``quantize_kernel``'s grid are the same by
construction -- and :func:`writeback` turns them back into a standard
flax checkpoint (convs = tuned folded kernels, BNs rewritten to exact
identities) so every existing serving surface (Predictor, serve CLIs,
AOT export, pseudo-label sweeps) consumes the QAT result unchanged.

The reference has no quantization (torch fp32 only); effectiveness is
gated in ``tests/test_qat.py``: damage PTQ on purpose (aggressively
clipped calibration), show the mIoU drop, recover it with a short QAT
fine-tune, and verify the recovery SURVIVES export to the real int8
path and the write-back round trip.

Training semantics: BN is frozen-folded during QAT (the fine-tune
starts from serving-time statistics -- the same regime the exported
model runs in).  The write-back checkpoint is therefore a SERVING
checkpoint: its identity BNs carry no meaningful running statistics,
so do not resume batch-stats-mode training from it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from rtsds_tpu.ops.quant import build_quantized_net, make_fake_quant_op


class QATPrep(NamedTuple):
    """Everything :func:`prepare_qat` derives from the trained model.

    ``folded`` is the INITIAL folded tree -- training evolves it as
    ``state.params``; pass the live tree to :func:`export_int8` /
    :func:`writeback`."""

    model_name: str
    folded: dict
    act_scales: dict
    quant_names: frozenset


def _mod(model_name: str):
    if model_name == "deeplab":
        from rtsds_tpu.models import deeplab_int8 as q
    elif model_name == "bisenet":
        from rtsds_tpu.models import bisenet_int8 as q
    else:
        raise ValueError(f"no int8 path for model {model_name!r} "
                         "(expected 'bisenet' or 'deeplab')")
    return q


def _fold(model_name: str, variables) -> dict:
    q = _mod(model_name)
    return (q.fold_deeplab(variables) if model_name == "deeplab"
            else q.fold_bisenet(variables))


def _make_walk(model_name: str, names) -> Callable:
    """The model's topology walk closed over its static structure
    (recovered from the folded conv names, exactly as the int8 applies
    do)."""
    q = _mod(model_name)
    names = list(names)
    if model_name == "deeplab":
        block_counts = q._block_counts(names)
        return lambda op, x: q._forward(op, x, block_counts)
    blocks, bottleneck = q._structure(names)
    return lambda op, x: q._forward(op, x, blocks, bottleneck)


def prepare_qat(model_name: str, variables, calib_batches, policy=None,
                calib_stat: str = "max",
                calib_percentile: float = 99.9) -> QATPrep:
    """Fold + calibrate + select, exactly as PTQ serving would.

    ``calib_batches``: iterable of image batches AFTER the production
    preprocess (same contract as ``ops/quant.py:quantize_model``).  The
    returned prep carries the f32 folded tree (the QAT parameters), the
    static activation scales the fine-tune trains against, and the
    policy-selected conv set."""
    q = _mod(model_name)
    folded = _fold(model_name, variables)
    scales = q.calibrate(variables, calib_batches, folded=folded,
                         stat=calib_stat, percentile=calib_percentile)
    policy = q.default_policy if policy is None else policy
    quant_names = frozenset(
        name for name, (kernel, _) in folded.items()
        if policy(name, kernel.shape) and name in scales)
    folded = {name: (kernel.astype(jnp.float32),
                     None if bias is None else bias.astype(jnp.float32))
              for name, (kernel, bias) in folded.items()}
    return QATPrep(model_name, folded, dict(scales), quant_names)


def make_qat_apply(prep: QATPrep) -> Callable:
    """A flax-``apply``-shaped forward over the fake-quant walk, so the
    standard supervised step (``train/supervised.py:make_train_step``)
    drives QAT unchanged: ``apply_fn({'params': folded}, images,
    train=..., mutable=[]) -> (logits, {})``."""
    walk = _make_walk(prep.model_name, prep.folded)
    act_scales, quant_names = prep.act_scales, prep.quant_names

    def apply_fn(variables, images, train: bool = False, mutable=None):
        op = make_fake_quant_op(variables["params"], act_scales,
                                quant_names)
        logits = walk(op, images.astype(jnp.float32))
        if mutable is not None:
            return logits, {}
        return logits

    return apply_fn


def create_qat_state(prep: QATPrep, tx):
    """A :class:`~rtsds_tpu.train.state.TrainState` over the folded
    tree (``batch_stats=None`` -- BN is frozen-folded by construction),
    ready for ``make_train_step``."""
    from rtsds_tpu.train.state import TrainState

    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=prep.folded,
        batch_stats=None,
        opt_state=tx.init(prep.folded),
        apply_fn=make_qat_apply(prep),
        tx=tx,
    )


def export_int8(prep: QATPrep, folded=None):
    """Re-quantize the (tuned) folded tree onto the REAL serving path.

    Returns ``(apply_fn, qtree)`` with the same convention as
    ``ops/quant.py:quantize_model`` -- ``apply_fn(qtree, images)`` is
    the jittable int8 serving forward.  Quantization is identical to
    the fake-quant grid the fine-tune saw: per-channel max weights
    (recomputed on the tuned kernels), the SAME static activation
    scales, the SAME conv selection."""
    q = _mod(prep.model_name)
    folded = prep.folded if folded is None else folded
    qtree = build_quantized_net(folded, prep.act_scales,
                                lambda name, shape: name in prep.quant_names)
    int8_apply = (q.deeplab_int8_apply if prep.model_name == "deeplab"
                  else q.bisenet_int8_apply)

    def apply_fn(qtree, images, train: bool = False):
        del train
        return int8_apply(qtree, images)

    return apply_fn, qtree


# ---------------------------------------------------------------------------
# Activation-scale sidecar: the QAT grid must FOLLOW the checkpoint.
# Re-calibrating the written-back weights is NOT equivalent to serving
# the scales QAT trained against -- a percentile statistic always clips
# the same probability mass, so at aggressive settings recalibration
# re-applies the very damage QAT just repaired (measured: recalibrated
# 60th-pct serving lost 0.10 mIoU vs the sidecar grid on one seed).
# ---------------------------------------------------------------------------

SCALES_SIDECAR = "qat_act_scales.json"


def save_act_scales(out_dir: str, prep: QATPrep, calib_stat: str,
                    calib_percentile: float) -> str:
    """Persist the QAT activation scales next to the written-back
    checkpoint; ``Predictor.from_checkpoint(quantize='int8')`` picks
    them up automatically."""
    import json
    import os

    path = os.path.join(out_dir, SCALES_SIDECAR)
    with open(path, "w") as f:
        json.dump({
            "model": prep.model_name,
            "calib_stat": calib_stat,
            "calib_percentile": calib_percentile,
            "scales": {name: float(s)
                       for name, s in prep.act_scales.items()},
        }, f, indent=1, sort_keys=True)
    return path


def load_act_scales(checkpoint_dir: str):
    """Read a :data:`SCALES_SIDECAR` from ``checkpoint_dir`` if present:
    ``(scales, meta)`` or ``None``."""
    import json
    import os

    path = os.path.join(checkpoint_dir, SCALES_SIDECAR)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        meta = json.load(f)
    return {name: float(s) for name, s in meta.pop("scales").items()}, meta


# ---------------------------------------------------------------------------
# Write-back: tuned folded tree -> standard flax checkpoint variables.
# ---------------------------------------------------------------------------


def _identity_bn(params: dict, stats: dict, bias_f, dtype):
    """Rewrite a BN to the exact identity-plus-bias carrying the folded
    bias: scale=1, mean=0, var=1-eps (so ``rsqrt(var+eps) == 1.0``
    exactly), bias=bias_f.  Re-folding this BN reproduces the folded
    (kernel, bias) bit-for-bit -- the round-trip test in test_qat.py."""
    from rtsds_tpu.models.layers import BN_EPS

    shape = params["scale"].shape
    params["scale"] = jnp.ones(shape, dtype)
    params["bias"] = jnp.asarray(bias_f, dtype)
    stats["mean"] = jnp.zeros(shape, dtype)
    stats["var"] = jnp.full(shape, 1.0 - BN_EPS, dtype)


def writeback(model_name: str, variables, folded) -> dict:
    """Write a (tuned) folded tree back into flax checkpoint variables.

    Every conv kernel becomes the folded kernel and its BN becomes the
    exact identity carrying the folded bias, so the flax model's EVAL
    forward equals the folded walk and re-folding returns ``folded``
    unchanged.  The result is a SERVING checkpoint (see module
    docstring); train-only parameters (BiSeNet supervision heads) pass
    through untouched.
    """
    import copy

    from flax.core import unfreeze

    v = copy.deepcopy({"params": unfreeze(variables["params"]),
                       "batch_stats": unfreeze(variables["batch_stats"])})
    p, st = v["params"], v["batch_stats"]
    dtype = jnp.float32

    def put(node, key, value):
        node[key] = jnp.asarray(value, dtype)

    if model_name == "deeplab":
        import re

        put(p["conv1"], "kernel", folded["conv1"][0])
        _identity_bn(p["bn1"], st["bn1"], folded["conv1"][1], dtype)
        for name in p:
            if not re.fullmatch(r"layer[1-4]_\d+", name):
                continue
            pairs = [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
            if "downsample_conv" in p[name]:
                pairs.append(("downsample_conv", "downsample_bn"))
            for cv, bn in pairs:
                kernel, bias = folded[f"{name}/{cv}"]
                put(p[name][cv], "kernel", kernel)
                _identity_bn(p[name][bn], st[name][bn], bias, dtype)
        for key in p["layer6"]:
            kernel, bias = folded[f"layer6/{key}"]
            put(p["layer6"][key], "kernel", kernel)
            put(p["layer6"][key], "bias", bias)
        return v

    if model_name == "bisenet":
        import re

        for i in (1, 2, 3):
            name = f"spatial_path/convblock{i}"
            cb = p["spatial_path"][f"convblock{i}"]
            put(cb["conv1"], "kernel", folded[name][0])
            _identity_bn(cb["bn"],
                         st["spatial_path"][f"convblock{i}"]["bn"],
                         folded[name][1], dtype)
        cp, cst = p["context_path"], st["context_path"]
        put(cp["conv1"], "kernel", folded["context_path/conv1"][0])
        _identity_bn(cp["bn1"], cst["bn1"],
                     folded["context_path/conv1"][1], dtype)
        for name in cp:
            if not re.fullmatch(r"layer[1-4]_\d+", name):
                continue
            pairs = [("conv1", "bn1"), ("conv2", "bn2")]
            if "conv3" in cp[name]:
                pairs.append(("conv3", "bn3"))
            if "downsample_conv" in cp[name]:
                pairs.append(("downsample_conv", "downsample_bn"))
            for cv, bn in pairs:
                kernel, bias = folded[f"context_path/{name}/{cv}"]
                put(cp[name][cv], "kernel", kernel)
                _identity_bn(cp[name][bn], cst[name][bn], bias, dtype)
        for a in ("arm1", "arm2"):
            kernel, bias = folded[f"{a}/conv"]
            put(p[a]["conv"], "kernel", kernel)
            put(p[a]["conv"], "bias",
                jnp.zeros_like(p[a]["conv"]["bias"]))
            _identity_bn(p[a]["bn"], st[a]["bn"], bias, dtype)
        # split-form FFM parts re-concatenate along input channels
        kernel = jnp.concatenate(
            [folded[f"ffm/convblock:p{i}"][0] for i in range(3)], axis=2)
        put(p["ffm"]["convblock"]["conv1"], "kernel", kernel)
        _identity_bn(p["ffm"]["convblock"]["bn"],
                     st["ffm"]["convblock"]["bn"],
                     folded["ffm/convblock:p0"][1], dtype)
        for nm, node in (("ffm/conv1", p["ffm"]["conv1"]),
                         ("ffm/conv2", p["ffm"]["conv2"]),
                         ("conv", p["conv"])):
            kernel, bias = folded[nm]
            put(node, "kernel", kernel)
            put(node, "bias", bias)
        return v

    raise ValueError(f"no QAT write-back for model {model_name!r}")
