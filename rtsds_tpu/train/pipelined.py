"""Pipelined supervised train step: DeepLabV2 with its homogeneous layer3
bottlenecks GPipe-scheduled over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.3: a single
``nn.DataParallel`` wrap); this is the TPU-native extension for the regime
where layer3 -- 22 identical dilated bottlenecks holding the bulk of
DeepLab-R101's parameters and activations (``deeplabv2.py:82-83`` in the
reference) -- dominates one chip's HBM.  The network splits into

  front  (stem, layer1, layer2, layer3_0)       -- replicated
  blocks (layer3_1 .. layer3_{n-1})             -- pipelined over ``pipe``
  tail   (layer4, ASPP, upsample)               -- replicated

and the whole forward+backward compiles into ONE jit program:
``jax.value_and_grad`` differentiates straight through the GPipe tick loop
(``parallel/pipeline.py:pipeline_apply_stateful``), so the reverse schedule
falls out of autodiff instead of hand-written send/recv bookkeeping.

Semantics are EXACTLY gradient accumulation over M microbatches
(``train/accumulate.py``, the standard GPipe contract): per-microbatch
BatchNorm statistics, running stats updated sequentially in microbatch
order, gradients averaged, ONE optimizer update per step -- unit-tested
equal to the accumulating step.  Stage parameters enter the schedule
sharded over ``pipe`` (a free local slice of the replicated tree), so the
train state, checkpoints, optimizer masks, EMA, and serving are all
unchanged.  The mesh deliberately rejects composing ``pipe`` with the
data/spatial/model axes (a data axis inside the schedule would silently
turn sync-BN into per-shard BN); when parameter HBM is the constraint,
use ``mesh: {model: N}`` FSDP instead of pipelining.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rtsds_tpu.ops.losses import segmentation_loss
from rtsds_tpu.parallel.pipeline import (
    pipeline_apply_stateful,
    stack_block_params,
)


def _deeplab_segments(model):
    """Split a DeepLabV2 module into (front, pipe-block, tail) appliers.

    Mirrors ``models/deeplabv2.py:DeepLabV2.__call__`` submodule-by-
    submodule with identical names, so the segment functions consume the
    model's own variable tree; any topology drift breaks the
    pipelined-vs-accumulate equality test immediately.
    """
    from rtsds_tpu.models.deeplabv2 import ASPP, DeepLabV2
    from rtsds_tpu.models.layers import (
        Stem7x7,
        batch_norm,
        max_pool_3x3_s2,
        normal_001,
    )
    from rtsds_tpu.models.resnet import Bottleneck
    from rtsds_tpu.utils.dtypes import at_least_f32

    if not isinstance(model, DeepLabV2):
        raise ValueError(
            f"pipelined training supports DeepLabV2 only (its layer3 "
            f"bottlenecks are the homogeneous stage unit); got "
            f"{type(model).__name__}")
    n1, n2, n3, n4 = model.layers
    if n3 < 2:
        raise ValueError(f"layers={model.layers} has no homogeneous "
                         f"layer3 blocks to pipeline")
    dtype = model.dtype

    def block(width, stride, dilation, proj):
        return Bottleneck(features=width, stride=stride, dilation=dilation,
                          downsample=proj, stride_in_1x1=True, dtype=dtype)

    stem = Stem7x7(features=64, kernel_init=normal_001, dtype=dtype)
    bn1 = batch_norm(False, dtype=dtype)  # train-mode BN
    # (width, stride, dilation) per stage, as in DeepLabV2.__call__; the
    # first block of every stage projects (stride, channel change, or
    # dilation -- true for all four stages of every DeepLab config)
    front_blocks = (
        [(f"layer1_{i}", block(64, 1, 1, i == 0)) for i in range(n1)]
        + [(f"layer2_{i}", block(128, 2 if i == 0 else 1, 1, i == 0))
           for i in range(n2)]
        + [("layer3_0", block(256, 1, 2, True))])
    pipe_block = block(256, 1, 2, False)
    pipe_names = [f"layer3_{i}" for i in range(1, n3)]
    tail_blocks = [(f"layer4_{i}", block(512, 1, 4, i == 0))
                   for i in range(n4)]
    aspp = ASPP(model.num_classes, dtype=dtype)

    def apply_block(mod, params, stats, x):
        (y, vs) = mod.apply({"params": params, "batch_stats": stats}, x,
                            True, mutable=["batch_stats"])
        return y, vs["batch_stats"]

    def front(params, stats, x):
        new_stats = {}
        h = stem.apply({"params": params["conv1"]}, x)
        h, vs = bn1.apply(
            {"params": params["bn1"], "batch_stats": stats["bn1"]}, h,
            mutable=["batch_stats"])
        new_stats["bn1"] = vs["batch_stats"]
        h = jax.nn.relu(h)
        h = max_pool_3x3_s2(h, ceil_mode=True)
        for name, mod in front_blocks:
            h, new_stats[name] = apply_block(mod, params[name], stats[name], h)
        return h, new_stats

    def pipe_fn(params_i, stats_i, x):
        return apply_block(pipe_block, params_i, stats_i, x)

    def tail(params, stats, h, in_size):
        new_stats = {}
        for name, mod in tail_blocks:
            h, new_stats[name] = apply_block(mod, params[name], stats[name], h)
        logits = aspp.apply({"params": params["layer6"]}, h)
        from rtsds_tpu.ops.resize import resize_bilinear

        logits = resize_bilinear(logits, in_size)
        if model.output_f32:
            logits = at_least_f32(logits)
        return logits, new_stats

    front_names = ["conv1", "bn1"] + [n for n, _ in front_blocks]
    tail_names = [n for n, _ in tail_blocks] + ["layer6"]
    return front, pipe_fn, tail, front_names, pipe_names, tail_names


def make_pipelined_train_step(model, mesh: Mesh, ignore_index: int | None = 19,
                              num_microbatches: int | None = None,
                              donate: bool = True):
    """Returns ``train_step(state, images, labels) -> (state, metrics)``
    with layer3 pipelined over the mesh's ``pipe`` axis.

    ``num_microbatches`` (default: the pipe axis size) must divide the
    batch; bubble overhead is ``(P-1)/(M+P-1)``.  Metrics match
    ``make_train_step`` so the supervised loop is unchanged.
    """
    front, pipe_fn, tail, _, pipe_names, _ = _deeplab_segments(model)
    n_stages = mesh.shape["pipe"]
    if len(pipe_names) % n_stages:
        valid = [p for p in range(1, len(pipe_names) + 1)
                 if len(pipe_names) % p == 0]
        raise ValueError(
            f"{len(pipe_names)} homogeneous layer3 blocks (layers="
            f"{model.layers}) do not split over pipe={n_stages} stages; "
            f"valid pipe sizes: {valid}")
    n_micro = n_stages if num_microbatches is None else int(num_microbatches)
    if n_micro < 1:
        raise ValueError(f"num_microbatches={num_microbatches} must be >= 1")

    def train_step(state, images, labels):
        if images.shape[0] % n_micro:
            raise ValueError(
                f"batch {images.shape[0]} does not split into {n_micro} "
                f"pipeline microbatches")
        in_size = (images.shape[1], images.shape[2])
        imgs = images.reshape(n_micro, images.shape[0] // n_micro,
                              *images.shape[1:])
        lbls = labels.reshape(n_micro, labels.shape[0] // n_micro,
                              *labels.shape[1:])

        def loss_fn(params):
            stats = state.batch_stats

            # front: microbatches in sequence, running stats threaded
            # (identical to the accumulate scan)
            def front_body(carry, x_mb):
                h, new_stats = front(params, carry, x_mb)
                return ({**carry, **new_stats}, h)

            stats_after_front, hs = jax.lax.scan(front_body, stats, imgs)

            # layer3_1..n: the GPipe schedule over the pipe axis
            stacked_p = stack_block_params([params[n] for n in pipe_names])
            stacked_s = stack_block_params([stats[n] for n in pipe_names])
            hs, new_stacked_s = pipeline_apply_stateful(
                pipe_fn, stacked_p, stacked_s, hs, mesh)

            # tail: per-microbatch loss exactly as accumulate computes it
            def tail_body(carry, mb):
                stats_c, loss_acc, correct_acc = carry
                h_mb, lbl_mb = mb
                logits, new_stats = tail(params, stats_c, h_mb, in_size)
                loss = segmentation_loss((logits, None, None), lbl_mb,
                                         ignore_index)
                preds = jnp.argmax(logits, axis=-1)
                correct = jnp.sum(preds == lbl_mb)
                return (({**stats_c, **new_stats}, loss_acc + loss,
                         correct_acc + correct), None)

            (stats_final, loss_sum, correct), _ = jax.lax.scan(
                tail_body,
                (stats_after_front, jnp.zeros((), jnp.result_type(float)),
                 jnp.zeros((), jnp.result_type(int))), (hs, lbls))
            for i, name in enumerate(pipe_names):
                stats_final = {
                    **stats_final,
                    name: jax.tree_util.tree_map(lambda s, i=i: s[i],
                                                 new_stacked_s),
                }
            return loss_sum / n_micro, (stats_final, correct)

        (loss, (new_stats, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {
            "train_loss": loss,
            "correct": correct,
            "total": jnp.asarray(labels.size, jnp.int32),
        }
        return state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)
