"""DeepLabV2: dilated ResNet-101 + ASPP classifier (Flax/NHWC).

Re-design of the reference ``ResNetMulti`` (``deeplabv2.py:7-190``):

  * stem: 7x7 s2 conv, BN, ReLU, 3x3 s2 maxpool with ``ceil_mode=True``
    (``deeplabv2.py:73-79``)
  * Bottleneck [3, 4, 23, 3] with stride on the **1x1** conv (original
    ResNet placement, ``deeplabv2.py:13``); layer3 dilation 2 / stride 1,
    layer4 dilation 4 / stride 1 (``deeplabv2.py:82-83``); a projection
    shortcut on every dilated stage's first block (``deeplabv2.py:94-97``)
  * ASPP head: 4 parallel 3x3 convs with dilation/padding 6/12/18/24,
    outputs summed (``deeplabv2.py:50-66``)
  * logits bilinearly upsampled to input H x W (``deeplabv2.py:126``);
    training returns ``(x, None, None)`` to match the BiSeNet tuple
    contract (``deeplabv2.py:128-130``)

Frozen-BN semantics (``deeplabv2.py:14-27``): affine params never train.
In the reference the BN layers still run in batch-stats mode during
training; we reproduce that by keeping standard BatchNorm modules and
masking their scale/bias out of the optimizer update with
:func:`frozen_bn_mask` (applied by the train-state factory).  Weight init
is normal(0, 0.01) everywhere (``deeplabv2.py:85-90``).

Discriminative LRs: the reference defines 1x backbone / 10x classifier
param groups (``deeplabv2.py:133-173``) but never uses them; we expose the
same split as :func:`lr_multiplier_mask` so it can actually be applied.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rtsds_tpu.models.layers import Stem7x7, batch_norm, conv, max_pool_3x3_s2, normal_001
from rtsds_tpu.models.resnet import Bottleneck
from rtsds_tpu.ops.resize import resize_bilinear
from rtsds_tpu.utils.dtypes import at_least_f32


class ASPP(nn.Module):
    """ClassifierModule: sum of 4 dilated 3x3 convs (``deeplabv2.py:50-66``)."""

    num_classes: int
    dilations: tuple[int, ...] = (6, 12, 18, 24)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            branch = conv(self.num_classes, 3, 1, d, dilation=d, use_bias=True,
                          kernel_init=normal_001, dtype=self.dtype,
                          name=f"conv2d_list_{i}")(x)
            out = branch if out is None else out + branch
        return out


class DeepLabV2(nn.Module):
    """ResNetMulti(Bottleneck, [3, 4, 23, 3]) + ASPP (``deeplabv2.py:69-131``)."""

    num_classes: int = 19
    layers: tuple[int, ...] = (3, 4, 23, 3)
    dtype: jnp.dtype | None = None
    # serving paths that immediately argmax can skip the f32 logits cast
    output_f32: bool = True
    # rematerialize bottleneck blocks in the backward pass (training memory)
    remat: bool = False
    # fully-frozen BN (ours, opt-in): normalize with the running stats
    # even during training and never update them.  The reference keeps
    # its frozen-affine BNs in batch-stats mode while training
    # (deeplabv2.py:14-27 semantics, reproduced by default); most
    # DeepLab DA codebases freeze BN entirely -- this knob offers that
    # recipe AND skips the per-step BN stat reductions (measured on
    # TPU: see PERF.md).  Config: model.deeplab.bn_eval.
    bn_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat \
            else Bottleneck
        in_size = (x.shape[1], x.shape[2])
        x = Stem7x7(features=64, kernel_init=normal_001, dtype=self.dtype,
                    name="conv1")(x)
        x = batch_norm((not train) or self.bn_eval, name="bn1",
                       dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x, ceil_mode=True)

        # (width, stride, dilation) per stage (deeplabv2.py:80-83)
        stages = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        for stage_idx, ((width, stride, dilation), n_blocks) in enumerate(
                zip(stages, self.layers)):
            for block_idx in range(n_blocks):
                first = block_idx == 0
                # reference projects when stride != 1, channels change, or
                # the stage is dilated (deeplabv2.py:94-97)
                needs_proj = first and (
                    stride != 1 or x.shape[-1] != width * 4 or dilation in (2, 4))
                x = block_cls(
                    features=width,
                    stride=stride if first else 1,
                    dilation=dilation,
                    downsample=needs_proj,
                    stride_in_1x1=True,
                    bn_eval=self.bn_eval,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)

        x = ASPP(self.num_classes, dtype=self.dtype, name="layer6")(x)
        x = resize_bilinear(x, in_size)
        if self.output_f32:
            x = at_least_f32(x)

        if train:
            return x, None, None
        return x


def get_deeplab_v2(num_classes: int = 19, pretrain: bool = False,
                   pretrain_model_path: str = "", dtype=None):
    """Factory matching ``get_deeplab_v2`` (``deeplabv2.py:176-190``).

    Returns (module, pretrained_params_or_None).  Pretrained ingestion
    strips the leading state-dict key segment and loads non-strictly, like
    the reference; see ``rtsds_tpu/models/pretrained.py``.
    """
    model = DeepLabV2(num_classes=num_classes, dtype=dtype)
    params = None
    if pretrain:
        from rtsds_tpu.models.pretrained import load_deeplab_pretrained
        params = load_deeplab_pretrained(pretrain_model_path)
    return model, params


def _is_frozen_bn(path: tuple[str, ...]) -> bool:
    """All BN affine params in the backbone are frozen; the ASPP head has
    no BN, so freezing every BatchNorm scale/bias matches the reference."""
    return any(p.startswith("bn") or p == "downsample_bn" for p in path)


def frozen_bn_mask(params) -> dict:
    """Pytree mask: True where the param must NOT be updated."""
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_frozen_bn(
            tuple(p.key for p in path if hasattr(p, "key"))),
        params)


def lr_multiplier_mask(params, head_mult: float = 10.0) -> dict:
    """Pytree of LR multipliers: ``head_mult`` (default 10x) for the ASPP
    classifier ('layer6'), 1x elsewhere (``deeplabv2.py:171-173``).

    Config-reachable via ``model.deeplab.optimizer.head_lr_mult``."""
    import jax

    def mult(path, _):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        return float(head_mult) if any(k == "layer6" for k in keys) else 1.0

    return jax.tree_util.tree_map_with_path(mult, params)
