"""ResNet backbones (torchvision-compatible graph, NHWC/Flax).

These serve as BiSeNet's context path (``build_contextpath.py:5-64``): the
standard torchvision resnet18/resnet101 rewired to return the 1/16 and 1/32
feature maps plus a global-average "tail" of the last stage
(``build_contextpath.py:18-29``).

TPU-first notes: NHWC layout throughout; an optional ``dtype`` runs the
conv/matmul path in bfloat16 for the MXU while params stay float32.
Weight-name structure is kept 1:1 with torchvision (conv1, bn1,
layer{1..4}.{i}.conv{j}/bn{j}/downsample) so ImageNet checkpoints convert
mechanically (see ``rtsds_tpu/models/pretrained.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rtsds_tpu.models.layers import (
    Stem7x7,
    batch_norm,
    conv,
    global_avg_pool,
    max_pool_3x3_s2,
    torch_default_conv,
)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs + identity/projection skip."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv(self.features, 3, self.stride, 1, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = batch_norm(not train, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features, 3, 1, 1, use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = batch_norm(not train, name="bn2", dtype=self.dtype)(out)
        if self.downsample:
            identity = conv(self.features, 1, self.stride, 0, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = batch_norm(not train, name="downsample_bn",
                                  dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv).

    ``stride_in_1x1=True`` gives the original-ResNet placement the DeepLabV2
    reference uses (``deeplabv2.py:13`` puts stride on conv1).
    ``dilation`` dilates the 3x3 conv (``deeplabv2.py:19-20``).
    """

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    stride_in_1x1: bool = False
    # fully-frozen BN: normalize with running stats even in train mode
    # and never update them (skips the per-step stat reductions; the
    # reference keeps batch-stats mode, so this is opt-in -- see
    # DeepLabV2.bn_eval)
    bn_eval: bool = False
    dtype: jnp.dtype | None = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        ra = (not train) or self.bn_eval
        identity = x
        out = conv(self.features, 1, s1, 0, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = batch_norm(ra, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features, 3, s3, self.dilation, dilation=self.dilation,
                   use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(ra, name="bn2", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv(self.features * self.expansion, 1, 1, 0, use_bias=False,
                   dtype=self.dtype, name="conv3")(out)
        out = batch_norm(ra, name="bn3", dtype=self.dtype)(out)
        if self.downsample:
            identity = conv(self.features * self.expansion, 1, self.stride, 0,
                            use_bias=False, dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = batch_norm(ra, name="downsample_bn",
                                  dtype=self.dtype)(identity)
        return nn.relu(out + identity)


_STAGES = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
}

# context-path channel counts at (1/16, 1/32) resolution per backbone,
# matching the ARM/FFM wiring in build_bisenet.py:95-112
FEATURE_CHANNELS = {"resnet18": (256, 512), "resnet101": (1024, 2048)}


class ResNetBackbone(nn.Module):
    """Multi-scale feature extractor: returns (C3 @1/16, C4 @1/32, tail).

    ``tail`` is the global average of C4 with keepdims, i.e. shape
    (N, 1, 1, C) -- the context-path tail of ``build_contextpath.py:27-29``.
    """

    arch: str = "resnet18"
    dtype: jnp.dtype | None = None
    # rematerialize each residual block in the backward pass: trades ~1
    # extra forward of FLOPs for dropping all intra-block activations --
    # the jax.checkpoint analog of gradient checkpointing, for large
    # training batches/resolutions
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, x_s2d=None):
        base_cls, layers = _STAGES[self.arch]
        expansion = getattr(base_cls, "expansion", 1)
        block_cls = nn.remat(base_cls, static_argnums=(2,)) if self.remat \
            else base_cls
        x = Stem7x7(features=64, dtype=self.dtype, name="conv1")(x, x_s2d)
        x = batch_norm(not train, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        widths = (64, 128, 256, 512)
        feats = []
        for stage_idx, (width, n_blocks) in enumerate(zip(widths, layers)):
            for block_idx in range(n_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                needs_proj = block_idx == 0 and (
                    stride != 1 or x.shape[-1] != width * expansion)
                x = block_cls(
                    features=width, stride=stride, downsample=needs_proj,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}")(x, train)
            feats.append(x)

        feature3, feature4 = feats[2], feats[3]  # 1/16, 1/32
        tail = global_avg_pool(feature4)
        return feature3, feature4, tail


def build_contextpath(name: str, dtype=None, remat: bool = False) -> ResNetBackbone:
    """Factory matching ``build_contextpath.py:59-64`` (without its bug of
    eagerly constructing both backbones)."""
    if name not in _STAGES:
        raise ValueError(f"unsupported context_path network {name!r}")
    return ResNetBackbone(arch=name, dtype=dtype, remat=remat)


# kept importable for discriminators/backbones that use torch's default init
__all__ = ["BasicBlock", "Bottleneck", "ResNetBackbone", "build_contextpath",
           "FEATURE_CHANNELS", "torch_default_conv"]
