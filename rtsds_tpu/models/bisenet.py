"""BiSeNet: real-time bilateral segmentation network (Flax/NHWC).

Re-design of the reference implementation (``build_bisenet.py:8-172``) with
identical graph topology and channel math:

  * Spatial path: 3x ConvBlock(3x3, stride 2) -> 64 -> 128 -> 256 at 1/8 res
  * Context path: ResNet18/101 exposing (1/16, 1/32, tail) features
  * ARM on each context feature (global pool -> 1x1 conv -> BN -> sigmoid
    gate), tail-multiply on the 1/32 branch
  * bilinear upsample of both context branches to the spatial-path size,
    concat, FFM fuse (concat -> ConvBlock stride 1 -> SE-style gate ->
    mul + add)
  * 8x bilinear upsample + final 1x1 conv
  * training mode returns ``(result, cx1_sup, cx2_sup)`` with the two
    auxiliary supervision heads upsampled to input size
    (``build_bisenet.py:155-170``)

FFM input channels: resnet18 -> 1024 (256 spatial + 256 + 512 context),
resnet101 -> 3328 (256 + 1024 + 2048) (``build_bisenet.py:60-61,95-112``).

TPU-first: NHWC end to end; optional ``dtype=bfloat16`` runs convs on the
MXU in bf16 (params stay f32); the gating ops (sigmoid-mul chains) are
elementwise and fuse into the surrounding convs under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rtsds_tpu.models.layers import ConvBlock, batch_norm, conv, global_avg_pool, kaiming_normal_relu
from rtsds_tpu.models.resnet import FEATURE_CHANNELS, build_contextpath
from rtsds_tpu.ops.resize import resize_bilinear, upsample_bilinear
from rtsds_tpu.utils.dtypes import at_least_f32


class SpatialPath(nn.Module):
    """3 stride-2 ConvBlocks: 3 -> 64 -> 128 -> 256 (``build_bisenet.py:21-32``)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, x_s2d=None):
        x = ConvBlock(64, dtype=self.dtype, name="convblock1")(x, train,
                                                               x_s2d=x_s2d)
        x = ConvBlock(128, dtype=self.dtype, name="convblock2")(x, train)
        x = ConvBlock(256, dtype=self.dtype, name="convblock3")(x, train)
        return x


class AttentionRefinementModule(nn.Module):
    """Channel gate: global pool -> 1x1 conv -> BN -> sigmoid -> mul
    (``build_bisenet.py:35-53``)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.features, (
            f"in_channels and out_channels should all be {x.shape[-1]}")
        gate = global_avg_pool(x)
        gate = conv(self.features, 1, kernel_init=kaiming_normal_relu,
                    dtype=self.dtype, name="conv")(gate)
        gate = batch_norm(not train, name="bn", dtype=self.dtype)(gate)
        gate = nn.sigmoid(gate)
        return x * gate


class _SplitConv3x3(nn.Module):
    """3x3 stride-1 conv over a CHANNEL-CONCATENATED input, computed as a
    sum of per-part convs with the kernel sliced by channel range -- the
    concatenated tensor is never materialized.  The parameter is the full
    (3, 3, sum(Cin), Cout) HWIO kernel, identical to the concat form, so
    checkpoints/converters/goldens are unaffected.

    Why: XLA materializes the (N, H/8, W/8, 1024) FFM concat AND a 3.2 GB
    layout copy of it before the fused conv (measured 9.6 ms of a
    48-image serving batch on v5e)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, parts):
        import jax

        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", kaiming_normal_relu,
                            (3, 3, cin, self.features))
        dtype = self.dtype or parts[0].dtype
        kernel = kernel.astype(dtype)
        out = None
        offset = 0
        for p in parts:
            c = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(dtype), kernel[:, :, offset:offset + c], (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = y if out is None else out + y
            offset += c
        return out


class FeatureFusionModule(nn.Module):
    """Concat -> ConvBlock(stride 1) -> SE-style gate -> mul + add
    (``build_bisenet.py:56-81``).

    Accepts the fusion inputs as separate feature maps; the concat+conv is
    computed in split form (see :class:`_SplitConv3x3`)."""

    num_classes: int
    in_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, *parts, train: bool = False):
        assert sum(p.shape[-1] for p in parts) == self.in_channels, (
            f"in_channels of ConvBlock should be "
            f"{sum(p.shape[-1] for p in parts)}")
        # scope 'convblock/{conv1,bn}' matches the concat-form ConvBlock
        feature = ConvBlockSplit(self.num_classes, dtype=self.dtype,
                                 name="convblock")(parts, train)
        gate = global_avg_pool(feature)
        gate = nn.relu(conv(self.num_classes, 1, kernel_init=kaiming_normal_relu,
                            dtype=self.dtype, name="conv1")(gate))
        gate = nn.sigmoid(conv(self.num_classes, 1, kernel_init=kaiming_normal_relu,
                               dtype=self.dtype, name="conv2")(gate))
        return feature * gate + feature


class ConvBlockSplit(nn.Module):
    """ConvBlock (conv 3x3 s1 -> BN -> ReLU) over split channel parts;
    param tree identical to ConvBlock (conv1/kernel, bn/*)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, parts, train: bool = False):
        x = _SplitConv3x3(self.features, dtype=self.dtype,
                          name="conv1")(parts)
        x = batch_norm(not train, name="bn", dtype=self.dtype)(x)
        return nn.relu(x)


class BiSeNet(nn.Module):
    """BiSeNet with ResNet context path (``build_bisenet.py:84-172``).

    Call with NHWC float input.  ``train=True`` returns the 3-tuple
    ``(result, cx1_sup, cx2_sup)``; eval returns the main logits only
    (both NHWC with ``num_classes`` channels at input resolution).
    ``with_interpolation=False`` skips the final 8x upsample + 1x1 conv,
    matching the reference flag (``build_bisenet.py:85,165-167``).
    """

    num_classes: int = 19
    context_path: str = "resnet18"
    with_interpolation: bool = True
    # Apply the final 1x1 conv BEFORE the 8x upsample.  A 1x1 conv is a
    # per-pixel linear map and bilinear interpolation is a spatial linear
    # map with unit weight sums, so conv(upsample(x)) == upsample(conv(x))
    # exactly -- but the conv runs on 64x fewer pixels.  Set False for
    # bit-exact operation ordering vs the reference graph.
    fast_head: bool = True
    # rematerialize backbone blocks in the backward pass (training memory)
    remat: bool = False
    dtype: jnp.dtype | None = None
    # Space-to-depth stem: rearrange the input to (H/2, W/2, 12) ONCE and
    # run both 3-channel stride-2 stems (backbone 7x7 and spatial-path
    # 3x3) as dense stride-1 convs over it -- exact (kernel repack is
    # linear), same parameter layout. The shared rearrangement amortizes
    # the transpose that made the single-consumer s2d stem a net loss.
    s2d_stem: bool = False
    # Cast final logits up to f32 (needed for loss math / logit consumers).
    # Serving paths that immediately argmax should set False: materializing
    # f32 logits at 1024x2048x19 costs ~2x the bandwidth of the argmax
    # itself (measured ~10 ms/48-image batch on v5e).
    output_f32: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c16, c32 = FEATURE_CHANNELS[self.context_path]

        x_s2d = None
        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            from rtsds_tpu.models.layers import space_to_depth2

            x_s2d = space_to_depth2(
                x.astype(self.dtype) if self.dtype else x)

        sx = SpatialPath(dtype=self.dtype, name="spatial_path")(
            x, train, x_s2d=x_s2d)

        backbone = build_contextpath(self.context_path, dtype=self.dtype,
                                     remat=self.remat)
        cx1, cx2, tail = backbone.copy(name="context_path")(
            x, train=train, x_s2d=x_s2d)

        cx1 = AttentionRefinementModule(c16, dtype=self.dtype,
                                        name="arm1")(cx1, train)
        cx2 = AttentionRefinementModule(c32, dtype=self.dtype,
                                        name="arm2")(cx2, train)
        cx2 = cx2 * tail

        sx_size = (sx.shape[1], sx.shape[2])
        cx1 = resize_bilinear(cx1, sx_size)
        cx2 = resize_bilinear(cx2, sx_size)

        if train:
            in_size = (x.shape[1], x.shape[2])
            cx1_sup = conv(self.num_classes, 1, kernel_init=kaiming_normal_relu,
                           dtype=self.dtype, name="supervision1")(cx1)
            cx2_sup = conv(self.num_classes, 1, kernel_init=kaiming_normal_relu,
                           dtype=self.dtype, name="supervision2")(cx2)
            cx1_sup = at_least_f32(resize_bilinear(cx1_sup, in_size))
            cx2_sup = at_least_f32(resize_bilinear(cx2_sup, in_size))

        result = FeatureFusionModule(
            self.num_classes, 256 + c16 + c32, dtype=self.dtype,
            name="ffm")(sx, cx1, cx2, train=train)

        if self.with_interpolation:
            final_conv = conv(self.num_classes, 1,
                              kernel_init=kaiming_normal_relu,
                              dtype=self.dtype, name="conv")
            if self.fast_head:
                result = upsample_bilinear(final_conv(result), 8)
            else:
                result = final_conv(upsample_bilinear(result, 8))
        if self.output_f32:
            result = at_least_f32(result)

        if train:
            return result, cx1_sup, cx2_sup
        return result


def head_lr_multiplier_mask(params, head_mult: float = 10.0) -> dict:
    """Pytree of LR multipliers: ``head_mult`` for every non-backbone
    module (spatial path, ARMs, FFM, supervision heads, final conv), 1x
    for the pretrained context path.

    This is the reference's ``mul_lr`` intent (``build_bisenet.py:121-128``
    collects exactly these modules for per-module LR but never consumes
    the list).  Config-reachable via ``model.bisenet.optimizer.
    head_lr_mult`` (and the DA generator's optimizer section).
    """
    import jax

    def mult(path, _):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        return 1.0 if keys and keys[0] == "context_path" else float(head_mult)

    return jax.tree_util.tree_map_with_path(mult, params)
