"""Shared building blocks (NHWC, Flax linen).

Initializer parity with the reference:
  * ``kaiming_normal(mode='fan_in', nonlinearity='relu')`` for BiSeNet
    head convs (``build_bisenet.py:130-138``) ->
    ``variance_scaling(2.0, 'fan_in', 'truncated_normal'=False normal)``
  * torch's default Conv2d init (kaiming_uniform with a=sqrt(5)) for
    backbone/discriminator convs -> ``variance_scaling(1/3, 'fan_in',
    'uniform')``
  * ``normal(0, 0.01)`` for DeepLabV2 (``deeplabv2.py:85-90``)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn.initializers import normal, variance_scaling

# torch nn.init.kaiming_normal_(mode='fan_in', nonlinearity='relu')
kaiming_normal_relu = variance_scaling(2.0, "fan_in", "normal")
# torch default Conv2d kernel init: kaiming_uniform_(a=sqrt(5))
torch_default_conv = variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# deeplabv2.py:87 weight init
normal_001 = normal(stddev=0.01)

# torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def conv(features: int, kernel: int = 3, stride: int = 1, padding: int = 0,
         dilation: int = 1, use_bias: bool = True,
         kernel_init: Callable = torch_default_conv, name: str | None = None,
         dtype=None) -> nn.Conv:
    """2-D conv with torch-style symmetric integer padding."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        kernel_init=kernel_init,
        dtype=dtype,
        name=name,
    )


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-stat semantics.

    flax ``nn.BatchNorm`` folds the *biased* batch variance into the
    running average; torch uses the Bessel-corrected (unbiased) variance
    for the running update (normalization itself uses the biased one in
    both).  The n/(n-1) factor is negligible for feature maps but large
    for the ARM/FFM gate BNs, whose statistics reduce over only N values
    (batch 4 -> running_var 33% off).  Param/stat names and layout match
    flax BatchNorm ("scale"/"bias", batch_stats "mean"/"var"), so
    checkpoints and the torch converter are unaffected.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        # statistics at >= f32 even when compute dtype is bf16 (and f64 in
        # float64 parity runs); the convert fuses into the reduction, so no
        # f32 copy of the activation is materialized
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes, dtype=stat_dtype)
            var = jnp.mean(jnp.square(x.astype(stat_dtype)), axis=axes) \
                - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // features
                bessel = n / max(n - 1, 1)
                m = self.momentum
                # store in the incoming stat dtype (f32 in production,
                # f64 under float64 parity runs)
                ra_dtype = ra_mean.value.dtype
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean).astype(ra_dtype)
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var * bessel).astype(ra_dtype)
        # normalization arithmetic in the COMPUTE dtype (per-channel inv/
        # mean are f32-precomputed (C,) vectors, cast once): avoids
        # materializing an f32 copy of the bf16 activation -- measured
        # ~4 ms/step of f32 convert+subtract+multiply traffic in the bf16
        # 720x1280 b4 backward.  f32/f64 inputs keep full-precision math.
        compute_dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(stat_dtype)
        y = (x.astype(compute_dtype) - mean.astype(compute_dtype)) \
            * inv.astype(compute_dtype) + bias.astype(compute_dtype)
        return y


def batch_norm(use_running_average: bool, name: str | None = None,
               dtype=None) -> TorchBatchNorm:
    return TorchBatchNorm(
        use_running_average=use_running_average,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


def space_to_depth2(x):
    """NHWC 2x2 space-to-depth; channel blocks ordered (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


class Conv3x3Stride2(nn.Module):
    """3x3 stride-2 conv (pad 1, no bias) with an exact space-to-depth
    fast path: equivalent to a 2x2 stride-1 conv over ``space_to_depth2``
    input with the taps repacked by output phase.  Parameter layout is the
    plain (3, 3, Cin, Cout) HWIO kernel either way, so checkpoints and
    converters are unaffected.  Pass ``x_s2d`` (the rearranged input,
    shared across consumers) to take the fast path."""

    features: int
    kernel_init: Callable = kaiming_normal_relu
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_s2d=None):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, in_ch, self.features))
        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        if x_s2d is None:
            return jax.lax.conv_general_dilated(
                x.astype(dtype), kernel, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # tap u (pad-left 1) maps to (phase dy = (u+1) % 2, block (u+1)//2)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(2, 2, 2, 2, in_ch, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * in_ch,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            x_s2d.astype(dtype), kp, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBlock(nn.Module):
    """Conv -> BN -> ReLU (``build_bisenet.py:8-18``); default stride 2.

    ``x_s2d`` (only meaningful for the 3x3/stride-2 configuration) routes
    the conv through the space-to-depth fast path with a caller-provided
    rearranged input."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    kernel_init: Callable = kaiming_normal_relu
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, x_s2d=None):
        if x_s2d is not None:
            assert self.kernel == 3 and self.stride == 2 and self.padding == 1
            x = Conv3x3Stride2(self.features, kernel_init=self.kernel_init,
                               dtype=self.dtype, name="conv1")(x, x_s2d)
        else:
            x = conv(self.features, self.kernel, self.stride, self.padding,
                     use_bias=False, kernel_init=self.kernel_init,
                     dtype=self.dtype, name="conv1")(x)
        x = batch_norm(not train, name="bn", dtype=self.dtype)(x)
        return nn.relu(x)


def global_avg_pool(x, keepdims: bool = True):
    """Adaptive average pool to 1x1 over NHWC spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


class Stem7x7(nn.Module):
    """7x7 stride-2 stem conv with an exact space-to-depth fast path.

    A 7x7/s2 conv on (H, W, C) equals a 4x4/s1 conv on the 2x2
    space-to-depth rearrangement (H/2, W/2, 4C) with the kernel taps
    repacked by output phase -- same math, but the TPU conv runs with 4x
    the input channels and half the spatial extent: the conv itself
    measured 2.9x faster on v5e (0.24 vs 0.68 ms/img at 1024x2048).
    HOWEVER the in-graph space-to-depth transpose of the raw input costs
    more than the conv saves at the full model level (BiSeNet end-to-end
    regressed 293 -> 267 FPS), so ``s2d`` defaults to OFF; it pays off
    only when the rearrangement can be fused upstream (e.g. done once on
    the host or shared across consumers).  Odd inputs fall back to the
    standard conv.  The parameter keeps the torchvision (7, 7, C, O)
    kernel layout, so checkpoints and converters are unaffected; the
    repack is linear, so gradients flow exactly.
    """

    features: int = 64
    kernel_init: Callable = torch_default_conv
    s2d: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_s2d=None):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (7, 7, in_ch, self.features))
        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
        n, h, w, c = x.shape
        if x_s2d is None and (not self.s2d or h % 2 or w % 2):
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # kernel repack: tap u maps to (block q = (u+1)//2, phase dy = (u+1)%2)
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, in_ch, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * in_ch,
                                                  self.features)
        # space-to-depth with matching (dy, dx, c) channel order --
        # x_s2d lets several consumers share one rearrangement
        x2 = space_to_depth2(x) if x_s2d is None else x_s2d.astype(dtype)
        return jax.lax.conv_general_dilated(
            x2, k, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool_3x3_s2(x, ceil_mode: bool = False):
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)``.

    ``ceil_mode=True`` (DeepLabV2's stem, ``deeplabv2.py:79``) pads the high
    edge so partial windows are kept; window counts follow torch's formula.
    """
    k, s, p = 3, 2, 1
    h, w = x.shape[1], x.shape[2]

    def hi_pad(size: int) -> int:
        if ceil_mode:
            out = -(-(size + 2 * p - k) // s) + 1
            # torch: skip a window that would start entirely in the padding
            if (out - 1) * s >= size + p:
                out -= 1
        else:
            out = (size + 2 * p - k) // s + 1
        return max((out - 1) * s + k - size - p, 0)

    padding = ((p, hi_pad(h)), (p, hi_pad(w)))
    return nn.max_pool(x, window_shape=(k, k), strides=(s, s), padding=padding)
