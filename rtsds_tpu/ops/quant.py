"""Post-training W8A8 quantization primitives for TPU serving.

The MXU's int8 path has 2x the bf16 peak (v5e: 394 vs 197 TOPS) and int8
activations halve HBM traffic.  Round 2 measured and REJECTED int8 for
BiSeNet (bandwidth-bound high-res low-channel profile, PERF.md); DeepLab's
deep /8-resolution bottlenecks are the profile where it pays
(``bench/quant_bench.py`` measures per-shape).  The reference has no
quantization (torch fp32 only); this is a TPU-native extension.

Scheme (the production-standard PTQ recipe):
  * frozen BatchNorm folded into the preceding conv (exact -- DeepLab
    serves with running stats, so BN is a per-channel affine);
  * weights: symmetric per-output-channel int8;
  * activations: symmetric per-tensor int8 with STATIC scales from a
    calibration pass (max-abs over N batches) -- no per-step reductions
    in the serving graph;
  * accumulation in int32 on the MXU, dequantize + bias + relu in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def fold_bn(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var,
            eps: float = 1e-5):
    """Fold an inference-mode BatchNorm into the preceding conv.

    conv(x, W) + b followed by ``(y - mean) * scale/sqrt(var+eps) + bias``
    equals ``conv(x, W * g) + (b - mean) * g + bias`` with
    ``g = scale / sqrt(var + eps)`` applied per output channel.  Exact in
    f32 (unit-tested); DeepLab's backbone BNs are frozen AND in
    running-average mode at serving time (``models/deeplabv2.py:17-22``),
    so folding changes nothing semantically.
    """
    g = bn_scale / jnp.sqrt(bn_var + eps)
    kernel_f = kernel * g  # (kh, kw, cin, cout) * (cout,)
    if bias is None:
        bias = jnp.zeros_like(bn_mean)
    bias_f = (bias - bn_mean) * g + bn_bias
    return kernel_f, bias_f


def quantize_kernel(kernel):
    """Symmetric per-output-channel int8 weights.

    Returns ``(w_q int8, w_scale f32 (cout,))`` with
    ``kernel ~= w_q * w_scale``.
    """
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    w_scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    return w_q, w_scale.astype(jnp.float32)


def quantize_act(x, scale):
    """Symmetric per-tensor int8 activation with a static scale."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def conv_w8a8(x_q, w_q, x_scale, w_scale, bias, stride=1, padding=0,
              dilation=1, out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 conv on the MXU, dequantized to ``out_dtype``.

    ``bias`` is the BN-folded f32 bias (added after dequantization, so its
    precision is not quantized away).
    """
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (w_scale * x_scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def conv_bf16(x, kernel, bias, stride=1, padding=0, dilation=1,
              out_dtype=jnp.bfloat16):
    """The unquantized counterpart (BN already folded), for layers the
    per-shape measurement says to keep in bf16."""
    y = jax.lax.conv_general_dilated(
        x.astype(out_dtype), kernel.astype(out_dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y
