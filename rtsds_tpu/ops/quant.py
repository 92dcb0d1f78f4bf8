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


# ---------------------------------------------------------------------------
# Model-agnostic PTQ driver.  A model contributes (a) a fold function
# producing {conv_name: (kernel, bias)} and (b) a topology walk
# ``forward(op, x)`` where ``op(name, x, stride, padding, dilation)``
# performs one BN-folded conv.  Everything else -- calibration, policy
# application, the quantized/bf16 op dispatchers -- lives here once
# (used by ``models/deeplab_int8.py`` and ``models/bisenet_int8.py``).
# ---------------------------------------------------------------------------


def calibrate_net(forward, folded, batches, stat: str = "max",
                  percentile: float = 99.9,
                  _hist_chunk: int = 1 << 22) -> dict:
    """Static per-conv-input activation scales from calibration batches.

    ``forward(op, x)`` is the model's topology walk; ``batches`` an
    iterable of (N, H, W, C) arrays AFTER the production preprocess.
    Returns {conv_name: float scale} with ``scale = bound / 127`` where
    the per-batch bound is either the max-abs (``stat="max"``) or an
    approximate ``percentile`` of |x| (``stat="percentile"`` — the
    outlier-robust variant: one hot pixel cannot collapse the whole
    tensor's resolution; values above the bound saturate at +-127).
    Bounds aggregate across batches by max.  One jitted bf16 forward per
    batch shape; convs sharing an input naturally record identical
    bounds.

    The percentile is histogram-approximated (4096 uniform bins over
    [0, max|x|], upper-edge rounding — conservative), NOT a sort:
    calibration tensors at serving resolution reach 10^8-10^9 elements,
    where ``jnp.quantile``'s sort is memory- and time-prohibitive while
    a bincount scatter-add is one streaming pass.  Bin granularity is
    max/4096 ~ 0.025% of range, far below any mIoU-visible effect.
    The histogram streams in bounded chunks: materializing a full-size
    f32 |x| plus an int32 bin-index tensor costs 8 bytes/element of
    extra peak memory, which would OOM percentile calibration at
    serving shapes where both ``stat="max"`` calibration and bf16
    serving fit.
    """
    if stat not in ("max", "percentile"):
        raise ValueError(f"calibration stat {stat!r} is not supported "
                         "('max' or 'percentile')")
    if stat == "percentile" and not 0.0 < percentile <= 100.0:
        raise ValueError(f"calibration percentile must be in (0, 100], "
                         f"got {percentile}")
    nbins = 4096
    # 4M elements by default: ~32 MB of f32+int32 scratch per scan step
    chunk = _hist_chunk

    def bound(x):
        amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        if stat == "max":
            return amax
        amax = jnp.maximum(amax, 1e-12)
        flat = x.reshape(-1)
        # target counts only REAL elements; the pad (+inf) lands in the
        # LAST bin, so every cumsum value below it — and therefore the
        # selected bin — is unchanged (target <= flat.size <= the cumsum
        # over real elements at the last bin).
        # uint32 counts: tensors past 2^31 elements no longer OOM first
        # (the chunked pass is what made them fit), so int32 cumsum
        # headroom would be the next thing to overflow
        target = jnp.ceil(percentile / 100.0 * flat.size) \
            .astype(jnp.uint32)
        pad = (-flat.size) % chunk
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.full((pad,), jnp.inf, flat.dtype)])

        def step(hist, xs):
            absx = jnp.abs(xs).astype(jnp.float32)
            idx = jnp.minimum(absx * (nbins / amax),
                              nbins - 1).astype(jnp.int32)
            return hist.at[idx].add(jnp.uint32(1)), None

        hist, _ = jax.lax.scan(step, jnp.zeros((nbins,), jnp.uint32),
                               flat.reshape(-1, chunk))
        k = jnp.argmax(jnp.cumsum(hist) >= target)
        return (k + 1).astype(jnp.float32) * (amax / nbins)

    @jax.jit
    def observe(folded, x):
        bounds = {}

        def op(name, x, stride, padding, dilation):
            kernel, bias = folded[name]
            bounds[name] = bound(x)
            return conv_bf16(x, kernel, bias, stride, padding, dilation)

        forward(op, x.astype(jnp.bfloat16))
        return bounds

    totals: dict = {}
    n = 0
    for batch in batches:
        bounds = jax.device_get(observe(folded, jnp.asarray(batch)))
        for k, v in bounds.items():
            totals[k] = max(totals.get(k, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {k: max(v, 1e-12) / 127.0 for k, v in totals.items()}


def build_quantized_net(folded, act_scales: dict, policy):
    """Quantized param tree: {'q8': {name: (w_q, w_scale, x_scale, bias)},
    'bf16': {name: (kernel bf16, bias f32)}}.  ``policy(name,
    kernel_shape) -> bool`` selects the convs worth quantizing."""
    q8, bf = {}, {}
    for name, (kernel, bias) in folded.items():
        if policy(name, kernel.shape) and name in act_scales:
            w_q, w_scale = quantize_kernel(kernel)
            q8[name] = (w_q, w_scale,
                        jnp.float32(act_scales[name]),
                        None if bias is None
                        else bias.astype(jnp.float32))
        else:
            bf[name] = (kernel.astype(jnp.bfloat16),
                        None if bias is None
                        else bias.astype(jnp.float32))
    return {"q8": q8, "bf16": bf}


def make_quant_op(qtree):
    """The serving-time conv dispatcher over a :func:`build_quantized_net`
    tree (jittable; dict keys are static)."""
    q8, bf = qtree["q8"], qtree["bf16"]

    def op(name, x, stride, padding, dilation):
        if name in q8:
            w_q, w_scale, x_scale, bias = q8[name]
            x_q = quantize_act(x, x_scale)
            return conv_w8a8(x_q, w_q, x_scale, w_scale, bias,
                             stride, padding, dilation)
        kernel, bias = bf[name]
        return conv_bf16(x, kernel, bias, stride, padding, dilation)

    return op


def quantize_model(model_name: str, variables, calib_batches, policy=None,
                   calib_stat: str = "max", calib_percentile: float = 99.9):
    """One-call W8A8 PTQ over a whole model: dispatch to the per-model
    fold/calibrate/build pipeline and wrap the quantized walk in an
    eval-mode apply.

    ``calib_batches``: iterable of image batches AFTER the production
    preprocess.  ``calib_stat``/``calib_percentile`` select the
    activation-scale statistic (see :func:`calibrate_net`).  Returns
    ``(apply_fn, qtree)`` where ``apply_fn(qtree, images, train=False)``
    is signature-compatible with a flax ``model.apply`` in eval mode — a
    drop-in for any pure inference consumer (the KD teacher, the
    pseudo-label sweep, the Predictor builds its own for
    serving-specific policy plumbing).
    """
    if model_name == "deeplab":
        from rtsds_tpu.models import deeplab_int8 as q

        folded = q.fold_deeplab(variables)
        int8_apply = q.deeplab_int8_apply
    elif model_name == "bisenet":
        from rtsds_tpu.models import bisenet_int8 as q

        folded = q.fold_bisenet(variables)
        int8_apply = q.bisenet_int8_apply
    else:
        raise ValueError(f"no int8 path for model {model_name!r} "
                         "(expected 'bisenet' or 'deeplab')")
    scales = q.calibrate(variables, calib_batches, folded=folded,
                         stat=calib_stat, percentile=calib_percentile)
    qtree = q.build_quantized(variables, scales,
                              *(() if policy is None else (policy,)),
                              folded=folded)

    def apply_fn(variables, images, train=False):
        del train  # the quantized walk is eval-mode by construction
        return int8_apply(variables, images)

    return apply_fn, qtree


# ---------------------------------------------------------------------------
# QAT (quantization-aware fine-tuning) primitives: the same W8A8 grid as
# the serving path, made differentiable with straight-through estimators.
# ``train/qat.py`` drives these over the int8 modules' topology walks; the
# fine-tuned folded weights re-export onto the REAL int8 serving path with
# the identical quantization (``quantize_kernel`` recomputes the same
# per-channel max scales the fake-quant forward used).
# ---------------------------------------------------------------------------


def fake_quant_kernel(kernel):
    """Differentiable W8 view of a conv kernel.

    Values equal ``dequantize(quantize_kernel(kernel))`` exactly (same
    per-output-channel max-abs grid -- nothing saturates, so no clip);
    gradients pass straight through (STE), which is exact here because
    the scale tracks the live per-channel max."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    dq = jnp.round(kernel / scale) * scale
    return kernel + jax.lax.stop_gradient(dq - kernel)


def fake_quant_act(x, scale):
    """Differentiable A8 view of an activation with a STATIC scale.

    Values equal the serving path's ``quantize_act`` grid (round +
    saturate at +-127) dequantized; gradients are the clipped STE --
    identity inside the representable range, zero where the value
    saturates (the standard QAT estimator: saturated pixels cannot be
    fixed by nudging, only by the weights upstream shrinking them)."""
    xf = x.astype(jnp.float32)
    bound = scale * 127.0
    dq = jnp.clip(jnp.round(xf / scale), -127, 127) * scale
    ste = xf + jax.lax.stop_gradient(dq - xf)
    return jnp.where(jnp.abs(xf) <= bound, ste, jax.lax.stop_gradient(dq))


def make_fake_quant_op(folded, act_scales: dict, quant_names):
    """The QAT conv dispatcher: same signature as :func:`make_quant_op`'s
    op, but differentiable w.r.t. the ``folded`` tree -- quantized convs
    see the W8A8 grid through STEs, bf16-policy convs run straight
    through.  Compute dtype is f32 (training fidelity; QAT runs at
    fine-tune scale where speed is not the claim)."""

    def op(name, x, stride, padding, dilation):
        kernel, bias = folded[name]
        kernel = kernel.astype(jnp.float32)
        if name in quant_names:
            x = fake_quant_act(x, act_scales[name])
            kernel = fake_quant_kernel(kernel)
        return conv_bf16(x, kernel, bias, stride, padding, dilation,
                         out_dtype=jnp.float32)

    return op


def make_bf16_op(folded, out_dtype=jnp.bfloat16):
    """BN-folded unquantized dispatcher -- the apples-to-apples baseline
    (and, at ``out_dtype=float32``, the fold-exactness test surface)."""

    def op(name, x, stride, padding, dilation):
        kernel, bias = folded[name]
        return conv_bf16(x, kernel, bias, stride, padding, dilation,
                         out_dtype=out_dtype)

    return op
