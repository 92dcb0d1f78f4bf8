"""Resize ops for images and label maps (NHWC), jit-friendly.

The reference resizes through torchvision (``transforms.Resize`` with
antialias for Cityscapes inputs, ``main.py:69-77``) and upsamples logits
with ``F.interpolate(mode='bilinear', align_corners=False)``
(``build_bisenet.py:151-166``, ``deeplabv2.py:126``).

``jax.image.resize(method='bilinear')`` uses half-pixel sample positions --
the same convention as ``align_corners=False`` -- and applies a triangle
antialias filter when downscaling iff ``antialias=True``, mirroring the
torchvision flag.  Labels are resized with nearest (the reference passes
them through a bilinear Resize, a catalogued bug -- SURVEY.md §7; we build
to intent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, size: tuple[int, int], antialias: bool = False):
    """Bilinear resize of NHWC (or HWC) arrays to spatial ``size`` (H, W)."""
    if x.ndim == 3:
        shape = (*size, x.shape[-1])
    elif x.ndim == 4:
        shape = (x.shape[0], *size, x.shape[-1])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    return jax.image.resize(x, shape, method="bilinear", antialias=antialias)


def upsample_bilinear(x, scale: int):
    """Integer-factor bilinear upsample (torch ``interpolate(scale_factor=k)``)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (h * scale, w * scale), antialias=False)


def resize_labels_nearest(labels, size: tuple[int, int]):
    """Nearest-neighbor resize for integer label maps.

    Accepts (H, W), (N, H, W) or (N, H, W, 1); preserves rank and dtype.
    Uses torch/torchvision's nearest convention (floor of scaled index).
    """
    labels = jnp.asarray(labels)
    squeeze_channel = False
    squeeze_batch = False
    if labels.ndim == 2:
        labels = labels[None, ..., None]
        squeeze_batch = squeeze_channel = True
    elif labels.ndim == 3:
        labels = labels[..., None]
        squeeze_channel = True
    n, h, w, c = labels.shape
    out_h, out_w = size
    # floor(out_idx * in/out): torch 'nearest' semantics
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    out = labels[:, rows][:, :, cols]
    if squeeze_channel:
        out = out[..., 0]
    if squeeze_batch:
        out = out[0]
    return out


def clamp_labels(labels, min_val: int = 0, max_val: int = 19):
    """The reference's ``IntRangeTransformer`` (``utils.py:67-75``): clamp
    label values into [min_val, max_val] and cast to int32 (void 255 -> 19,
    which CE then ignores via ignore_index=19)."""
    return jnp.clip(jnp.asarray(labels), min_val, max_val).astype(jnp.int32)
