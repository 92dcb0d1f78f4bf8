"""Augmentation pipeline: jittable, key-driven, batched.

Capability parity with the reference's augmentation factory
(``_augmentator_`` / ``augmentation_loader``, ``main.py:25-57``):
GaussianBlur with sigma sampled from a range, RandomHorizontalFlip,
ColorJitter, all wrapped in a RandomApply gate with probability ``p``.

Design differences (TPU-first, and building to intent):
  * everything is a pure function of an explicit PRNG key, applied to the
    whole batch on device inside jit -- no per-sample host Python;
  * geometric transforms (horizontal flip) are applied to the *label*
    too.  The reference flips only the image tensor (``main.py:86-88``),
    silently breaking pixel correspondence -- a catalogued bug
    (SURVEY.md §7); ``flip_labels=False`` restores reference behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from rtsds_tpu.config import parse_float_list, parse_int_list
from rtsds_tpu.ops.blur import gaussian_blur


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    apply_p: float = 0.5                      # RandomApply gate (main.py:57)
    blur_kernel: tuple[int, int] | None = (5, 9)
    blur_sigma: tuple[float, float] = (0.1, 5.0)
    flip_p: float | None = 0.5
    color_jitter: tuple[float, float, float, float] | None = None  # b, c, s, h
    flip_labels: bool = True
    # (ours) random zoom-in: crop a 1/s window at a random position and
    # resample to full size (RandomResizedCrop with the aspect fixed) --
    # shape-static via jax.image.scale_and_translate, s in [1, zoom_max];
    # per-sample geometry + fire coin (vmapped)
    zoom_max: float | None = None
    zoom_p: float = 0.5

    @classmethod
    def from_config(cls, config) -> "AugmentConfig":
        aug = config.augmentation
        blur_kernel = blur_sigma = None
        if "GaussianBlur" in aug:
            gb = aug["GaussianBlur"]
            ks = parse_int_list(gb["kernel_size"])
            blur_kernel = (ks[0], ks[1] if len(ks) > 1 else ks[0])
            sg = parse_float_list(gb["sigma"])
            blur_sigma = (sg[0], sg[-1])
        flip_p = None
        if "RandomHorizontalFlip" in aug:
            flip_p = float(aug["RandomHorizontalFlip"]["p"])
        cj = None
        if "ColorJitter" in aug:
            c = aug["ColorJitter"]
            cj = (float(c.get("brightness", 0)), float(c.get("contrast", 0)),
                  float(c.get("saturation", 0)), float(c.get("hue", 0)))
        zoom_max, zoom_p = None, 0.5
        if "RandomZoom" in aug:
            z = aug["RandomZoom"]
            zoom_max = float(z.get("max", 1.5))
            zoom_p = float(z.get("p", 0.5))
        return cls(apply_p=float(aug.get("p", 0.5)), blur_kernel=blur_kernel,
                   blur_sigma=blur_sigma or (0.1, 5.0), flip_p=flip_p,
                   color_jitter=cj, zoom_max=zoom_max, zoom_p=zoom_p)


def _color_jitter(key, img, strength):
    """Brightness/contrast/saturation/hue jitter on 0..255-range RGB floats.

    Factors are sampled as torchvision does: uniform in
    [max(0, 1-s), 1+s] for brightness/contrast/saturation and [-h, h] for
    hue (applied in fixed order brightness->contrast->saturation->hue).
    """
    b, c, s, h = strength
    kb, kc, ks, kh = jax.random.split(key, 4)
    if b > 0:
        f = jax.random.uniform(kb, (), minval=max(0.0, 1 - b), maxval=1 + b)
        img = img * f
    if c > 0:
        f = jax.random.uniform(kc, (), minval=max(0.0, 1 - c), maxval=1 + c)
        mean = jnp.mean(img * jnp.asarray([0.299, 0.587, 0.114]), axis=(-3, -2, -1),
                        keepdims=True) * 3.0
        img = (img - mean) * f + mean
    if s > 0:
        f = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
        gray = jnp.sum(img * jnp.asarray([0.299, 0.587, 0.114]), axis=-1,
                       keepdims=True)
        img = (img - gray) * f + gray
    if h > 0:
        shift = jax.random.uniform(kh, (), minval=-h, maxval=h)
        img = _hue_shift(img, shift)
    return jnp.clip(img, 0.0, 255.0)


def _hue_shift(img, shift):
    """Approximate hue rotation via YIQ rotation (cheap, fused by XLA)."""
    angle = shift * 2.0 * jnp.pi
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    i = 0.596 * r - 0.274 * g - 0.322 * b
    q = 0.211 * r - 0.523 * g + 0.312 * b
    i, q = i * cos - q * sin, i * sin + q * cos
    return jnp.stack([
        y + 0.956 * i + 0.621 * q,
        y - 0.272 * i - 0.647 * q,
        y - 1.106 * i + 1.703 * q,
    ], axis=-1)


def _random_zoom(key, image, label, gate, zoom_max: float, zoom_p: float):
    """Zoom into a random 1/s-sized window (s ~ U[1, zoom_max]) of each
    sample and resample back to full resolution — image bilinear, label
    nearest, SAME geometry for both so pixel correspondence holds.

    Per-sample draws (RandomResizedCrop semantics): every image in the
    batch gets its own (s, ty, tx) window and its own fire/skip coin,
    vmapped so the program stays one static jit graph.

    Shape-static: ``jax.image.scale_and_translate`` maps output coords x
    to input coords ``(x - t) / s``; with s >= 1 and
    ``t in [-(s-1)*dim, 0]`` every sample stays in-bounds (no padding,
    so no fill-value semantics for labels).
    """
    ks, kp, ky, kx = jax.random.split(key, 4)
    n = image.shape[0]
    s = jax.random.uniform(ks, (n,), minval=1.0, maxval=float(zoom_max))
    do = (jax.random.uniform(kp, (n,)) < zoom_p) & gate
    h, w = image.shape[-3], image.shape[-2]
    ty = -jax.random.uniform(ky, (n,)) * (s - 1.0) * h
    tx = -jax.random.uniform(kx, (n,)) * (s - 1.0) * w
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def zoom_one(s, ty, tx, img, lbl):
        zoom_img = jax.image.scale_and_translate(
            img, img.shape, (0, 1), jnp.stack([s, s]), jnp.stack([ty, tx]),
            method="linear")
        # nearest label resampling with scale_and_translate's pixel-center
        # convention (out center x+0.5 samples input coord (x+0.5-t)/s);
        # scale_and_translate itself rejects method="nearest"
        src_y = jnp.clip(jnp.floor((ys + 0.5 - ty) / s), 0, h - 1)
        src_x = jnp.clip(jnp.floor((xs + 0.5 - tx) / s), 0, w - 1)
        zoom_lbl = lbl[src_y.astype(jnp.int32)[:, None],
                       src_x.astype(jnp.int32)[None, :]]
        return zoom_img, zoom_lbl

    zoom_img, zoom_lbl = jax.vmap(zoom_one)(s, ty, tx, image, label)
    return (jnp.where(do[:, None, None, None], zoom_img, image),
            jnp.where(do[:, None, None], zoom_lbl, label))


def make_augment_fn(cfg: AugmentConfig) -> Callable:
    """Build ``augment(key, image, label) -> (image, label)``.

    Images NHWC float (0..255 range pre-normalization), labels (N, H, W)
    int.  The RandomApply gate and per-transform draws use independent
    subkeys; all branches run under ``jnp.where`` so the program is a single
    static jit graph.
    """

    def augment(key, image, label):
        k_gate, k_blur, k_flip, k_cj, k_zoom = jax.random.split(key, 5)
        gate = jax.random.uniform(k_gate, ()) < cfg.apply_p

        img_aug = image
        lbl_aug = label
        if cfg.zoom_max is not None and cfg.zoom_max > 1.0:
            img_aug, lbl_aug = _random_zoom(
                k_zoom, img_aug, lbl_aug, gate, cfg.zoom_max, cfg.zoom_p)
        if cfg.blur_kernel is not None:
            lo, hi = cfg.blur_sigma
            sigma = jax.random.uniform(k_blur, (), minval=lo, maxval=hi)
            img_aug = gaussian_blur(img_aug, cfg.blur_kernel, sigma)
        if cfg.color_jitter is not None:
            img_aug = _color_jitter(k_cj, img_aug, cfg.color_jitter)
        if cfg.flip_p is not None:
            do_flip = jax.random.uniform(k_flip, ()) < cfg.flip_p
            flipped = jnp.flip(img_aug, axis=-2)  # width axis of NHWC
            img_aug = jnp.where(do_flip, flipped, img_aug)
            if cfg.flip_labels:
                lbl_flipped = jnp.flip(lbl_aug, axis=-1)  # width axis of NHW
                lbl_aug = jnp.where(do_flip & gate, lbl_flipped, lbl_aug)

        image = jnp.where(gate, img_aug, image)
        return image, lbl_aug

    return augment
