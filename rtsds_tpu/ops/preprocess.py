"""Fused per-batch preprocessing transforms (the torchvision pipelines of
``main.py:60-108``, rebuilt as single jittable device functions).

Pipelines replicated:
  * Cityscapes input: Resize(H, W, antialias=True) + Normalize(ImageNet)
    (``main.py:69-72``)
  * Cityscapes label: Resize + clamp to [0, num_classes] (``main.py:74-77``)
  * GTA5 input: [optional augmentation] + Resize (no antialias) + Normalize
    (``main.py:81-90``)
  * GTA5 label: Resize (``main.py:93-95``)

Preprocessing quirk, reproduced deliberately: the reference normalizes with
ImageNet mean/std on 0-255-range floats without dividing by 255
(``main.py:71`` applied to ``read_image().float()``, ``cityscapes.py:62``).
``correct_preprocessing=True`` switches to standard /255-first behavior.
Labels are resized nearest (the reference uses bilinear -- a catalogued
bug, SURVEY.md §7).

Ordering note: the reference blurs GTA5 images at native resolution before
the resize (``main.py:88``); our host loader resizes during decode, so
augmentation effectively runs post-resize (blur kernel/sigma operate at
720x1280 instead of ~1052x1914).  Equivalent regularization, documented as
a deliberate deviation.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from rtsds_tpu.ops.augment import AugmentConfig, make_augment_fn
from rtsds_tpu.ops.resize import clamp_labels, resize_bilinear, resize_labels_nearest

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(image, correct_preprocessing: bool = False):
    """ImageNet normalization on NHWC float images."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    image = image.astype(jnp.float32)
    if correct_preprocessing:
        image = image / 255.0
    return (image - mean) / std


def make_transform(image_size: tuple[int, int], num_classes: int = 19,
                   antialias: bool = True,
                   augment_cfg: AugmentConfig | None = None,
                   correct_preprocessing: bool = False) -> Callable:
    """Build ``transform(image, label, key=None) -> (image, label)``.

    Input: uint8/float NHWC image in 0..255, int label (N, H, W).
    Output: normalized float32 NHWC at ``image_size``, clamped int32 labels.
    The whole chain is jittable and fuses into a handful of XLA kernels.
    """
    augment = make_augment_fn(augment_cfg) if augment_cfg is not None else None

    def transform(image, label, key=None):
        image = jnp.asarray(image, dtype=jnp.float32)
        label = jnp.asarray(label)
        if augment is not None:
            if key is None:
                raise ValueError("augmentation requires a PRNG key")
            image, label = augment(key, image, label)
        image = resize_bilinear(image, image_size, antialias=antialias)
        image = normalize(image, correct_preprocessing)
        label = resize_labels_nearest(label, image_size)
        label = clamp_labels(label, 0, num_classes)
        return image, label

    return transform
