"""Segmentation metric math, computed on-device.

Capability parity with the reference's numpy helpers (``utils.py:52-63``):
``fast_hist`` builds an ``n x n`` confusion matrix from flattened
label/prediction pairs, masking labels outside ``[0, n)``;
``per_class_iou`` is ``diag / (row + col - diag + 1e-5)``.

TPU-first differences: everything is ``jnp`` and jit-friendly, so the
confusion matrix accumulates **on device** inside the jitted eval step
(the reference round-trips every batch through ``.cpu().numpy()``,
``validation.py:54,120-124``).  The update is a single fixed-length
``bincount`` (an XLA scatter-add); a Pallas kernel variant lives in
``rtsds_tpu/ops/pallas/hist.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fast_hist(labels, preds, num_classes: int):
    """Confusion matrix of shape (num_classes, num_classes).

    ``hist[i, j]`` counts pixels with true class ``i`` predicted as ``j``.
    Pixels whose label is outside ``[0, num_classes)`` (e.g. the void /
    ignore class) are dropped, matching ``utils.py:52-58``.

    Works under jit: invalid pixels are routed to an overflow bin that is
    sliced away, keeping shapes static.
    """
    labels = jnp.asarray(labels).reshape(-1).astype(jnp.int32)
    preds = jnp.asarray(preds).reshape(-1).astype(jnp.int32)
    valid = (labels >= 0) & (labels < num_classes)
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


# Alias with the on-device semantics spelled out.
confusion_matrix = fast_hist


def per_class_iou(hist):
    """Per-class IoU from a confusion matrix (``utils.py:61-63``)."""
    hist = jnp.asarray(hist, dtype=jnp.float64 if hist.dtype == np.float64 else jnp.float32)
    diag = jnp.diagonal(hist)
    denom = hist.sum(axis=1) + hist.sum(axis=0) - diag + 1e-5
    return diag / denom


def mean_iou(hist):
    """nanmean of per-class IoU (``validation.py:69-71``).

    With the reference's +1e-5 epsilon the IoU of an absent class is 0.0,
    not NaN, so nanmean == mean there; we keep nanmean for faithfulness.
    """
    ious = per_class_iou(hist)
    return jnp.nanmean(ious)


def pixel_accuracy(hist):
    """Overall pixel accuracy = trace / total (``validation.py:57-62``)."""
    total = hist.sum()
    return jnp.where(total > 0, jnp.trace(hist) / total, 0.0)
