"""Losses, matching the semantics of the torch criteria the reference uses
(``nn.CrossEntropyLoss(ignore_index=19)`` and ``nn.BCEWithLogitsLoss``,
``main.py:124-134``) but written channel-last for TPU.

Logits are NHWC (class axis last); labels are (N, H, W) int32.  The
reference's NCHW criterion calls are equivalent after transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.utils.dtypes import at_least_f32


def cross_entropy(logits, labels, ignore_index: int | None = None):
    """Mean cross entropy over non-ignored pixels.

    Matches torch ``CrossEntropyLoss(ignore_index=...)`` with the default
    'mean' reduction: the sum of per-pixel NLL divided by the count of
    non-ignored pixels.
    """
    logits = at_least_f32(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    # one-hot masked sum instead of take_along_axis: a gather's backward is
    # a scatter-add, which serializes on TPU; the comparison mask fuses into
    # the log_softmax backward as dense elementwise work
    classes = jnp.arange(logits.shape[-1], dtype=jnp.int32)
    onehot = (labels[..., None] == classes).astype(logp.dtype)
    ll = jnp.sum(logp * onehot, axis=-1)
    if ignore_index is None:
        return -jnp.mean(ll)
    mask = (labels != ignore_index).astype(logp.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return -(ll * mask).sum() / denom


def bce_with_logits(logits, targets):
    """Binary cross entropy with logits, mean reduction (torch
    ``BCEWithLogitsLoss``): ``max(x,0) - x*y + log(1+exp(-|x|))``."""
    x = at_least_f32(logits)
    y = jnp.broadcast_to(jnp.asarray(targets, x.dtype), x.shape)
    loss = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()


def entropy_loss(logits):
    """Mean normalized Shannon entropy of the per-pixel class
    distributions (MinEnt, Vu et al. "ADVENT" CVPR'19 eq. 2).

    Normalized by ``log(num_classes)`` so the value lives in [0, 1]
    regardless of the class count and the paper's lambda settings
    transfer.  Used as an unsupervised target-domain loss: minimizing it
    pushes predictions on unlabeled target images toward confident
    (low-entropy) decisions.
    """
    x = at_least_f32(logits)
    logp = jax.nn.log_softmax(x, axis=-1)
    # entropy via p*logp with p = exp(logp): one softmax-family kernel,
    # numerically safe at p -> 0 (p*logp -> 0)
    ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    return jnp.mean(ent) / jnp.log(x.shape[-1])


def segmentation_loss(outputs, labels, ignore_index: int | None = 19):
    """Main + auxiliary-head CE sum (``train.py:86-92``).

    ``outputs`` is either a single logits array or the training-mode
    3-tuple ``(main, aux1, aux2)`` (aux entries may be None, as DeepLabV2
    returns ``(x, None, None)``, ``deeplabv2.py:128-130``).
    """
    if not isinstance(outputs, (tuple, list)):
        outputs = (outputs,)
    loss = 0.0
    for out in outputs:
        if out is not None:
            loss = loss + cross_entropy(out, labels, ignore_index)
    return loss


def make_criterion(cfg):
    """Criterion factory from a config node (``main.py:124-134``)."""
    name = cfg["name"]
    if name == "CrossEntropy":
        ignore_index = cfg.get("ignore_index", None)
        return lambda logits, labels: cross_entropy(logits, labels, ignore_index)
    if name == "BCEWithLogits":
        return bce_with_logits
    raise ValueError("Invalid loss name. Please select CrossEntropy or BCEWithLogits")
