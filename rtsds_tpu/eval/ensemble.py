"""Multi-scale + flip ensemble inference: the standard segmentation
evaluation protocol (average class probabilities over resized and
horizontally-flipped copies of each image) the reference never ships --
typically worth ~1 mIoU point on Cityscapes-style benchmarks.

TPU-first: every scale is a STATIC shape, so the whole ensemble -- S
resizes, S (x2 with flip) forwards, probability averaging, argmax --
compiles to ONE XLA program with no host round-trips.  Scaled sizes are
snapped to multiples of 32 (the models' total downsampling factor) to
keep every stage's shapes legal and MXU-tileable.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _snap(v: float, multiple: int = 32) -> int:
    return max(int(round(v / multiple)) * multiple, multiple)


def make_ensemble_predict(apply_fn: Callable, image_size: tuple[int, int],
                          scales: Sequence[float] = (0.75, 1.0, 1.25),
                          flip: bool = True,
                          return_probs: bool = False) -> Callable:
    """Build ``predict(variables, images) -> masks`` (or class
    probabilities when ``return_probs``).

    Args:
      apply_fn: ``apply_fn(variables, images, train=False) -> logits``
        (any fully-convolutional model; logits upsampled to input size,
        which both BiSeNet and DeepLabV2 guarantee).
      image_size: the base (H, W) the masks are produced at.
      scales: relative input scales; each snapped to a multiple of 32.
      flip: also average the horizontally-flipped prediction per scale.
    """
    h, w = image_size
    sizes = []
    for s in scales:
        size = (_snap(h * s), _snap(w * s))
        if size not in sizes:
            sizes.append(size)

    def predict(variables, images):
        n = images.shape[0]
        acc = None
        count = 0
        for sh, sw in sizes:
            if (sh, sw) == (h, w):
                x = images
            else:
                x = jax.image.resize(images, (n, sh, sw, images.shape[-1]),
                                     method="bilinear")
            if flip:
                # the flipped copy has the SAME shape: stack it into one
                # 2n-batch forward instead of two sequential n-batch
                # forwards (TPU conv throughput scales with batch)
                both = apply_fn(
                    variables,
                    jnp.concatenate([x, jnp.flip(x, axis=2)], axis=0),
                    train=False)
                logits_list = [both[:n], jnp.flip(both[n:], axis=2)]
            else:
                logits_list = [apply_fn(variables, x, train=False)]
            for logits in logits_list:
                if logits.shape[1:3] != (h, w):
                    logits = jax.image.resize(
                        logits.astype(jnp.float32),
                        (n, h, w, logits.shape[-1]), method="bilinear")
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                acc = p if acc is None else acc + p
                count += 1
        probs = acc / count
        if return_probs:
            return probs
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    return predict


def make_ensemble_eval_step(apply_fn: Callable, image_size: tuple[int, int],
                            num_classes: int,
                            scales: Sequence[float] = (0.75, 1.0, 1.25),
                            flip: bool = True,
                            use_pallas: bool | None = None,
                            return_preds: bool = False) -> Callable:
    """Ensemble analog of :func:`rtsds_tpu.eval.validate.make_eval_step`:
    ``eval_step(variables, images, labels, hist) -> hist`` (or
    ``(hist, preds)`` with ``return_preds``, for image-plot callbacks),
    jitted, with the confusion-matrix update fused into the same program
    (Pallas MXU histogram auto-selected on TPU, like the plain eval
    step)."""
    from rtsds_tpu.eval.validate import _pallas_hist_available
    from rtsds_tpu.utils.metrics import fast_hist

    if use_pallas is None:
        use_pallas = _pallas_hist_available()

    def hist_update(labels, preds):
        if use_pallas:
            from rtsds_tpu.ops.pallas.hist import fast_hist_pallas

            return fast_hist_pallas(labels, preds, num_classes)
        return fast_hist(labels, preds, num_classes)

    predict = make_ensemble_predict(apply_fn, image_size, scales, flip)

    @jax.jit
    def eval_step(variables, images, labels, hist):
        preds = predict(variables, images)
        new_hist = hist + hist_update(labels, preds)
        if return_preds:
            return new_hist, preds
        return new_hist

    return eval_step
