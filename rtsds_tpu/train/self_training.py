"""Self-training (pseudo-label) domain adaptation, fused with the
adversarial step.

Beyond-reference capability: the standard second-generation DA recipe
(CBST, Zou et al. ECCV'18; BDL, Li et al. CVPR'19; mean-teacher variants
such as DACS) layered onto the reference's adversarial loop
(``/root/reference/train.py:130-319``).  An EMA mean-teacher — the same
``ema`` item the DA loop already maintains, validates on and checkpoints
— predicts the unlabeled TARGET batch; pixels whose softmax confidence
clears ``threshold`` become pseudo-labels, the rest are mapped to
``ignore_index`` so the existing masked CE skips them; the generator
takes an extra ``lambda_pl``-weighted CE step on them alongside its v1
adversarial losses.

TPU-first shape: the teacher forward, thresholding, both G/D updates AND
the mean-teacher EMA update are ONE jit program — no extra dispatches,
no host round-trips, and the teacher's logits fuse with the student's
target forward (same resolution, same conv shapes, so XLA shares
layouts).  With ``threshold > 1`` no pixel ever passes and the step is
exactly the v1 adversarial step (verified bit-for-bit in
``tests/test_self_training.py``): the feature composes, never perturbs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.ops.losses import bce_with_logits, segmentation_loss
from rtsds_tpu.train.adversarial import _apply_gen
from rtsds_tpu.train.ema import ema_update
from rtsds_tpu.utils.dtypes import at_least_f32


def pseudo_labels(logits, threshold, ignore_index: int = 19):
    """Confidence-thresholded argmax labels from teacher logits.

    ``threshold`` is a scalar, or a (num_classes,) vector of PER-CLASS
    confidence thresholds (CBST-style class balancing, Zou et al.
    ECCV'18: rare classes get lower bars so the pseudo-label set is not
    dominated by easy classes) — each pixel is gated by the threshold of
    its argmax class.

    Returns ``(labels, coverage)``: ``labels`` is (N, H, W) int32 with
    sub-threshold pixels mapped to ``ignore_index``; ``coverage`` is the
    fraction of pixels kept, a float32 scalar in [0, 1].
    """
    probs = jax.nn.softmax(at_least_f32(logits), axis=-1)
    conf = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    thr = jnp.asarray(threshold, conf.dtype)
    if thr.ndim == 1:
        # one-hot dot instead of a gather: the argmax class's threshold,
        # dense and fusion-friendly (same trick as the one-hot CE)
        classes = jnp.arange(probs.shape[-1], dtype=jnp.int32)
        thr = jnp.sum(jnp.where(labels[..., None] == classes, thr, 0.0),
                      axis=-1)
    keep = conf >= thr
    labels = jnp.where(keep, labels, jnp.asarray(ignore_index, jnp.int32))
    return labels, jnp.mean(keep.astype(jnp.float32))


def calibrate_class_thresholds(apply_fn, variables, batches,
                               num_classes: int, portion: float = 0.5,
                               bins: int = 512,
                               max_threshold: float = 0.999):
    """CBST threshold calibration (Zou et al. ECCV'18 §2.2): per class,
    the confidence bar that keeps the top ``portion`` fraction of the
    pixels the teacher assigns to that class — rare classes get lower
    bars, so the pseudo-label set is not dominated by easy classes.

    Per-class confidence histograms accumulate ON DEVICE (one jit
    program per batch: teacher forward, argmax, joint class×bin
    bincount); only the final (num_classes, bins) table crosses to the
    host, where the per-class quantile becomes a threshold.

    Args:
      apply_fn / variables: the teacher (e.g. ``{"params": ema_params,
        "batch_stats": ...}``).
      batches: iterable of target image batches (or (images, ...) tuples).
      portion: fraction of each class's pixels to keep (0, 1].
      bins: histogram resolution.
      max_threshold: cap (never demand more confidence than this).

    Returns a (num_classes,) float32 numpy vector for
    :func:`make_self_training_step`'s ``threshold``; classes the teacher
    never predicts get ``max_threshold`` (their bar is never consulted).
    """
    import numpy as np

    @jax.jit
    def accumulate(variables, images, hist):
        out = apply_fn(variables, images, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        probs = jax.nn.softmax(at_least_f32(out), axis=-1)
        conf = jnp.max(probs, axis=-1)
        cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        b = jnp.clip((conf * bins).astype(jnp.int32), 0, bins - 1)
        joint = cls.reshape(-1) * bins + b.reshape(-1)
        return hist + jnp.bincount(
            joint, length=num_classes * bins).reshape(num_classes, bins)

    hist = jnp.zeros((num_classes, bins), jnp.int32)
    for batch in batches:
        images = batch[0] if isinstance(batch, (tuple, list)) else batch
        hist = accumulate(variables, images, hist)

    h = np.asarray(hist)
    thr = np.full((num_classes,), max_threshold, np.float32)
    for c in range(num_classes):
        total = int(h[c].sum())
        if total == 0:
            continue
        # walk down from the most-confident bin until `portion` is kept
        cum = np.cumsum(h[c][::-1])
        k = int(np.searchsorted(cum, portion * total))
        thr[c] = min((bins - 1 - k) / bins, max_threshold)
    return thr


def make_self_training_step(lambda_: float, iterations: int,
                            ignore_index: int = 19, *,
                            threshold=0.9, lambda_pl: float = 1.0,
                            ema_decay: float = 0.999, donate: bool = True):
    """Build the fused v1-adversarial + pseudo-label + mean-teacher step.

    Signature: ``step(gen_state, dis_state, ema_params, src_images,
    src_labels, tgt_images) -> (gen_state, dis_state, ema_params,
    metrics)``.  ``ema_params`` is the teacher tree (donated: the EMA
    update is elementwise so XLA reuses the buffer in place).

    v1 loss conventions are preserved (every loss scaled by
    ``1/iterations`` before the update, ``train.py:211,232``); the
    pseudo-label CE uses the same main+aux ``segmentation_loss`` as the
    source CE so aux heads learn from the teacher too.  ``threshold``
    may be a scalar or a per-class vector (see :func:`pseudo_labels`).
    """
    if ignore_index is None:
        raise ValueError("self-training needs an ignore_index to mask "
                         "sub-threshold pixels (the reference uses 19)")
    inv_iters = 1.0 / float(iterations)

    def step(gen_state, dis_state, ema_params, src_images, src_labels,
             tgt_images):
        # ---- teacher pseudo-labels (eval-mode forward, running BN stats;
        # argmax/threshold are non-differentiable and ema_params are not
        # differentiated, but stop_gradient documents the intent) --------
        variables = {"params": ema_params}
        if gen_state.batch_stats is not None:
            variables["batch_stats"] = gen_state.batch_stats
        t_out = gen_state.apply_fn(variables, tgt_images, train=False)
        if isinstance(t_out, (tuple, list)):
            t_out = t_out[0]
        pl, coverage = pseudo_labels(jax.lax.stop_gradient(t_out),
                                     threshold, ignore_index)

        # ---- generator update: v1 losses + pseudo-label CE ---------------
        def gen_loss_fn(gen_params):
            src_out, bs1 = _apply_gen(gen_state, gen_params,
                                      gen_state.batch_stats, src_images)
            seg_loss = segmentation_loss(src_out, src_labels,
                                         ignore_index) * inv_iters
            tgt_out, bs2 = _apply_gen(gen_state, gen_params, bs1, tgt_images)
            tgt_main = tgt_out[0]
            d_tgt = dis_state.apply_fn({"params": dis_state.params},
                                       jax.nn.softmax(tgt_main, axis=-1))
            adv_loss = lambda_ * bce_with_logits(d_tgt, 1.0) * inv_iters
            pl_loss = lambda_pl * segmentation_loss(
                tgt_out, pl, ignore_index) * inv_iters
            aux = (bs2, src_out[0], tgt_main, seg_loss, adv_loss, pl_loss)
            return seg_loss + adv_loss + pl_loss, aux

        grads_fn = jax.value_and_grad(gen_loss_fn, has_aux=True)
        (_, (new_bs, src_main, tgt_main, seg_loss, adv_loss, pl_loss)), \
            gen_grads = grads_fn(gen_state.params)
        gen_state = gen_state.apply_gradients(grads=gen_grads,
                                              batch_stats=new_bs)

        # ---- discriminator update (identical to v1) ----------------------
        src_feat = jax.nn.softmax(jax.lax.stop_gradient(src_main), axis=-1)
        tgt_feat = jax.nn.softmax(jax.lax.stop_gradient(tgt_main), axis=-1)

        def dis_loss_fn(dis_params):
            d_src = dis_state.apply_fn({"params": dis_params}, src_feat)
            d_tgt = dis_state.apply_fn({"params": dis_params}, tgt_feat)
            loss_src = bce_with_logits(d_src, 1.0) * inv_iters
            loss_tgt = bce_with_logits(d_tgt, 0.0) * inv_iters
            return loss_src + loss_tgt, (loss_src, loss_tgt)

        (_, (loss_dis_src, loss_dis_tgt)), dis_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True)(dis_state.params)
        dis_state = dis_state.apply_gradients(grads=dis_grads)

        # ---- mean-teacher update on the UPDATED student ------------------
        ema_params_new = ema_update(ema_params, gen_state.params,
                                    decay=ema_decay, step=gen_state.step)

        preds = jnp.argmax(src_main, axis=-1)
        metrics = {
            "loss_gen_source": seg_loss,
            "loss_adversarial": adv_loss,
            "loss_pseudo": pl_loss,
            "pl_coverage": coverage,
            "loss_disc_source": loss_dis_src,
            "loss_disc_target": loss_dis_tgt,
            "correct": jnp.sum(preds == src_labels),
            "total": jnp.asarray(src_labels.size, jnp.int32),
        }
        return gen_state, dis_state, ema_params_new, metrics

    if donate:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    return jax.jit(step)
