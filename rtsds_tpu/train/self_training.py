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

from rtsds_tpu.ops.fda import fda_source_to_target
from rtsds_tpu.ops.losses import bce_with_logits, entropy_loss, \
    segmentation_loss
from rtsds_tpu.ops.resize import resize_bilinear, resize_labels_nearest
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


def classmix_masks(labels, key, num_classes: int):
    """Per-sample binary masks selecting the pixels of a random HALF of
    the classes present in each label map (ClassMix, Olsson et al.
    WACV'21 §3.1 — the mixing rule DACS builds on).

    Exactly ``ceil(present / 2)`` classes are chosen per sample, uniformly
    among the classes that actually appear (ignore/void labels are >=
    ``num_classes`` and never selectable).  Dense one-hot formulation: no
    gathers, everything fuses on the VPU.

    Returns a (N, H, W) bool mask: True = pixel belongs to a selected
    class (comes from THIS image in the mix).
    """
    labels = labels.astype(jnp.int32)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    onehot = labels[..., None] == classes               # (N, H, W, C)
    present = jnp.any(onehot, axis=(1, 2))              # (N, C)
    scores = jax.random.uniform(key, present.shape)
    scores = jnp.where(present, scores, jnp.inf)
    n_present = jnp.sum(present, axis=-1)               # (N,)
    k = (n_present + 1) // 2                            # ceil(half)
    kth = jnp.take_along_axis(
        jnp.sort(scores, axis=-1),
        jnp.clip(k - 1, 0, num_classes - 1)[:, None], axis=-1)
    selected = (scores <= kth) & present                # the k smallest
    return jnp.any(onehot & selected[:, None, None, :], axis=-1)


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
                            ema_decay: float = 0.999, donate: bool = True,
                            lambda_ent: float = 0.0, fda_beta: float = 0.0,
                            classmix: bool = False, classmix_seed: int = 42):
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

    ``lambda_ent``/``fda_beta`` add the same fused MinEnt / FDA options
    as :func:`rtsds_tpu.train.adversarial.make_adversarial_step` — all
    four DA techniques (adversarial, pseudo-label, entropy, Fourier
    restyling) compose in one compiled program.

    ``classmix=True`` upgrades the pseudo-label CE to DACS (Tranheden et
    al. WACV'21): a random half of each source image's classes is pasted
    onto the target image (source resized to target resolution on
    device), the labels mixed from real source labels and the teacher's
    thresholded pseudo-labels, and the student takes the ``lambda_pl``
    CE on the MIXED batch instead of the raw target — one extra
    generator forward/backward at target resolution, still a single jit
    program.  The mix RNG folds ``classmix_seed`` with the step counter,
    so resume replays identical mixes (deterministic-resume contract).
    """
    if ignore_index is None:
        raise ValueError("self-training needs an ignore_index to mask "
                         "sub-threshold pixels (the reference uses 19)")
    inv_iters = 1.0 / float(iterations)

    def step(gen_state, dis_state, ema_params, src_images, src_labels,
             tgt_images):
        # optional FDA restyling of the source batch (ops/fda.py); the
        # teacher and discriminator consume the target batch unchanged
        src_images = fda_source_to_target(src_images, tgt_images, fda_beta)
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

        # ---- optional DACS ClassMix batch (built from non-differentiated
        # inputs, outside the grad closure) --------------------------------
        mix_images = mix_labels = mix_coverage = None
        if classmix:
            num_classes = t_out.shape[-1]
            tgt_hw = tgt_images.shape[1:3]
            src_small = src_images
            if src_small.shape[1:3] != tgt_hw:
                src_small = resize_bilinear(src_small, tgt_hw)
            src_lbl_small = src_labels
            if src_lbl_small.shape[1:3] != tgt_hw:
                src_lbl_small = resize_labels_nearest(src_lbl_small, tgt_hw)
            nt = tgt_images.shape[0]
            if src_small.shape[0] != nt:
                idx = jnp.arange(nt) % src_small.shape[0]
                src_small = src_small[idx]
                src_lbl_small = src_lbl_small[idx]
            # fold the step counter in: deterministic across resume,
            # different every iteration
            mix_key = jax.random.fold_in(jax.random.key(classmix_seed),
                                         gen_state.step)
            mask = classmix_masks(src_lbl_small, mix_key, num_classes)
            mix_images = jnp.where(mask[..., None],
                                   src_small.astype(tgt_images.dtype),
                                   tgt_images)
            mix_labels = jnp.where(mask,
                                   src_lbl_small.astype(jnp.int32),
                                   pl)
            mix_coverage = jnp.mean(mask.astype(jnp.float32))

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
            if classmix:
                # DACS: the lambda_pl CE moves to the mixed batch (one
                # extra forward at target resolution)
                mix_out, bs_last = _apply_gen(gen_state, gen_params, bs2,
                                              mix_images)
                pl_loss = lambda_pl * segmentation_loss(
                    mix_out, mix_labels, ignore_index) * inv_iters
            else:
                bs_last = bs2
                pl_loss = lambda_pl * segmentation_loss(
                    tgt_out, pl, ignore_index) * inv_iters
            total = seg_loss + adv_loss + pl_loss
            ent_loss = None
            if lambda_ent:
                # MinEnt on target predictions, v1-normalized
                ent_loss = lambda_ent * entropy_loss(tgt_main) * inv_iters
                total = total + ent_loss
            aux = (bs_last, src_out[0], tgt_main, seg_loss, adv_loss,
                   pl_loss, ent_loss)
            return total, aux

        grads_fn = jax.value_and_grad(gen_loss_fn, has_aux=True)
        (_, (new_bs, src_main, tgt_main, seg_loss, adv_loss, pl_loss,
             ent_loss)), gen_grads = grads_fn(gen_state.params)
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
        if ent_loss is not None:
            metrics["loss_entropy"] = ent_loss
        if mix_coverage is not None:
            metrics["mix_coverage"] = mix_coverage
        return gen_state, dis_state, ema_params_new, metrics

    if donate:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    return jax.jit(step)
