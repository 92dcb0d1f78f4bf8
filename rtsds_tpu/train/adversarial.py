"""Adversarial domain-adaptation step: generator + discriminator updates
fused into ONE jit program.

Reference semantics (Tsai et al. CVPR'18 single-level adversarial DA,
``train.py:130-319``): per iteration, the generator takes a segmentation CE
step on source (GTA5) plus a lambda-weighted BCE adversarial step pushing
D(softmax(G(target))) toward the *source* label; the discriminator then
trains on both (detached) softmax maps with source=1 / target=0.  The
freeze/unfreeze + detach dance (``train.py:192-193,238-243``) becomes
``jax.grad`` w.r.t. each network's own params plus ``stop_gradient`` on the
features fed to D -- structurally leak-free (verified by unit test).

Both loops' loss scalings are preserved: v1 divides every loss by
``iterations`` before backward (``train.py:211,232,250,261``); v2 uses
unnormalized losses with the lambda schedule
``max(lambda, 10*lambda - 0.001*epoch)`` (``train.py:416``).

v2 differences implemented faithfully (docstring ``train.py:330-342``):
D sees the *updated* generator's outputs (G steps first, outputs are
recomputed, ``train.py:421,432-445``), spatial sizes are unified to the
target image size with exact adaptive average pooling (``train.py:410``),
and the G adversarial target is the *fake/source* label 0 under v2's
real=target convention (``train.py:411-412``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.ops.fda import fda_source_to_target
from rtsds_tpu.ops.losses import bce_with_logits, entropy_loss, \
    segmentation_loss
from rtsds_tpu.ops.pool import adaptive_avg_pool2d
from rtsds_tpu.utils.schedules import lambda_adv_schedule


def _apply_gen(state, params, batch_stats, images):
    """One generator forward in train mode; returns (main, aux1, aux2, bs)."""
    variables = {"params": params}
    mutable = []
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
    outputs, new_state = state.apply_fn(variables, images, train=True,
                                        mutable=mutable)
    new_bs = new_state.get("batch_stats") if new_state else batch_stats
    if isinstance(outputs, (tuple, list)):
        return outputs, new_bs
    return (outputs, None, None), new_bs


def make_adversarial_step(lambda_: float, iterations: int, epochs: int,
                          ignore_index: int | None = 19,
                          variant: str = "v1", donate: bool = True,
                          lambda_ent: float = 0.0, fda_beta: float = 0.0,
                          grl_alpha: float = 0.0):
    """Build the fused G/D step.

    Signature: ``step(gen_state, dis_state, src_images, src_labels,
    tgt_images) -> (gen_state, dis_state, metrics)``.  Source and target
    batches may have different spatial sizes (720x1280 vs 512x1024), as in
    the reference's dataloaders.

    Beyond-reference options, both fused into the same jit program:
    ``lambda_ent > 0`` adds MinEnt target-entropy minimization (ADVENT,
    Vu et al. CVPR'19) on the generator's target logits — scaled by
    ``1/iterations`` under v1's loss convention, unnormalized under v2's;
    ``fda_beta > 0`` restyles each source batch with the target batch's
    low-frequency FFT amplitude before the generator sees it (FDA, Yang
    & Soatto CVPR'20 — see :mod:`rtsds_tpu.ops.fda`).

    ``grl_alpha > 0`` (v1 only; config ``model.adversarial_model.
    discriminator.grl``) switches to DANN-style gradient-reversal
    training: ONE fused backward over a joint loss — the domain-
    classification BCE reaches the generator through a
    ``-alpha*lambda``-scaled gradient reversal at the discriminator
    input (the reference's ``GradientReversalFunction``, ``model.py:
    9-17``, wired for real), while the discriminator minimizes the same
    loss normally.  Cheaper than v1's two backwards on TPU, and the
    discriminator update is bit-identical to v1's (same pre-update
    features, same unweighted BCE); the generator trades v1's
    non-saturating fool-the-D target-only loss for the saturating
    maximize-D-error signal on BOTH domains.
    """
    if grl_alpha and variant != "v1":
        raise ValueError("grl composes with the v1 step only; "
                         f"got variant={variant!r}")
    if grl_alpha:
        step = _make_grl_step(lambda_, iterations, ignore_index, lambda_ent,
                              grl_alpha)
    elif variant == "v1":
        step = _make_v1_step(lambda_, iterations, ignore_index, lambda_ent)
    elif variant == "v2":
        step = _make_v2_step(lambda_, iterations, ignore_index, lambda_ent)
    else:
        raise ValueError(f"unknown adversarial variant {variant!r}")
    step = _with_fda(step, fda_beta)
    if donate:
        return jax.jit(step, donate_argnums=(0, 1))
    return jax.jit(step)


def _with_fda(step, fda_beta: float):
    """Wrap a DA step so the source batch is FDA-restyled on device first
    (part of the same jit program; no extra dispatch)."""
    if not fda_beta:
        return step

    def fda_step(gen_state, dis_state, src_images, src_labels, tgt_images):
        src_images = fda_source_to_target(src_images, tgt_images, fda_beta)
        return step(gen_state, dis_state, src_images, src_labels, tgt_images)

    return fda_step


def _make_v1_step(lambda_: float, iterations: int, ignore_index,
                  lambda_ent: float = 0.0):
    inv_iters = 1.0 / float(iterations)

    def step(gen_state, dis_state, src_images, src_labels, tgt_images):
        # ---- generator update (train.py:195-234) -------------------------
        def gen_loss_fn(gen_params):
            src_out, bs1 = _apply_gen(gen_state, gen_params,
                                      gen_state.batch_stats, src_images)
            seg_loss = segmentation_loss(src_out, src_labels,
                                         ignore_index) * inv_iters
            tgt_out, bs2 = _apply_gen(gen_state, gen_params, bs1, tgt_images)
            tgt_main = tgt_out[0]
            # D params are captured constants here: gradients flow *through*
            # D into G but never update D (the freeze of train.py:192-193)
            d_tgt = dis_state.apply_fn({"params": dis_state.params},
                                       jax.nn.softmax(tgt_main, axis=-1))
            adv_loss = lambda_ * bce_with_logits(d_tgt, 1.0) * inv_iters
            total = seg_loss + adv_loss
            ent_loss = None
            if lambda_ent:
                # MinEnt on target predictions, v1-normalized like the
                # other generator losses
                ent_loss = lambda_ent * entropy_loss(tgt_main) * inv_iters
                total = total + ent_loss
            aux = (bs2, src_out[0], tgt_main, seg_loss, adv_loss, ent_loss)
            return total, aux

        grads_fn = jax.value_and_grad(gen_loss_fn, has_aux=True)
        (_, (new_bs, src_main, tgt_main, seg_loss, adv_loss, ent_loss)), \
            gen_grads = grads_fn(gen_state.params)
        gen_state = gen_state.apply_gradients(grads=gen_grads,
                                              batch_stats=new_bs)

        # ---- discriminator update (train.py:236-264) ----------------------
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

        preds = jnp.argmax(src_main, axis=-1)
        metrics = {
            "loss_gen_source": seg_loss,
            "loss_adversarial": adv_loss,
            "loss_disc_source": loss_dis_src,
            "loss_disc_target": loss_dis_tgt,
            "correct": jnp.sum(preds == src_labels),
            "total": jnp.asarray(src_labels.size, jnp.int32),
        }
        if ent_loss is not None:
            metrics["loss_entropy"] = ent_loss
        return gen_state, dis_state, metrics

    return step


def _make_grl_step(lambda_: float, iterations: int, ignore_index,
                   lambda_ent: float, grl_alpha: float):
    """DANN-style fused step: one ``value_and_grad`` over BOTH param trees.

    The joint loss is ``CE(src)/it + [BCE(D(src),1) + BCE(D(tgt),0)]/it``
    with a ``gradient_reversal(., lambda * alpha)`` between the softmax
    features and D.  Because the reversal sits at D's *input*, D's own
    parameter gradients are untouched (D minimizes the domain loss, same
    update as v1's discriminator step), while the generator receives the
    ``-lambda*alpha``-scaled domain gradient (maximizes D's error on both
    domains).  One backward replaces v1's two.
    """
    from rtsds_tpu.models.discriminator import gradient_reversal

    inv_iters = 1.0 / float(iterations)
    rev_scale = float(lambda_) * float(grl_alpha)

    def step(gen_state, dis_state, src_images, src_labels, tgt_images):
        def joint_loss_fn(gen_params, dis_params):
            src_out, bs1 = _apply_gen(gen_state, gen_params,
                                      gen_state.batch_stats, src_images)
            seg_loss = segmentation_loss(src_out, src_labels,
                                         ignore_index) * inv_iters
            tgt_out, bs2 = _apply_gen(gen_state, gen_params, bs1, tgt_images)
            tgt_main = tgt_out[0]
            src_feat = gradient_reversal(
                jax.nn.softmax(src_out[0], axis=-1), rev_scale)
            tgt_feat = gradient_reversal(
                jax.nn.softmax(tgt_main, axis=-1), rev_scale)
            d_src = dis_state.apply_fn({"params": dis_params}, src_feat)
            d_tgt = dis_state.apply_fn({"params": dis_params}, tgt_feat)
            # unweighted BCE: D's update matches v1's exactly; the
            # generator's weighting lives in rev_scale
            loss_dom_src = bce_with_logits(d_src, 1.0) * inv_iters
            loss_dom_tgt = bce_with_logits(d_tgt, 0.0) * inv_iters
            total = seg_loss + loss_dom_src + loss_dom_tgt
            ent_loss = None
            if lambda_ent:
                ent_loss = lambda_ent * entropy_loss(tgt_main) * inv_iters
                total = total + ent_loss
            aux = (bs2, src_out[0], seg_loss, loss_dom_src, loss_dom_tgt,
                   ent_loss)
            return total, aux

        (_, (new_bs, src_main, seg_loss, loss_dom_src, loss_dom_tgt,
             ent_loss)), (gen_grads, dis_grads) = jax.value_and_grad(
            joint_loss_fn, argnums=(0, 1), has_aux=True)(
            gen_state.params, dis_state.params)
        gen_state = gen_state.apply_gradients(grads=gen_grads,
                                              batch_stats=new_bs)
        dis_state = dis_state.apply_gradients(grads=dis_grads)

        preds = jnp.argmax(src_main, axis=-1)
        metrics = {
            "loss_gen_source": seg_loss,
            # the generator's weighted view of the reversed domain loss
            "loss_adversarial": rev_scale * (loss_dom_src + loss_dom_tgt),
            "loss_disc_source": loss_dom_src,
            "loss_disc_target": loss_dom_tgt,
            "correct": jnp.sum(preds == src_labels),
            "total": jnp.asarray(src_labels.size, jnp.int32),
        }
        if ent_loss is not None:
            metrics["loss_entropy"] = ent_loss
        return gen_state, dis_state, metrics

    return step


def _make_v2_step(lambda_: float, iterations: int, ignore_index,
                  lambda_ent: float = 0.0):
    lam_sched = lambda_adv_schedule(lambda_, iterations)

    def step(gen_state, dis_state, src_images, src_labels, tgt_images):
        tgt_size = (tgt_images.shape[1], tgt_images.shape[2])
        lam = lam_sched(gen_state.step)

        # ---- generator update (train.py:378-421) --------------------------
        def gen_loss_fn(gen_params):
            src_out, bs1 = _apply_gen(gen_state, gen_params,
                                      gen_state.batch_stats, src_images)
            seg_loss = segmentation_loss(src_out, src_labels, ignore_index)
            tgt_out, bs2 = _apply_gen(gen_state, gen_params, bs1, tgt_images)
            real_seg = adaptive_avg_pool2d(tgt_out[0], tgt_size)
            d_real = dis_state.apply_fn({"params": dis_state.params},
                                        jax.nn.softmax(real_seg, axis=-1))
            # v2 convention: target=real=1, source=fake=0; G pushes target
            # toward the fake/source label (train.py:411-412)
            loss_adv = bce_with_logits(d_real, 0.0)
            total = seg_loss + lam * loss_adv
            ent_loss = None
            if lambda_ent:
                # MinEnt on the full-resolution target logits,
                # unnormalized like v2's other losses
                ent_loss = lambda_ent * entropy_loss(tgt_out[0])
                total = total + ent_loss
            return total, (bs2, src_out[0], seg_loss, loss_adv, ent_loss,
                           total)

        (_, (new_bs, src_main, seg_loss, loss_adv, ent_loss, g_total)), \
            gen_grads = \
            jax.value_and_grad(gen_loss_fn, has_aux=True)(gen_state.params)
        gen_state = gen_state.apply_gradients(grads=gen_grads,
                                              batch_stats=new_bs)

        # ---- discriminator update on the UPDATED generator ----------------
        # (reference recomputes both forwards after G steps, train.py:432-445;
        # in train mode under no_grad, so batch stats advance again)
        fake_out, bs3 = _apply_gen(gen_state, jax.lax.stop_gradient(
            gen_state.params), gen_state.batch_stats, src_images)
        real_out, bs4 = _apply_gen(gen_state, jax.lax.stop_gradient(
            gen_state.params), bs3, tgt_images)
        gen_state = gen_state.replace(batch_stats=bs4)
        fake_seg = jax.nn.softmax(adaptive_avg_pool2d(
            jax.lax.stop_gradient(fake_out[0]), tgt_size), axis=-1)
        real_seg = jax.nn.softmax(adaptive_avg_pool2d(
            jax.lax.stop_gradient(real_out[0]), tgt_size), axis=-1)

        def dis_loss_fn(dis_params):
            d_real = dis_state.apply_fn({"params": dis_params}, real_seg)
            d_fake = dis_state.apply_fn({"params": dis_params}, fake_seg)
            d_real_loss = bce_with_logits(d_real, 1.0)
            d_fake_loss = bce_with_logits(d_fake, 0.0)
            return d_real_loss + d_fake_loss, (d_real_loss, d_fake_loss)

        (d_total, (d_real_loss, d_fake_loss)), dis_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True)(dis_state.params)
        dis_state = dis_state.apply_gradients(grads=dis_grads)

        preds = jnp.argmax(src_main, axis=-1)
        metrics = {
            "loss_gen_source": seg_loss,
            "loss_adversarial": loss_adv,
            "loss_gen_total": g_total,
            "loss_disc_source": d_fake_loss,
            "loss_disc_target": d_real_loss,
            "loss_disc_total": d_total,
            "lambda_adv": lam,
            "correct": jnp.sum(preds == src_labels),
            "total": jnp.asarray(src_labels.size, jnp.int32),
        }
        if ent_loss is not None:
            metrics["loss_entropy"] = ent_loss
        return gen_state, dis_state, metrics

    return step
