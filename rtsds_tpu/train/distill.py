"""Knowledge-distillation training: a frozen teacher guides the student.

Beyond-parity capability (the reference trains each model independently;
``train.py:65-113`` is plain supervised CE): a trained high-accuracy
teacher (typically DeepLabV2-R101) transfers its soft class distributions
to the real-time student (typically BiSeNet) — the standard route to
closing the accuracy gap between the two model families the framework
ships (Hinton et al. 2015; structured-KD for segmentation, Liu et al.
CVPR'19).

TPU design: ONE jit program per step — teacher eval-mode forward, student
train-mode forward, CE + temperature-scaled KL, backward, optimizer
update.  The teacher's variables enter as a (non-donated) ARGUMENT rather
than a closure so the weights are not baked into the HLO as constants
(which would re-trigger the multi-minute remote compile per teacher) and
the same compiled program serves any teacher of that architecture.
Soft-target work is pure elementwise/reduce on the VPU and fuses behind
the teacher's conv stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.ops.losses import segmentation_loss
from rtsds_tpu.utils.dtypes import at_least_f32


def distillation_kl(student_logits, teacher_logits, temperature: float = 2.0):
    """Mean per-pixel KL(teacher_T || student_T) * T^2 (Hinton scaling,
    so the soft-target gradient magnitude stays comparable across T).

    ALL pixels contribute — including ones a hard-label CE would ignore:
    the teacher supplies signal exactly where labels don't (one of
    distillation's benefits for segmentation).  Computed in f32 whatever
    the compute dtype.
    """
    t = at_least_f32(teacher_logits) / temperature
    s = at_least_f32(student_logits) / temperature
    p_t = jax.nn.softmax(t, axis=-1)
    # KL(p_t || p_s) = sum p_t * (log p_t - log p_s); both via log_softmax
    kl = jnp.sum(p_t * (jax.nn.log_softmax(t, axis=-1)
                        - jax.nn.log_softmax(s, axis=-1)), axis=-1)
    return jnp.mean(kl) * (temperature ** 2)


def make_distill_step(teacher_apply_fn, ignore_index: int | None = 19, *,
                      temperature: float = 2.0, alpha: float = 0.5,
                      donate: bool = True):
    """Build the fused distillation train step.

    Signature: ``step(state, teacher_variables, images, labels) ->
    (state, metrics)``.  ``teacher_variables`` is the frozen
    ``{"params": ..., ["batch_stats": ...]}`` tree (never donated, never
    updated); pass the SAME tree object every call so jit caching holds.

    Loss = ``alpha * CE(student, labels) + (1 - alpha) * KL_T`` where the
    CE is the usual main+aux :func:`segmentation_loss` (so BiSeNet aux
    heads still learn from hard labels) and the KL distills the MAIN head
    against the teacher's main output.  ``alpha=1`` recovers the plain
    supervised step.
    """

    def step(state, teacher_variables, images, labels):
        t_out = teacher_apply_fn(teacher_variables, images, train=False)
        if isinstance(t_out, (tuple, list)):
            t_out = t_out[0]
        t_out = jax.lax.stop_gradient(t_out)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            outputs, new_model_state = state.apply_fn(
                variables, images, train=True, mutable=mutable)
            ce = segmentation_loss(outputs, labels, ignore_index)
            main = outputs[0] if isinstance(outputs, (tuple, list)) \
                else outputs
            kd = distillation_kl(main, t_out, temperature)
            loss = alpha * ce + (1.0 - alpha) * kd
            return loss, (new_model_state, main, ce, kd)

        (loss, (new_model_state, logits, ce, kd)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_batch_stats = new_model_state.get("batch_stats") \
            if new_model_state else state.batch_stats
        state = state.apply_gradients(grads=grads,
                                      batch_stats=new_batch_stats)

        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "train_loss": loss,
            "loss_ce": ce,
            "loss_distill": kd,
            "correct": jnp.sum(preds == labels),
            "total": jnp.asarray(labels.size, jnp.int32),
        }
        return state, metrics

    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def quantize_teacher(teacher_name: str, teacher_variables, calib_batches,
                     policy=None):
    """W8A8-quantize the frozen KD teacher (TPU-native extension).

    The teacher forward is a pure eval-mode inference repeated every
    step — exactly the serving profile the PTQ driver (``ops/quant.py``)
    was measured on (DeepLab 1.13x, BiSeNet 1.249x), so quantizing it
    recovers most of distillation's overhead while the student stays
    full-precision.  Soft targets tolerate the int8 logit perturbation:
    serving-path tests gate mask agreement and the trained-model mIoU
    within 2 points, and the KL target is softmax-smoothed on top.

    ``calib_batches``: iterable of image batches AFTER the production
    preprocess (the same distribution the teacher will see in the step).
    Returns ``(apply_fn, qtree)``: ``apply_fn`` is a drop-in
    ``teacher_apply_fn`` for :func:`make_distill_step` and ``qtree``
    replaces ``teacher_variables`` as the step's second argument (still
    a pytree, still passed — never baked into the HLO).

    The mechanism is the generic :func:`rtsds_tpu.ops.quant.
    quantize_model`; this wrapper exists as the distillation-facing
    name (and the error message a distillation config deserves).
    """
    from rtsds_tpu.ops.quant import quantize_model

    # Pre-check the dispatch so ONLY the unsupported-model case gets the
    # distillation-facing message; a ValueError raised later (calibration,
    # qtree construction) propagates unrelabeled.
    if teacher_name not in ("bisenet", "deeplab"):
        raise ValueError(f"no int8 teacher path for model {teacher_name!r} "
                         "(expected 'bisenet' or 'deeplab')")
    return quantize_model(teacher_name, teacher_variables,
                          calib_batches, policy=policy)


def load_teacher_variables(checkpoint_dir: str, use_ema: bool = True):
    """Frozen teacher weights from a ModelCheckpoint directory.

    Mirrors ``Predictor.from_checkpoint``'s selection: best step (else
    latest); the segmentation state lives under ``model`` (supervised
    runs) or ``generator`` (DA runs); when the run trained with EMA the
    ``ema`` item holds the weights the validated mIoU was computed on —
    distill from THOSE by default.
    """
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(checkpoint_dir)
    step = mgr.best_step()
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"distillation teacher: no checkpoints in {checkpoint_dir}")
    restored = mgr.restore(step)
    mgr.close()
    tree = restored.get("model", restored.get("generator", restored))
    params = tree["params"]
    ema = restored.get("ema") if hasattr(restored, "get") else None
    if use_ema and ema:
        params = ema["params"]
    variables = {"params": params}
    if "batch_stats" in tree and tree["batch_stats"] is not None:
        variables["batch_stats"] = tree["batch_stats"]
    return variables
