"""Supervised segmentation train step: one fused jit program.

The reference's per-iteration body (``train.py:65-113``) -- poly LR update,
forward, CE(main) + CE(aux1) + CE(aux2), backward, step, running pixel
accuracy -- compiles here into a single XLA program.  The LR schedule is
evaluated from ``state.step`` inside the program (no host round trip), and
pixel-accuracy counters are returned as device scalars fetched lazily.

Accuracy parity note: like the reference (``train.py:102-106``), ALL pixels
count toward the accuracy denominator, including ignore-index ones (they
can never be predicted, so they count as errors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.ops.losses import segmentation_loss


def make_train_step(ignore_index: int | None = 19, donate: bool = True):
    """Returns ``train_step(state, images, labels) -> (state, metrics)``.

    ``images``: NHWC float32 (already preprocessed); ``labels``: (N, H, W)
    int32.  Works for both model families: BiSeNet's training 3-tuple and
    DeepLabV2's ``(x, None, None)`` flow through ``segmentation_loss``.
    """

    def train_step(state, images, labels):
        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            outputs, new_model_state = state.apply_fn(
                variables, images, train=True, mutable=mutable)
            loss = segmentation_loss(outputs, labels, ignore_index)
            main = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
            return loss, (new_model_state, main)

        (loss, (new_model_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_batch_stats = new_model_state.get("batch_stats") \
            if new_model_state else state.batch_stats
        state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)

        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum(preds == labels)
        total = labels.size
        metrics = {
            "train_loss": loss,
            "correct": correct,
            "total": jnp.asarray(total, dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        }
        return state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)
