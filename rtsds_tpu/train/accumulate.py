"""Gradient accumulation: large effective batches on a fixed HBM budget.

The measured training sweet spot is batch 16/chip at 720x1280 (PERF.md);
bigger batches OOM.  Accumulation runs K micro-batches through a
``lax.scan`` inside ONE jit program, averages the gradients, and applies
a single optimizer update -- an effective batch of ``K x micro`` with the
activation memory of one micro-batch.  The reference has no equivalent
(torch users hand-roll ``loss/K; backward(); every Kth step()``).

Semantics:
* gradients: mean over micro-batches == the full-batch gradient of the
  mean loss (exact when micro-batches weigh equally; with
  ``ignore_index`` masking, micro-batches with different valid-pixel
  counts weigh per-micro-batch rather than per-pixel -- the same
  behavior as torch-style ``loss/K`` accumulation).
* BatchNorm batch stats: updated per micro-batch sequentially (running
  stats see K updates per step) -- same as torch accumulation, and
  deliberately NOT a "ghost batch" deviation; document if comparing
  against one huge true batch.
* the optimizer step counter advances ONCE per accumulated step, so LR
  schedules see optimizer steps, not micro-batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtsds_tpu.ops.losses import segmentation_loss


def make_accumulating_train_step(ignore_index: int | None = 19,
                                 donate: bool = True):
    """Returns ``train_step(state, images, labels) -> (state, metrics)``.

    ``images``: (K, micro, H, W, C) float32 -- K micro-batches;
    ``labels``: (K, micro, H, W) int32.  K is read off the leading data
    dimension (so it can never disagree with the data); callers reshape a
    flat ``(K*micro, ...)`` batch with :func:`split_microbatches`.
    """

    def train_step(state, images, labels):
        accum_steps = images.shape[0]
        def loss_fn(params, batch_stats, mb_images, mb_labels):
            variables = {"params": params}
            mutable = []
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            outputs, new_model_state = state.apply_fn(
                variables, mb_images, train=True, mutable=mutable)
            loss = segmentation_loss(outputs, mb_labels, ignore_index)
            main = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
            new_bs = (new_model_state.get("batch_stats")
                      if new_model_state else None)
            preds = jnp.argmax(main, axis=-1)
            correct = jnp.sum(preds == mb_labels)
            return loss, (new_bs, correct)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, mb):
            batch_stats, grad_acc, loss_acc, correct_acc = carry
            mb_images, mb_labels = mb
            (loss, (new_bs, correct)), grads = grad_fn(
                state.params, batch_stats, mb_images, mb_labels)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            next_bs = new_bs if new_bs is not None else batch_stats
            return ((next_bs, grad_acc, loss_acc + loss,
                     correct_acc + correct), None)

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p), state.params)
        # result_type keeps the carry x64-clean under f64 parity runs
        init = (state.batch_stats, zero_grads,
                jnp.zeros((), jnp.result_type(float)),
                jnp.zeros((), jnp.result_type(int)))
        (batch_stats, grad_sum, loss_sum, correct), _ = jax.lax.scan(
            body, init, (images, labels))

        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grad_sum)
        state = state.apply_gradients(grads=grads, batch_stats=batch_stats)
        metrics = {
            "train_loss": loss_sum / accum_steps,
            "correct": correct,
            "total": jnp.asarray(labels.size, jnp.int32),
        }
        return state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def split_microbatches(batch, accum_steps: int):
    """(K*micro, ...) -> (K, micro, ...) for the accumulating step."""
    arr = jnp.asarray(batch)
    n = arr.shape[0]
    if n % accum_steps:
        raise ValueError(
            f"batch {n} does not split into {accum_steps} micro-batches")
    return arr.reshape(accum_steps, n // accum_steps, *arr.shape[1:])
