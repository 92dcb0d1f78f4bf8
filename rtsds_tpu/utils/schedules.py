"""Learning-rate schedules as pure functions (optax-compatible).

Replaces the reference's in-place optimizer mutation
(``poly_lr_scheduler``, ``utils.py:33-48``) with a closed-form schedule fed
to ``optax.inject_hyperparams`` so the LR is computed *inside* the jitted
train step -- no host round-trip per iteration.

Semantics replicated exactly, including the call-site gating in the train
loops: the LR is only refreshed when ``iter % lr_decay_iter == 0`` and
``iter <= max_iter`` (``train.py:68-69,180-181``), holding its previous
value otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr_schedule(init_lr: float, max_iter: int, power: float = 0.9,
                     lr_decay_iter: int = 1):
    """``lr = init_lr * (1 - it/max_iter)**power`` with hold-and-decay gating.

    ``it`` is the most recent step at which the reference would have applied
    the update: the largest multiple of ``lr_decay_iter`` that is <= both the
    current step and ``max_iter``.
    """
    lr_decay_iter = max(int(lr_decay_iter), 1)
    max_update = (max_iter // lr_decay_iter) * lr_decay_iter

    def schedule(step):
        step = jnp.asarray(step)
        it = jnp.minimum((step // lr_decay_iter) * lr_decay_iter, max_update)
        frac = 1.0 - it.astype(jnp.float32) / float(max_iter)
        return init_lr * frac ** power

    return schedule


def poly_epoch_schedule(init_lr: float, epochs: int, power: float,
                        iterations_per_epoch: int):
    """Per-epoch poly decay driven by the step counter.

    The reference decays the discriminator LR once per epoch with
    ``max_iter = epochs`` (``train.py:167``); we derive the epoch from the
    step so the whole thing stays inside jit.
    """

    def schedule(step):
        epoch = jnp.asarray(step) // iterations_per_epoch
        frac = 1.0 - epoch.astype(jnp.float32) / float(epochs)
        return init_lr * frac ** power

    return schedule


def with_warmup(schedule, warmup_iters: int):
    """Linear LR warmup wrapping any schedule (ours; the reference has
    none): the base schedule is scaled by ``min((step+1)/warmup, 1)``,
    so step 0 trains at ``base/warmup`` and the ramp finishes at
    ``warmup_iters``.  ``warmup_iters <= 0`` returns the schedule
    unchanged.  Config: ``training.*.warmup_iters``.
    """
    if int(warmup_iters) <= 0:
        return schedule
    w = float(warmup_iters)

    def warmed(step):
        ramp = jnp.minimum((jnp.asarray(step).astype(jnp.float32) + 1.0) / w,
                           1.0)
        return schedule(step) * ramp

    return warmed


def lambda_adv_schedule(lambda_: float, iterations_per_epoch: int):
    """Adversarial-weight schedule of the reference's v2 loop:
    ``max(lambda, 10*lambda - 0.001*epoch)`` (``train.py:416``)."""

    def schedule(step):
        epoch = (jnp.asarray(step) // iterations_per_epoch).astype(jnp.float32)
        return jnp.maximum(lambda_, lambda_ * 10.0 - 0.001 * epoch)

    return schedule
