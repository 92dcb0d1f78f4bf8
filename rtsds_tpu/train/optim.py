"""Optimizer factory with torch-equivalent update rules.

Parity with ``optimzer_loss_loader`` (``main.py:110-122``):
  * Adam: torch defaults betas=(0.9, 0.999), eps=1e-8; torch-style
    ``weight_decay`` adds ``wd * param`` to the gradient *before* the Adam
    moments (not decoupled AdamW), i.e.
    ``chain(add_decayed_weights(wd), scale_by_adam, lr)``
  * SGD: heavy-ball momentum, no dampening/nesterov

Learning rates are schedules evaluated inside the jitted step (see
``rtsds_tpu/utils/schedules.py``).  Extras the reference declared but never
wired, implemented for real here:
  * ``frozen_mask``: zero the update for masked params (DeepLabV2 frozen BN
    affine, ``deeplabv2.py:14-27``)
  * ``lr_multipliers``: per-param LR scaling (the 1x/10x split of
    ``deeplabv2.py:171-173``)
  * ``grad_clip``: global-norm gradient clipping (config
    ``optimizer.grad_clip``) — standard stabilizer for the adversarial
    loops; applied before everything else in the chain
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def _scale_by_tree(multipliers) -> optax.GradientTransformation:
    """``multipliers``: a pytree of per-param scale factors, or a callable
    ``params_like -> pytree`` materialized lazily at update time (mirrors
    ``optax.masked``'s callable-mask support, so factories can build the
    transform before any params exist)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        mult = multipliers(updates) if callable(multipliers) else multipliers
        scaled = jax.tree_util.tree_map(lambda u, m: u * m, updates, mult)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(name: str, learning_rate: float | Callable,
                   weight_decay: float = 0.0, momentum: float = 0.9,
                   frozen_mask=None, lr_multipliers=None,
                   grad_clip: float = 0.0
                   ) -> optax.GradientTransformation:
    parts: list[optax.GradientTransformation] = []
    if frozen_mask is not None:
        parts.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if grad_clip:
        # after the freeze (frozen params must not inflate the global
        # norm), before the moment estimators (clip raw gradients)
        parts.append(optax.clip_by_global_norm(float(grad_clip)))
    if name == "Adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "SGD":
        parts.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError("Invalid optimizer name. Please select Adam or SGD")
    if lr_multipliers is not None:
        parts.append(_scale_by_tree(lr_multipliers))
    parts.append(optax.scale_by_learning_rate(learning_rate))  # negates
    return optax.chain(*parts)


def optimizer_from_config(opt_cfg, schedule) -> optax.GradientTransformation:
    """Build from a config node like ``{name, lr[, weight_decay, momentum]}``
    (``config.yaml:38-76``); ``schedule`` overrides the static lr."""
    return make_optimizer(
        opt_cfg["name"],
        learning_rate=schedule if schedule is not None else opt_cfg["lr"],
        weight_decay=float(opt_cfg.get("weight_decay", 0.0) or 0.0),
        momentum=float(opt_cfg.get("momentum", 0.9) or 0.9),
        grad_clip=float(opt_cfg.get("grad_clip", 0.0) or 0.0),
    )
