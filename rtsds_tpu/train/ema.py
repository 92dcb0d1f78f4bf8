"""Exponential moving average of parameters (teacher weights).

Standard production-training tooling (mean-teacher / self-distillation in
domain adaptation, eval-time weight averaging) the reference lacks.  Pure
pytree functions, designed to live INSIDE the jitted train step: the EMA
update is elementwise and fuses with the optimizer update for free.

Usage::

    ema = ema_init(state.params)
    ...inside the step, after apply_gradients...
    ema = ema_update(ema, state.params, decay=0.999, step=state.step)

``step`` enables the standard warmup ``min(decay, (1+t)/(10+t))`` so
early EMA isn't dominated by the random init; pass ``step=None`` for a
constant decay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """EMA state = a COPY of the parameter pytree.

    A real copy matters: the train steps donate their state
    (``donate_argnums``), so an aliased EMA tree would reference deleted
    buffers after the first update.
    """
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def setup_ema(params, decay: float, seed=None):
    """One-stop EMA wiring for the training loops.

    Returns ``(ema_params, ema_apply)`` where ``ema_apply(ema, params,
    step)`` is the jitted warmup-decay update with the EMA buffer
    DONATED (elementwise update reuses it in place; the dispatch
    pipelines behind the train step -- measured +0.3% on the b8
    720x1280 step).  ``seed`` (e.g. a resume-restored tree, possibly
    host numpy) initializes the average; it is committed to device so
    donation works; otherwise the average starts at ``params``.
    """
    if seed is None:
        ema_params = ema_init(params)
    else:
        ema_params = jax.tree_util.tree_map(jnp.asarray, seed)
    ema_apply = jax.jit(
        lambda e, p, s: ema_update(e, p, decay=decay, step=s),
        donate_argnums=(0,))
    return ema_params, ema_apply


def ema_update(ema_params, params, decay: float = 0.999, step=None):
    """One EMA step: ``e <- d*e + (1-d)*p`` with optional warmup decay."""
    d = jnp.asarray(decay, jnp.float32)
    if step is not None:
        t = jnp.asarray(step, jnp.float32)
        d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
    return jax.tree_util.tree_map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params, params)
