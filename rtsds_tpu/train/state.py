"""Train state: params + batch stats + optimizer state in one pytree.

The functional analog of the reference's (model, optimizer) pairs
(``main.py:110-231``).  Everything the step mutates lives here, so a train
step is ``(state, batch) -> (state, metrics)`` and jit-compiles into one
program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, batch_stats=None, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
            opt_state=new_opt_state,
            **kwargs,
        )

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, key, example_input, tx,
                       train: bool = True, pretrained: dict | None = None,
                       pretrained_submodule: str | None = None) -> TrainState:
    """Initialize model variables (optionally overlaying converted
    pretrained weights) and wrap them with the optimizer."""
    try:
        variables = model.init(key, example_input, train=train)
    except TypeError:
        # modules without train/eval distinction (e.g. the discriminators)
        variables = model.init(key, example_input)
    if pretrained is not None:
        from rtsds_tpu.models.pretrained import merge_pretrained

        variables = merge_pretrained(dict(variables), pretrained,
                                     submodule=pretrained_submodule)
    if isinstance(variables, FrozenDict):
        variables = variables.unfreeze()
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
