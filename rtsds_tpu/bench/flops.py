"""FLOPs / parameter accounting via XLA cost analysis.

Replaces the reference's fvcore FlopCountAnalysis recipe
(``utils.py:138-144``, ``README.md:133-155``) with the compiler's own
numbers: ``jit(f).lower(...).compile().cost_analysis()`` -- the FLOPs XLA
actually scheduled, not an operator-table estimate.
"""

from __future__ import annotations

import jax
import numpy as np


def cost_analysis(fn, *args) -> dict:
    """Compile ``fn`` for ``args`` and return {'flops': ..., 'bytes': ...}."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per computation
        costs = costs[0] if costs else {}
    return {
        "flops": float(costs.get("flops", float("nan"))),
        "bytes_accessed": float(costs.get("bytes accessed",
                                          costs.get("bytes_accessed",
                                                    float("nan")))),
        "raw": dict(costs) if costs else {},
    }


def count_parameters(params) -> int:
    """Trainable parameter count (``utils.py:143-144``)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)
                   if hasattr(x, "shape")))


def model_flops(model, input_shape, train: bool = False) -> dict:
    """FLOPs + params for a model forward at the given NHWC input shape."""
    import jax.numpy as jnp

    key = jax.random.key(0)
    x = jnp.zeros(input_shape, jnp.float32)
    try:
        variables = model.init(key, x, train=train)

        def forward(variables, x):
            return model.apply(variables, x, train=train)
    except TypeError:  # modules without a train/eval distinction
        variables = model.init(key, x)

        def forward(variables, x):
            return model.apply(variables, x)

    costs = cost_analysis(forward, variables, x)
    costs["parameters"] = count_parameters(variables["params"])
    return costs
