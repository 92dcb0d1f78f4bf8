"""Dtype helpers shared by models and ops."""

from __future__ import annotations

import jax.numpy as jnp


def at_least_f32(x):
    """Promote to float32 accumulation precision without DOWNCASTING:
    bf16 -> f32 (losses/outputs must not accumulate in bf16) but f64 stays
    f64, so float64 parity runs keep their precision end to end."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
