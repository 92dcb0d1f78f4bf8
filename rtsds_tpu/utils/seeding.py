"""Seeding (reference: ``main.py:264-270``).

JAX randomness is explicit (``jax.random.key``), so "seeding the framework"
means constructing the root PRNG key; we also seed numpy for any host-side
shuffling in the input pipeline.
"""

from __future__ import annotations

import jax
import numpy as np


def set_seed(seed: int):
    """Seed numpy and return the root JAX PRNG key."""
    np.random.seed(seed)
    return jax.random.key(seed)
