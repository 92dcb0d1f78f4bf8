"""Debug guardrails (SURVEY.md §5.2: the reference has no sanitizers; the
JAX-native equivalents are NaN checking and functional purity).

``enable_debug()`` flips the runtime into paranoid mode:
  * ``jax_debug_nans`` -- re-runs any op producing NaN un-jitted and raises
    with the offending primitive (catches silent loss blowups)
  * ``jax_disable_most_optimizations`` optionally, to bisect miscompiles
"""

from __future__ import annotations

import jax


def enable_debug(nans: bool = True, disable_jit: bool = False,
                 disable_optimizations: bool = False):
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    if disable_optimizations:
        jax.config.update("jax_default_matmul_precision", "highest")


def disable_debug():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_disable_jit", False)
