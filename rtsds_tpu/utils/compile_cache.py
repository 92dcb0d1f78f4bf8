"""Persistent XLA compilation cache.

First compiles of the big fused programs cost minutes on TPU (the
compile service round-trip); the reference has no analog because torch
eager pays nothing up front.  Enabling a cache directory makes every
restart -- training resume, serving process churn, bench reruns -- reuse
the compiled executables keyed by HLO hash, so only genuinely new graphs
compile.

Config: ``compilation_cache: /path/to/cache`` (config.yaml, consumed by
the CLI); library users call :func:`enable_compilation_cache` directly
before the first jit execution.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str,
                             min_compile_time_secs: float = 0.0) -> str:
    """Turn on the on-disk XLA compilation cache at ``path``.

    ``min_compile_time_secs`` > 0 skips caching trivial programs (they
    recompile faster than they deserialize); 0 caches everything.
    Returns the absolute cache path.
    """
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # the cache singleton initializes lazily at the FIRST compile and then
    # ignores config changes; if anything already compiled in this process
    # (e.g. the seeding PRNG), reset so the new directory takes effect
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        _cc.reset_cache()
    except Exception:
        pass  # older/newer layouts: the config alone suffices pre-compile
    return path
