"""Test harness: run everything on CPU with 8 virtual devices.

This is the JAX-native fake backend for exercising the multi-chip sharding
path without TPU hardware (SURVEY.md §4 test plan).  Env vars must be set
before the first jax import.
"""

import os

# Hard-set (not setdefault): the ambient environment may export
# JAX_PLATFORMS=<tpu-plugin>; unit tests must run on the virtual-device CPU
# backend.  Prefer invoking as `PYTHONPATH= python -m pytest tests/` so the
# TPU plugin's sitecustomize registration (which claims the chip) is skipped
# entirely.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The ambient TPU plugin's sitecustomize may pin jax_platforms
# programmatically, overriding the env var; config.update wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model graphs are large and CPU compiles are
# slow; cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
