"""Profiling / tracing utilities.

The reference's "profiling" is fvcore FLOPs + an unwired torch-tb-profiler
dependency (SURVEY.md §5.1).  TPU-native replacements:

  * :func:`trace` -- ``jax.profiler`` trace context writing a TensorBoard-
    loadable / Perfetto-loadable trace of device execution
  * :func:`annotate` -- named regions inside a trace
  * FLOPs/bytes via XLA cost analysis live in ``rtsds_tpu/bench/flops.py``
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rtsds_trace", create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block.

    View with TensorBoard's profile plugin or upload the .perfetto trace to
    ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region: ``with annotate("step"): ...``"""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
