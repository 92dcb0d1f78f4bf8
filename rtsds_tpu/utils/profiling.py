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
import os

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


def op_profile(log_dir: str, top: int = 25) -> dict:
    """Parse a captured trace into per-op device timings.

    Reads the Chrome-trace export (``*.trace.json.gz``) that
    ``jax.profiler`` writes (works on remote/tunneled backends where the
    TensorBoard profile plugin is unavailable) and returns::

        {"total_ms": ..., "by_category": {cat: ms},
         "top_ops": [(ms, name), ...]}

    Categories strip trailing indices (``fusion.125`` -> ``fusion``), so
    layout ``copy`` time, conv fusions, reductions etc. are immediately
    comparable.  This is how the round-2 backward-pass diagnosis was made:
    28% of the b4 training backward was pure layout copies.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    cat: collections.Counter = collections.Counter()
    ops = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if not str(pids.get(e.get("pid"), "")).startswith("/device"):
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.isdigit():
            continue
        dur = e.get("dur", 0)
        ops.append((dur, name))
        cat[re.sub(r"[.\d]+$", "", name)] += dur
    ops.sort(reverse=True)
    return {
        "total_ms": sum(d for d, _ in ops) / 1e3,
        "by_category": {k: v / 1e3 for k, v in cat.most_common()},
        "top_ops": [(d / 1e3, n) for d, n in ops[:top]],
    }
