"""Pipeline parallelism: a GPipe microbatch schedule over a ``pipe`` mesh
axis, built on ``shard_map`` + ``lax.ppermute``.

The reference has no pipeline parallelism (SURVEY.md §2.3: DP only), and a
CNN segmentation net rarely needs it -- but deep homogeneous block stacks
(e.g. DeepLabV2-R101's 23 identical dilated bottlenecks in layer3,
``deeplabv2.py:82-83``) pipeline naturally when one chip's HBM can't hold
the whole network plus activations.  This module provides the TPU-native
schedule for that case: stage p holds blocks ``[p*L/P, (p+1)*L/P)``; each
tick every stage runs its blocks on one microbatch and ``ppermute``s the
activation to the next stage over ICI, so all stages compute concurrently
after the P-1-tick fill.

Requirements: L blocks with identical input/output shapes and a shared
``block_fn(params_i, x) -> y``; block parameters stacked on a leading
length-L axis (:func:`stack_block_params`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_block_params(params_list):
    """Stack per-block param pytrees into one tree with leading dim L."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *params_list)


def pipeline_apply_stateful(block_fn, stacked_params, stacked_stats, xs,
                            mesh: Mesh, axis: str = "pipe"):
    """GPipe schedule for *stateful* blocks (BatchNorm running stats).

    The training-path variant of :func:`pipeline_apply`: blocks carry
    per-block state (batch_stats) that each REAL microbatch must update
    sequentially, exactly as a gradient-accumulation loop would
    (``train/accumulate.py`` semantics).  Fill/drain ticks feed garbage
    activations through idle stages; their state updates are masked out,
    so running stats see only the M valid microbatches, in order.

    Args:
      block_fn: ``(params_i, stats_i, x_mb) -> (y, new_stats_i)`` with
        ``y.shape == x_mb.shape`` (homogeneous stages).
      stacked_params / stacked_stats: pytrees with leading dim L
        (:func:`stack_block_params`); L must divide by the pipe axis size.
      xs: pre-split microbatches ``(M, mb, ...)``.

    Returns ``(ys, new_stacked_stats)`` where ``ys`` is ``(M, mb, ...)``
    (replicated on every device) and ``new_stacked_stats`` mirrors
    ``stacked_stats`` after M sequential per-microbatch updates.
    Differentiable in reverse mode (the fused train step takes
    ``jax.grad`` straight through the schedule); state updates carry no
    gradient.
    """
    n_stages = mesh.shape[axis]
    lengths = {leaf.shape[0]
               for leaf in jax.tree_util.tree_leaves(stacked_params)}
    if len(lengths) != 1:
        raise ValueError(f"inconsistent stacked leading dims {lengths}")
    (num_blocks,) = lengths
    if num_blocks % n_stages:
        raise ValueError(
            f"{num_blocks} blocks do not split over {n_stages} stages")
    n_micro = xs.shape[0]
    per_stage = num_blocks // n_stages

    def split(tree):
        return jax.tree_util.tree_map(
            lambda p: p.reshape(n_stages, per_stage, *p.shape[1:]), tree)

    params_split, stats_split = split(stacked_params), split(stacked_stats)
    in_specs = (jax.tree_util.tree_map(lambda _: P(axis), params_split),
                jax.tree_util.tree_map(lambda _: P(axis), stats_split),
                P(None))
    out_specs = (P(None),
                 jax.tree_util.tree_map(lambda _: P(axis), stats_split))

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs)
    def run(local_params, local_stats, xs):
        local_params = jax.tree_util.tree_map(lambda p: p[0], local_params)
        local_stats = jax.tree_util.tree_map(lambda s: s[0], local_stats)
        stage_idx = jax.lax.axis_index(axis)

        def stage(x_mb, stats):
            def body(c, ps):
                p, s = ps
                y, s2 = block_fn(p, s, c)
                return y, s2

            return jax.lax.scan(body, x_mb, (local_params, stats))

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        n_ticks = n_micro + n_stages - 1

        def tick(t, state):
            carry, out, stats = state
            x_in = jnp.where(stage_idx == 0,
                             xs[jnp.clip(t, 0, n_micro - 1)], carry)
            y, new_stats = stage(x_in, stats)
            # stage p holds microbatch t-p at tick t; garbage fed during
            # fill (t < p) and drain (t-p >= M) must not touch the stats
            valid = (t >= stage_idx) & (t - stage_idx < n_micro)
            stats = jax.tree_util.tree_map(
                lambda n, o: jnp.where(valid, jax.lax.stop_gradient(n), o),
                new_stats, stats)
            slot = t - (n_stages - 1)
            cs = jnp.clip(slot, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(out, cs, 0, keepdims=False)
            val = jnp.where((stage_idx == n_stages - 1) & (slot >= 0),
                            y, cur)
            out = jax.lax.dynamic_update_index_in_dim(out, val, cs, 0)
            carry = jax.lax.ppermute(y, axis, perm)
            return carry, out, stats

        carry0 = jax.lax.pcast(jnp.zeros(xs.shape[1:], xs.dtype),
                               (axis,), to="varying")
        out0 = jax.lax.pcast(jnp.zeros_like(xs), (axis,), to="varying")
        _, out, stats = jax.lax.fori_loop(
            0, n_ticks, tick, (carry0, out0, local_stats))
        out = jax.lax.psum(
            jnp.where(stage_idx == n_stages - 1, out, 0), axis)
        return out, jax.tree_util.tree_map(lambda s: s[None], stats)

    out, new_stats_split = run(params_split, stats_split, xs)
    new_stacked = jax.tree_util.tree_map(
        lambda s, ref: s.reshape(num_blocks, *ref.shape[1:]),
        new_stats_split, stacked_stats)
    return out, new_stacked


def pipeline_apply(block_fn, stacked_params, x, mesh: Mesh,
                   axis: str = "pipe", num_microbatches: int | None = None):
    """Run ``x`` through L pipelined blocks sharded over ``axis``.

    Args:
      block_fn: ``(params_i, x_microbatch) -> y`` with ``y.shape ==
        x_microbatch.shape`` (homogeneous stages).
      stacked_params: pytree whose leaves have leading dim L
        (:func:`stack_block_params`); L must divide by the axis size.
      x: global batch ``(N, ...)``; N must divide into the microbatch
        count.
      num_microbatches: M (default: the pipe axis size).  Bubble overhead
        is ``(P-1)/(M+P-1)`` -- raise M to amortize.

    Returns the same result as applying the L blocks sequentially
    (unit-tested identical); every device sees the replicated output.

    Implemented as the stats-free special case of
    :func:`pipeline_apply_stateful` (empty state tree) so the subtle
    schedule arithmetic -- ring permute, fill/drain windows, output slot
    gather -- exists exactly once.
    """
    n_stages = mesh.shape[axis]
    n_micro = num_microbatches or n_stages
    if x.shape[0] % n_micro:
        raise ValueError(
            f"batch {x.shape[0]} does not split into {n_micro} microbatches")
    xs = x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

    def stateless_block(params_i, stats_i, x_mb):
        return block_fn(params_i, x_mb), stats_i

    out, _ = pipeline_apply_stateful(
        stateless_block, stacked_params, {}, xs, mesh, axis=axis)
    return out.reshape(x.shape[0], *out.shape[2:])
