"""Pallas TPU kernel: confusion-matrix (fast_hist) accumulation.

The XLA lowering of ``jnp.bincount`` (``rtsds_tpu/utils/metrics.py``) is a
serial scatter-add -- the one op in the eval path that doesn't vectorize.
This kernel reformulates the histogram as a matmul on the MXU: for a tile
of P pixels, build one-hot(labels) and one-hot(preds) as (P, 128) tiles
(classes padded to the 128-lane width) and accumulate
``one_hot(labels)^T @ one_hot(preds)`` into a (128, 128) f32 block resident
in VMEM across the whole grid.  Invalid labels (>= num_classes, e.g. the
ignore id) produce all-zero one-hot rows and drop out automatically.

Grid: 1-D over pixel tiles; the output block is revisited by every step
(zeroed at step 0), so the accumulator never leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 2048  # pixels per grid step


def _hist_kernel(labels_ref, preds_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # blocks are (1, TILE, 1); dropping the leading unit dim is layout-free
    lbl = labels_ref[:].reshape(TILE, 1)          # (TILE, 1) int32
    prd = preds_ref[:].reshape(TILE, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 1)
    onehot_l = (col == lbl).astype(jnp.float32)    # invalid ids -> zero row
    onehot_p = (col == prd).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        onehot_l, onehot_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def fast_hist_pallas(labels, preds, num_classes: int = 19,
                     interpret: bool = False):
    """Drop-in fast_hist (``utils.py:52-58`` semantics): (n, n) int32.

    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    if num_classes > LANES:
        raise ValueError(f"num_classes must be <= {LANES}")
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    n = labels.shape[0]
    pad = (-n) % TILE
    if pad:
        # padded labels get an out-of-range id -> zero one-hot row
        labels = jnp.concatenate([labels, jnp.full((pad,), LANES, jnp.int32)])
        preds = jnp.concatenate([preds, jnp.zeros((pad,), jnp.int32)])
    # out-of-range *valid-pixel* guard: ids >= num_classes must also drop
    labels = jnp.where((labels >= 0) & (labels < num_classes), labels, LANES)
    num_tiles = labels.shape[0] // TILE
    # (num_tiles, TILE, 1): block last-two dims (TILE, 1) satisfy the TPU
    # tiling rules (TILE % 8 == 0; trailing dim equals the array's), and
    # pixels land on the sublane axis so the kernel needs no relayout
    shape3 = (num_tiles, TILE, 1)
    labels = labels.reshape(shape3)
    preds = preds.reshape(shape3)

    block = pl.BlockSpec((1, TILE, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hist_kernel,
        grid=(num_tiles,),
        in_specs=[block, block],
        out_specs=pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, LANES), jnp.float32),
        interpret=interpret,
    )(labels, preds)
    return out[:num_classes, :num_classes].astype(jnp.int32)
