"""Pallas TPU kernel: GTA5 RGB -> trainId label remap.

The device-side companion of the vectorized remap (``rtsds_tpu/ops/remap.py``)
and the C++ host LUT (``native/rtsds_host_ops.cpp``), for pipelines that ship
raw RGB-coded labels to the device (``gta5.py:111-118`` semantics).

Per tile: pack each pixel's RGB into a 24-bit key (VPU integer math), compare
against the class-key row broadcast across lanes, and take the argmax lane;
pixels matching no key get ``default_id``.  Layout follows the histogram
kernel's rule: pixels ride the sublane axis, classes ride the 128-lane axis,
so Mosaic never needs a relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtsds_tpu.utils.colors import class_colors_for_remap

LANES = 128
TILE = 2048  # pixels per grid step


def _remap_kernel(keys_ref, rgb_ref, out_ref, *, default_id: int):
    rgb = rgb_ref[:].reshape(TILE, 4).astype(jnp.int32)  # (TILE, rgb0)
    key = rgb[:, 0:1] * 65536 + rgb[:, 1:2] * 256 + rgb[:, 2:3]  # (TILE, 1)
    class_keys = keys_ref[:]                      # (1, LANES) int32
    matches = key == class_keys                   # (TILE, LANES)
    ids = jnp.argmax(matches, axis=1, keepdims=True)
    any_match = jnp.any(matches, axis=1, keepdims=True)
    out_ref[:] = jnp.where(any_match, ids,
                           jnp.int32(default_id)).reshape(1, TILE, 1)


@functools.partial(jax.jit,
                   static_argnames=("default_id", "interpret"))
def rgb_to_train_ids_pallas(rgb, color_table=None, default_id: int = 255,
                            interpret: bool = False):
    """(..., 3) uint8/int RGB -> (...) int32 trainIds (gta5.py:10-46 table)."""
    if color_table is None:
        color_table = class_colors_for_remap()
    table = jnp.asarray(color_table, jnp.int32)
    keys = table[:, 0] * 65536 + table[:, 1] * 256 + table[:, 2]
    # pad class keys to the 128-lane width with an impossible key
    keys = jnp.concatenate(
        [keys, jnp.full((LANES - keys.shape[0],), -1, jnp.int32)])[None, :]

    batch_shape = rgb.shape[:-1]
    px = jnp.asarray(rgb, jnp.int32).reshape(-1, 3)
    n = px.shape[0]
    pad = (-n) % TILE
    if pad:
        px = jnp.concatenate([px, jnp.full((pad, 3), -1, jnp.int32)])
    # pad the channel dim 3 -> 4 (sublane-friendly power of two)
    px = jnp.concatenate([px, jnp.zeros((px.shape[0], 1), jnp.int32)], axis=1)
    num_tiles = px.shape[0] // TILE
    px = px.reshape(num_tiles, TILE, 4)

    out = pl.pallas_call(
        functools.partial(_remap_kernel, default_id=default_id),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE, 1), jnp.int32),
        interpret=interpret,
    )(keys, px)
    return out.reshape(-1)[:n].reshape(batch_shape)
