"""GTA5 RGB -> Cityscapes trainId label remap, vectorized.

The reference decodes colored GTA5 labels with a Python loop over 19
classes, building a boolean mask per class (``gta5.py:111-118``).  Here the
whole remap is one vectorized comparison against the (19, 3) color table --
jittable, batched, and fused by XLA into a single pass over the image.
Pixels matching no class key become ``default_id`` (the reference
zero-initializes, silently folding void into class 0 'road'; we default to
the void id 255 and expose ``reference_compat=True`` for the original
behavior).
"""

from __future__ import annotations

import jax.numpy as jnp

from rtsds_tpu.utils.colors import class_colors_for_remap


def rgb_to_train_ids(rgb, color_table=None, default_id: int = 255,
                     reference_compat: bool = False):
    """Map an RGB label image to trainIds.

    Args:
      rgb: (..., H, W, 3) uint8/int array of label colors.
      color_table: (num_classes, 3) RGB key per trainId; defaults to the
        19-class Cityscapes table (``gta5.py:10-46``).
      default_id: id for pixels matching no key.
      reference_compat: if True, unmatched pixels get 0 (road), replicating
        ``gta5.py:112`` exactly.

    Returns (..., H, W) int32 trainId map.
    """
    if color_table is None:
        color_table = class_colors_for_remap()
    table = jnp.asarray(color_table, dtype=jnp.int32)  # (C, 3)
    px = jnp.asarray(rgb, dtype=jnp.int32)  # (..., 3)
    # (..., 1, 3) == (C, 3) -> (..., C)
    matches = jnp.all(px[..., None, :] == table, axis=-1)
    ids = jnp.argmax(matches, axis=-1).astype(jnp.int32)
    any_match = jnp.any(matches, axis=-1)
    if reference_compat:
        fill = 0
    else:
        fill = default_id
    return jnp.where(any_match, ids, jnp.int32(fill))
