"""Pallas RGB->trainId remap kernel vs the jnp reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.ops.pallas.remap import rgb_to_train_ids_pallas
from rtsds_tpu.ops.remap import rgb_to_train_ids
from rtsds_tpu.utils.colors import class_colors_for_remap


def test_pallas_remap_matches_reference(rng):
    colors = class_colors_for_remap()
    ids = rng.integers(0, 19, size=(37, 53))
    rgb = colors[ids].astype(np.uint8)
    rgb[0, :5] = [1, 2, 3]  # unknown colors -> 255
    ours = np.asarray(rgb_to_train_ids_pallas(jnp.asarray(rgb),
                                              interpret=True))
    ref = np.asarray(rgb_to_train_ids(jnp.asarray(rgb)))
    np.testing.assert_array_equal(ours, ref)


def test_pallas_remap_batched(rng):
    colors = class_colors_for_remap()
    ids = rng.integers(0, 19, size=(2, 64, 64))
    rgb = colors[ids].astype(np.uint8)
    out = np.asarray(rgb_to_train_ids_pallas(jnp.asarray(rgb),
                                             interpret=True))
    np.testing.assert_array_equal(out, ids)
