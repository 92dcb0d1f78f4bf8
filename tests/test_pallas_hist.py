"""Pallas confusion-matrix kernel vs the jnp reference (interpret mode on
CPU; the compiled path runs on TPU in the bench/eval harnesses)."""

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.ops.pallas.hist import fast_hist_pallas
from rtsds_tpu.utils.metrics import fast_hist


def test_pallas_hist_matches_reference(rng):
    labels = rng.integers(0, 25, size=(2, 37, 53))  # includes invalid ids
    preds = rng.integers(0, 19, size=(2, 37, 53))
    ours = np.asarray(fast_hist_pallas(jnp.asarray(labels), jnp.asarray(preds),
                                       num_classes=19, interpret=True))
    ref = np.asarray(fast_hist(labels, preds, 19))
    np.testing.assert_array_equal(ours, ref)


def test_pallas_hist_all_ignored(rng):
    labels = np.full((100,), 19)
    preds = rng.integers(0, 19, size=(100,))
    out = np.asarray(fast_hist_pallas(jnp.asarray(labels), jnp.asarray(preds),
                                      num_classes=19, interpret=True))
    assert out.sum() == 0


def test_pallas_hist_exact_tile_multiple(rng):
    n = 2048 * 3  # exactly 3 tiles, no padding
    labels = rng.integers(0, 19, size=(n,))
    preds = rng.integers(0, 19, size=(n,))
    ours = np.asarray(fast_hist_pallas(jnp.asarray(labels), jnp.asarray(preds),
                                       num_classes=19, interpret=True))
    ref = np.asarray(fast_hist(labels, preds, 19))
    np.testing.assert_array_equal(ours, ref)
