"""Visualization helpers (utils.py:146-201 parity) and the val/val_GTA5
wrapper surfaces (validation.py:12,79)."""

import os

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.eval.validate import val, val_GTA5
from rtsds_tpu.utils.colors import CLASS_NAMES, TRAIN_ID_TO_COLOR, apply_color_map
from rtsds_tpu.utils.viz import rescale_for_display, visualize_batches


class _IdentityState:
    """Minimal 'state': apply_fn returns one-hot logits equal to the label
    channel, so predictions == labels and mIoU == 1."""

    def __init__(self, num_classes):
        self.num_classes = num_classes

    @property
    def variables(self):
        return {}

    def apply_fn(self, variables, images, train=False):
        # images here are (N, H, W) int labels smuggled through the iterator
        return jnp.eye(self.num_classes)[images]


def test_apply_color_map_roundtrip(rng):
    seg = rng.integers(0, 19, size=(10, 12))
    colored = apply_color_map(seg)
    assert colored.shape == (10, 12, 3)
    np.testing.assert_array_equal(colored[0, 0], TRAIN_ID_TO_COLOR[seg[0, 0]])
    # out-of-range ids render black
    assert np.all(apply_color_map(np.full((2, 2), 255)) == 0)


def test_rescale_for_display(rng):
    x = rng.normal(size=(4, 4)).astype(np.float32) * 10
    y = rescale_for_display(x)
    assert y.min() == 0.0 and y.max() == 1.0
    assert np.all(rescale_for_display(np.zeros((2, 2))) == 0)


def test_visualize_batches_saves(tmp_path, rng):
    inputs = [rng.normal(size=(2, 8, 8, 3)).astype(np.float32)]
    targets = [rng.integers(0, 19, size=(2, 8, 8))]
    preds = [rng.integers(0, 19, size=(2, 8, 8))]
    path = str(tmp_path / "viz.png")
    visualize_batches(inputs, targets, preds, num_batches=1, save_path=path)
    saved = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert saved  # matplotlib grid or PIL fallback pngs


def test_val_and_val_gta5_wrappers(rng):
    state = _IdentityState(19)
    labels = rng.integers(0, 19, size=(2, 8, 8))
    batches = [(jnp.asarray(labels), jnp.asarray(labels))]
    miou = val(0, state, iter(batches), 19)
    assert miou > 0.99
    miou2, per_class = val_GTA5(0, state, iter(batches), 19, CLASS_NAMES)
    assert miou2 > 0.99
    assert len(per_class) == 19
    assert per_class[0][0] == "road"
