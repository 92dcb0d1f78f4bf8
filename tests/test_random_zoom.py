"""RandomZoom augmentation: geometry-consistent zoom-in for image+label
(`augmentation.RandomZoom`)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.config import default_config
from rtsds_tpu.ops.augment import AugmentConfig, make_augment_fn


def _blocky_batch(rng, n=2, h=32, w=48, cells=4):
    """Label = a coarse block id map; image channel 0 carries the label
    value exactly (piecewise-constant, so interior pixels survive
    bilinear resampling unchanged)."""
    coarse = rng.integers(0, 19, size=(n, cells, cells))
    lbl = np.kron(coarse, np.ones((1, h // cells, w // cells))).astype(
        np.int32)
    img = np.repeat(lbl[..., None].astype(np.float32), 3, axis=-1)
    return jnp.asarray(img), jnp.asarray(lbl)


def _zoom_cfg(zoom_max=1.8, zoom_p=1.0, apply_p=1.0):
    return AugmentConfig(apply_p=apply_p, blur_kernel=None, flip_p=None,
                         zoom_max=zoom_max, zoom_p=zoom_p)


def test_zoom_changes_and_stays_in_label_alphabet(rng):
    img, lbl = _blocky_batch(rng)
    aug = make_augment_fn(_zoom_cfg())
    img2, lbl2 = aug(jax.random.key(3), img, lbl)
    assert img2.shape == img.shape and lbl2.shape == lbl.shape
    assert not np.array_equal(np.asarray(lbl2), np.asarray(lbl))
    # nearest resampling invents no new label values
    assert set(np.unique(np.asarray(lbl2))) <= set(np.unique(np.asarray(lbl)))


def test_zoom_keeps_pixel_correspondence(rng):
    """Image channel 0 equals the label everywhere before the zoom; after
    the SAME geometric transform they must still agree away from block
    boundaries (bilinear vs nearest differ only in boundary blending)."""
    img, lbl = _blocky_batch(rng)
    aug = make_augment_fn(_zoom_cfg())
    img2, lbl2 = aug(jax.random.key(5), img, lbl)
    l2 = np.asarray(lbl2)
    # interior = zoomed-label 4-neighborhood constant (bilinear blends
    # only inside the boundary bands)
    interior = np.ones_like(l2, bool)
    for axis in (1, 2):
        for shift in (1, -1):
            interior &= l2 == np.roll(l2, shift, axis)
    assert interior.mean() > 0.5  # the test must actually cover pixels
    agree = (np.round(np.asarray(img2[..., 0]))[interior]
             == l2[interior]).mean()
    assert agree > 0.995, agree


def test_zoom_gates_off(rng):
    img, lbl = _blocky_batch(rng)
    # zoom_p=0: never fires even though enabled
    aug = make_augment_fn(_zoom_cfg(zoom_p=0.0))
    img2, lbl2 = aug(jax.random.key(0), img, lbl)
    np.testing.assert_array_equal(np.asarray(lbl2), np.asarray(lbl))
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img))
    # global RandomApply gate off: label untouched too
    aug = make_augment_fn(_zoom_cfg(apply_p=0.0))
    img2, lbl2 = aug(jax.random.key(0), img, lbl)
    np.testing.assert_array_equal(np.asarray(lbl2), np.asarray(lbl))


def test_zoom_is_per_sample(rng):
    """Each batch element draws its own (s, ty, tx) window — identical
    input images must come out with DIFFERENT zoom geometry (the
    RandomResizedCrop semantics, not one shared window per batch)."""
    img1, lbl1 = _blocky_batch(rng, n=1, h=32, w=48)
    img = jnp.concatenate([img1] * 4)
    lbl = jnp.concatenate([lbl1] * 4)
    aug = make_augment_fn(_zoom_cfg(zoom_max=2.0))
    img2, lbl2 = aug(jax.random.key(11), img, lbl)
    l2 = np.asarray(lbl2)
    pairwise_distinct = sum(
        not np.array_equal(l2[i], l2[j])
        for i in range(4) for j in range(i + 1, 4))
    assert pairwise_distinct >= 3, pairwise_distinct


def test_zoom_from_config():
    cfg = default_config().replace(augmentation={
        "p": 1.0, "RandomZoom": {"max": 1.7, "p": 0.9}})
    ac = AugmentConfig.from_config(cfg)
    assert ac.zoom_max == 1.7 and ac.zoom_p == 0.9
    # absent -> disabled
    assert AugmentConfig.from_config(default_config()).zoom_max is None


def test_zoom_composes_with_flip_and_blur(rng):
    img, lbl = _blocky_batch(rng)
    cfg = AugmentConfig(apply_p=1.0, blur_kernel=(3, 5), flip_p=1.0,
                        zoom_max=1.5, zoom_p=1.0)
    img2, lbl2 = make_augment_fn(cfg)(jax.random.key(7), img, lbl)
    assert img2.shape == img.shape and lbl2.shape == lbl.shape
    assert np.all(np.isfinite(np.asarray(img2)))
