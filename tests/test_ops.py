"""Image op parity: resize vs torch interpolate, blur kernel shape, label
remap round-trip over the 35-entry map (gta5.py:10-46)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.ops.blur import gaussian_blur
from rtsds_tpu.ops.remap import rgb_to_train_ids
from rtsds_tpu.ops.resize import clamp_labels, resize_bilinear, resize_labels_nearest, upsample_bilinear
from rtsds_tpu.utils.colors import CITYSCAPES_LABEL_MAP, class_colors_for_remap


def test_bilinear_upsample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 8, 16, 5)).astype(np.float32)
    ours = np.asarray(upsample_bilinear(jnp.asarray(x), 8))
    t = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(t, scale_factor=8, mode="bilinear")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_resize_to_size_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(1, 12, 20, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (30, 44)))
    t = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(t, size=(30, 44), mode="bilinear")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_label_nearest_resize_preserves_ids(rng):
    labels = rng.integers(0, 20, size=(2, 64, 128))
    out = np.asarray(resize_labels_nearest(jnp.asarray(labels), (32, 64)))
    assert out.shape == (2, 32, 64)
    assert set(np.unique(out)) <= set(np.unique(labels))


def test_clamp_labels():
    labels = np.array([[-3, 0, 5, 19, 255]])
    out = np.asarray(clamp_labels(labels, 0, 19))
    np.testing.assert_array_equal(out, [[0, 0, 5, 19, 19]])


def test_gaussian_blur_preserves_mean_and_shape(rng):
    x = rng.uniform(0, 255, size=(1, 33, 47, 3)).astype(np.float32)
    out = np.asarray(gaussian_blur(jnp.asarray(x), (5, 9), 2.0))
    assert out.shape == x.shape
    np.testing.assert_allclose(out.mean(), x.mean(), rtol=0.02)
    assert out.var() < x.var()  # smoothing reduces variance


def test_gaussian_blur_matches_torch(rng):
    torchvision = pytest.importorskip("torchvision")
    torch = pytest.importorskip("torch")
    x = rng.uniform(0, 255, size=(1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), (5, 9), 1.7))
    t = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torchvision.transforms.functional.gaussian_blur(t, [5, 9], [1.7])
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-2)


def test_rgb_remap_round_trip(rng):
    colors = class_colors_for_remap()
    ids = rng.integers(0, 19, size=(40, 60))
    rgb = colors[ids]
    out = np.asarray(rgb_to_train_ids(jnp.asarray(rgb)))
    np.testing.assert_array_equal(out, ids)


def test_rgb_remap_void_handling():
    void_rgb = np.array(CITYSCAPES_LABEL_MAP["ground"][1], dtype=np.uint8)
    img = np.broadcast_to(void_rgb, (4, 4, 3))
    assert np.all(np.asarray(rgb_to_train_ids(jnp.asarray(img))) == 255)
    assert np.all(np.asarray(
        rgb_to_train_ids(jnp.asarray(img), reference_compat=True)) == 0)


def test_rgb_remap_all_35_entries():
    entries = list(CITYSCAPES_LABEL_MAP.values())
    rgb = np.array([e[1] for e in entries], dtype=np.uint8).reshape(1, -1, 3)
    out = np.asarray(rgb_to_train_ids(jnp.asarray(rgb)))[0]
    for i, (train_id, rgb_key) in enumerate(entries):
        if 0 <= train_id < 19:
            assert out[i] == train_id, entries[i]
        else:
            # void colors map to 255 unless the color is shared with a real
            # class (e.g. 'license plate' shares (0,0,142) with 'car',
            # 'polegroup' shares (153,153,153) with 'pole')
            shared = any(0 <= t < 19 and c == rgb_key
                         for t, c in CITYSCAPES_LABEL_MAP.values())
            assert (out[i] == 255) or shared


def test_remap_jits(rng):
    rgb = jnp.asarray(rng.integers(0, 256, size=(2, 8, 8, 3)), dtype=jnp.uint8)
    jitted = jax.jit(rgb_to_train_ids)
    out = jitted(rgb)
    assert out.shape == (2, 8, 8)
