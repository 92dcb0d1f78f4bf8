"""Native C++ host ops vs Python references (build + ctypes + fallbacks)."""

import numpy as np
import pytest

from rtsds_tpu.data import native
from rtsds_tpu.utils.colors import class_colors_for_remap


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_builds(lib):
    assert native.available()


def test_resize_nearest_matches_numpy(lib, rng):
    labels = rng.integers(0, 20, size=(37, 53)).astype(np.int32)
    out = native.resize_nearest(labels, (16, 24))
    h, w = labels.shape
    rows = np.minimum((np.arange(16) * h / 16).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(24) * w / 24).astype(np.int64), w - 1)
    np.testing.assert_array_equal(out, labels[rows][:, cols])


def test_resize_bilinear_aa_close_to_pil(lib, rng):
    from PIL import Image

    img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    ours = native.resize_bilinear_aa(img, (32, 48))
    ref = np.asarray(Image.fromarray(img).resize((48, 32), Image.BILINEAR))
    assert ours.shape == ref.shape
    # same filter family; implementations may differ by a rounding step
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 1.0
    assert np.percentile(diff, 99) <= 2


def test_native_remap_matches_jax(lib, rng):
    import jax.numpy as jnp

    from rtsds_tpu.ops.remap import rgb_to_train_ids as jax_remap

    colors = class_colors_for_remap()
    ids = rng.integers(0, 19, size=(40, 60))
    rgb = colors[ids].astype(np.uint8)
    # sprinkle unknown colors
    rgb[0, 0] = [1, 2, 3]
    ours = native.rgb_to_train_ids(rgb)
    ref = np.asarray(jax_remap(jnp.asarray(rgb)))
    np.testing.assert_array_equal(ours, ref)


def test_remap_lut_rebuild_on_table_change(lib):
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[:] = [10, 20, 30]
    t1 = np.array([[10, 20, 30]], np.uint8)
    t2 = np.array([[99, 99, 99]], np.uint8)
    out1 = native.rgb_to_train_ids(rgb, t1, default_id=255)
    assert np.all(out1 == 0)
    out2 = native.rgb_to_train_ids(rgb, t2, default_id=255)
    assert np.all(out2 == 255)
