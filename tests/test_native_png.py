"""Native (libpng, C++ thread pool) batch PNG decode: exactness vs the
PIL-based per-item path, fallback behavior, and loader integration."""

import numpy as np
import pytest
from PIL import Image

from rtsds_tpu.data import native
from rtsds_tpu.data.pipeline import DataLoader, SegmentationDataset, decode_image, decode_label
from rtsds_tpu.data.indexing import Sample


def _write_pngs(tmp_path, n=4, hw=(40, 56), seed=0):
    rng = np.random.default_rng(seed)
    img_paths, lbl_paths = [], []
    for i in range(n):
        img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
        lbl = rng.integers(0, 20, size=hw).astype(np.uint8)
        ip = tmp_path / f"img_{i}.png"
        lp = tmp_path / f"lbl_{i}.png"
        Image.fromarray(img).save(ip)
        Image.fromarray(lbl, mode="L").save(lp)
        img_paths.append(str(ip))
        lbl_paths.append(str(lp))
    return img_paths, lbl_paths


pytestmark = pytest.mark.skipif(not native.png_available(),
                                reason="native PNG decode unavailable")


def test_batch_image_decode_matches_per_item(tmp_path):
    img_paths, _ = _write_pngs(tmp_path)
    size = (24, 32)  # force the AA resize path
    batch = native.decode_image_batch(img_paths, size)
    assert batch is not None and batch.shape == (4, 24, 32, 3)
    for i, p in enumerate(img_paths):
        np.testing.assert_array_equal(batch[i], decode_image(p, size))


def test_batch_image_decode_native_size(tmp_path):
    img_paths, _ = _write_pngs(tmp_path, hw=(24, 32))
    batch = native.decode_image_batch(img_paths, (24, 32))
    for i, p in enumerate(img_paths):
        np.testing.assert_array_equal(
            batch[i], np.asarray(Image.open(p).convert("RGB")))


def test_batch_label_decode_matches_per_item(tmp_path):
    _, lbl_paths = _write_pngs(tmp_path)
    size = (20, 28)
    batch = native.decode_label_batch(lbl_paths, size)
    assert batch is not None and batch.dtype == np.int32
    for i, p in enumerate(lbl_paths):
        np.testing.assert_array_equal(batch[i], decode_label(p, size))


def test_batch_rgb_label_remap(tmp_path):
    from rtsds_tpu.utils.colors import class_colors_for_remap

    table = class_colors_for_remap()
    rng = np.random.default_rng(3)
    paths = []
    want = []
    for i in range(3):
        ids = rng.integers(0, len(table), size=(16, 20))
        rgb = table[ids].astype(np.uint8)
        p = tmp_path / f"rgb_{i}.png"
        Image.fromarray(rgb).save(p)
        paths.append(str(p))
        want.append(ids)
    out = native.decode_label_batch(paths, (16, 20), rgb=True)
    assert out is not None
    for i in range(3):
        np.testing.assert_array_equal(out[i], want[i])


def test_missing_file_returns_none_and_loader_falls_back(tmp_path):
    img_paths, lbl_paths = _write_pngs(tmp_path)
    assert native.decode_image_batch(
        img_paths + [str(tmp_path / "nope.png")], (24, 32)) is None

    # rgb-coded label fed to the grayscale path -> native refuses (it will
    # not luminance-convert ids) and the loader falls back to PIL per-item
    rgbl = tmp_path / "rgbl.png"
    Image.fromarray(np.zeros((40, 56, 3), np.uint8)).save(rgbl)
    assert native.decode_label_batch([str(rgbl)], (24, 32)) is None

    samples = [Sample(image=i, label=l)
               for i, l in zip(img_paths, lbl_paths)]
    ds = SegmentationDataset(samples, (24, 32))
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (2, 24, 32, 3)
    assert labels.shape == (2, 24, 32)
    # and batch content equals the per-item path
    np.testing.assert_array_equal(images[0], decode_image(img_paths[0],
                                                          (24, 32)))


def test_16bit_and_palette_images_decode(tmp_path):
    rng = np.random.default_rng(5)
    # palette PNG
    img = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    pal = tmp_path / "pal.png"
    Image.fromarray(img).convert("P", palette=Image.ADAPTIVE).save(pal)
    # grayscale image used AS IMAGE (gray -> rgb expand)
    gray = tmp_path / "gray.png"
    Image.fromarray(rng.integers(0, 256, size=(20, 24), dtype=np.uint8),
                    mode="L").save(gray)
    out = native.decode_image_batch([str(pal), str(gray)], (20, 24))
    assert out is not None
    np.testing.assert_array_equal(
        out[0], np.asarray(Image.open(pal).convert("RGB")))
    np.testing.assert_array_equal(
        out[1], np.asarray(Image.open(gray).convert("RGB")))
