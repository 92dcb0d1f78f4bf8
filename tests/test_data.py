"""Data layer: pairing rules (cityscapes.py:37-56, gta5.py:91-105), decode
+ loader + prefetch, device iterator through the fused transform."""

import os

import numpy as np
import pytest
from PIL import Image

from rtsds_tpu.data.indexing import build_cityscapes_index, build_gta5_index
from rtsds_tpu.data.pipeline import DataLoader, SegmentationDataset, decode_image, decode_label
from rtsds_tpu.data.synthetic import SyntheticSegDataset


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def cityscapes_tree(tmp_path, rng):
    """Mimic the gtFine layout: city subdirs, *_leftImg8bit.png images,
    *_gtFine_labelTrainIds.png + *_gtFine_color.png labels."""
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "gtFine" / "train"
    for city, seq in [("aachen", "000000"), ("aachen", "000001"),
                      ("bochum", "000042")]:
        sid = f"{city}_{seq}_000019"
        img = rng.integers(0, 255, size=(32, 64, 3)).astype(np.uint8)
        lbl = rng.integers(0, 19, size=(32, 64)).astype(np.uint8)
        _png(str(img_dir / city / f"{sid}_leftImg8bit.png"), img)
        _png(str(lbl_dir / city / f"{sid}_gtFine_labelTrainIds.png"), lbl)
        _png(str(lbl_dir / city / f"{sid}_gtFine_color.png"),
             np.zeros((32, 64, 3), np.uint8))
    return str(lbl_dir), str(img_dir)


def test_cityscapes_pairing(cityscapes_tree):
    lbl_dir, img_dir = cityscapes_tree
    samples = build_cityscapes_index(lbl_dir, img_dir)
    assert len(samples) == 3
    for s in samples:
        # trainId label (not the color one) is the training target
        assert "labelTrainIds" in s.label
        assert s.color_label.endswith("color.png")
        # paired by the same city_seq_frame id
        sid = "_".join(os.path.basename(s.image).split("_")[:3])
        assert sid in s.label


def test_gta5_pairing(tmp_path, rng):
    img_dir, lbl_dir = tmp_path / "images", tmp_path / "labels"
    for i in range(4):
        _png(str(img_dir / f"{i:05d}.png"),
             rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8))
        _png(str(lbl_dir / f"{i:05d}.png"),
             rng.integers(0, 19, size=(24, 32)).astype(np.uint8))
    # an unpaired image must be dropped
    _png(str(img_dir / "orphan.png"), np.zeros((24, 32, 3), np.uint8))
    samples = build_gta5_index(str(img_dir), str(lbl_dir))
    assert len(samples) == 4
    assert all(os.path.basename(s.image) == os.path.basename(s.label)
               for s in samples)


def test_decode_and_resize(tmp_path, rng):
    img = rng.integers(0, 255, size=(40, 60, 3)).astype(np.uint8)
    lbl = rng.integers(0, 19, size=(40, 60)).astype(np.uint8)
    _png(str(tmp_path / "img.png"), img)
    _png(str(tmp_path / "lbl.png"), lbl)
    out = decode_image(str(tmp_path / "img.png"), size=(20, 30))
    assert out.shape == (20, 30, 3) and out.dtype == np.uint8
    lab = decode_label(str(tmp_path / "lbl.png"), size=(20, 30))
    assert lab.shape == (20, 30) and lab.dtype == np.int32
    assert set(np.unique(lab)) <= set(np.unique(lbl))  # nearest preserves ids


def test_dataset_and_loader(cityscapes_tree):
    lbl_dir, img_dir = cityscapes_tree
    ds = SegmentationDataset(build_cityscapes_index(lbl_dir, img_dir),
                             image_size=(16, 32))
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                        drop_last=True)
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1
    images, labels = batches[0]
    assert images.shape == (2, 16, 32, 3)
    assert labels.shape == (2, 16, 32)


def test_infinite_loader_resamples():
    ds = SyntheticSegDataset(4, (8, 8), seed=0)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                        infinite=True)
    it = iter(loader)
    got = [next(it) for _ in range(5)]  # > one epoch's worth (2 batches)
    assert len(got) == 5


def test_device_iterator_through_transform():
    import jax

    from rtsds_tpu.data.pipeline import device_iterator
    from rtsds_tpu.ops.preprocess import make_transform

    ds = SyntheticSegDataset(4, (16, 32), seed=0)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    transform = jax.jit(make_transform((8, 16), num_classes=19))
    batches = list(device_iterator(loader, transform))
    images, labels = batches[0]
    assert images.shape == (2, 8, 16, 3)
    assert images.dtype == np.float32 or str(images.dtype) == "float32"
    assert labels.shape == (2, 8, 16)
    assert int(np.asarray(labels).max()) <= 19
