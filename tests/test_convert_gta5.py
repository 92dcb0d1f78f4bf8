"""Offline GTA5 pre-conversion tool (``python -m
rtsds_tpu.data.convert_gta5``): LUT correctness, converted tree ==
on-the-fly decode, idempotency, drop-in loading."""

import os

import numpy as np
import pytest

from realdata_fixtures import make_gta5_tree
from rtsds_tpu.data.convert_gta5 import build_lut, convert_tree, main
from rtsds_tpu.utils.colors import class_colors_for_remap

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_lut_roundtrips_all_class_colors():
    lut = build_lut()
    table = np.asarray(class_colors_for_remap(), dtype=np.uint32)
    packed = (table[:, 0] << 16) | (table[:, 1] << 8) | table[:, 2]
    np.testing.assert_array_equal(lut[packed], np.arange(len(table)))
    # an unmapped color -> 255
    assert lut[(1 << 16) | (2 << 8) | 3] == 255


def test_convert_tree_matches_trainid_fixture(tmp_path):
    """Converting the RGB-coded fixture must reproduce the directly
    written trainId fixture (same seed => same underlying label maps)."""
    raw = make_gta5_tree(str(tmp_path / "raw"), n=4, rgb_coded=True, seed=7)
    ref = make_gta5_tree(str(tmp_path / "ref"), n=4, rgb_coded=False, seed=7)
    stats = convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"),
                         workers=2, quiet=True)
    assert stats["converted"] == 4 and stats["linked"] == 4
    assert 0.0 < stats["void_fraction"] < 0.2  # fixture writes ~5% void

    for name in sorted(os.listdir(ref["segmentation_dir"])):
        got = np.asarray(Image.open(
            os.path.join(str(tmp_path / "mod"), "labels", name)))
        want = np.asarray(Image.open(
            os.path.join(ref["segmentation_dir"], name)))
        np.testing.assert_array_equal(got, want)
    # images hard-linked byte-identical
    for name in sorted(os.listdir(raw["images_dir"])):
        a = open(os.path.join(raw["images_dir"], name), "rb").read()
        b = open(os.path.join(str(tmp_path / "mod"), "images", name),
                 "rb").read()
        assert a == b


def test_convert_tree_idempotent_and_overwrite(tmp_path):
    make_gta5_tree(str(tmp_path / "raw"), n=3, rgb_coded=True, seed=3)
    s1 = convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"),
                      workers=2, quiet=True)
    s2 = convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"),
                      workers=2, quiet=True)
    assert (s1["converted"], s1["skipped"]) == (3, 0)
    assert (s2["converted"], s2["skipped"]) == (0, 3)
    s3 = convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"),
                      workers=2, overwrite=True, quiet=True)
    assert s3["converted"] == 3


def test_converted_tree_is_dropin_and_equals_onthefly(tmp_path):
    """The Modified tree loads through the DEFAULT dataset path and yields
    the same labels as decode_label_colors=True over the raw tree."""
    from rtsds_tpu.data.indexing import build_gta5_index
    from rtsds_tpu.data.pipeline import SegmentationDataset

    make_gta5_tree(str(tmp_path / "raw"), n=3, rgb_coded=True, seed=11)
    convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"), workers=2,
                 quiet=True)
    size = (56, 104)  # fixture disk size: no resize, exact comparison
    raw_idx = build_gta5_index(str(tmp_path / "raw" / "images"),
                               str(tmp_path / "raw" / "labels"))
    mod_idx = build_gta5_index(str(tmp_path / "mod" / "images"),
                               str(tmp_path / "mod" / "labels"))
    assert len(raw_idx) == len(mod_idx) == 3
    onthefly = SegmentationDataset(raw_idx, size, decode_label_colors=True)
    converted = SegmentationDataset(mod_idx, size)
    for i in range(3):
        img_a, lbl_a = onthefly[i]
        img_b, lbl_b = converted[i]
        np.testing.assert_array_equal(np.asarray(lbl_a), np.asarray(lbl_b))
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_cli_main(tmp_path, capsys):
    make_gta5_tree(str(tmp_path / "raw"), n=2, rgb_coded=True, seed=5)
    rc = main(["--src", str(tmp_path / "raw"), "--dst",
               str(tmp_path / "mod"), "--workers", "2"])
    assert rc == 0
    assert "2 labels converted" in capsys.readouterr().out
    assert main(["--src", str(tmp_path / "nope"), "--dst",
                 str(tmp_path / "x")]) == 2


def test_no_images_flag(tmp_path):
    make_gta5_tree(str(tmp_path / "raw"), n=2, rgb_coded=True, seed=5)
    stats = convert_tree(str(tmp_path / "raw"), str(tmp_path / "mod"),
                         workers=2, link_images=False, quiet=True)
    assert stats["linked"] == 0
    assert not os.path.exists(tmp_path / "mod" / "images")
