"""On-disk mini-dataset fixtures in the REAL reference layouts.

Cityscapes (``/root/reference/datasets/cityscapes.py:25-56``):
    images/{train,val}/<city>/<city>_<seq>_<frame>_leftImg8bit.png
    gtFine/{train,val}/<city>/<city>_<seq>_<frame>_gtFine_labelTrainIds.png
                              <city>_<seq>_<frame>_gtFine_color.png
pairing id = first 3 '_'-separated tokens of the filename; both the
trainId and the ``*color.png`` annotation exist per sample (training
consumes the trainId one).

GTA5 (``/root/reference/datasets/gta5.py:59-60,91-105``): flat *.png in
``images/`` and ``labels/`` paired by stem; labels are either
pre-converted trainId maps ("GTA5_Modified") or RGB color-coded
(the raw download, decoded via ``in_getting_decoder``, gta5.py:51,66-70).

Fixture label maps are piecewise-constant blocks (not iid noise) so a
couple of training epochs can actually reduce loss, and images carry a
deterministic per-class tint so labels are (weakly) predictable.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from rtsds_tpu.utils.colors import TRAIN_ID_TO_COLOR, class_colors_for_remap


def _block_label_map(rng, size, num_classes=19, void_frac=0.05,
                     void_id=255) -> np.ndarray:
    """(H, W) uint8 trainId map of random rectangular blocks + some void."""
    h, w = size
    lbl = np.full((h, w), rng.integers(0, num_classes), dtype=np.uint8)
    for _ in range(6):
        cls = int(rng.integers(0, num_classes))
        y0, x0 = int(rng.integers(0, h)), int(rng.integers(0, w))
        bh, bw = int(rng.integers(h // 8, h // 2)), int(rng.integers(w // 8, w // 2))
        lbl[y0:y0 + bh, x0:x0 + bw] = cls
    if void_frac > 0:
        mask = rng.random((h, w)) < void_frac
        lbl[mask] = void_id
    return lbl


def _image_for_label(rng, lbl: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 image: per-class tint + noise (weakly learnable)."""
    colors = TRAIN_ID_TO_COLOR  # (19, 3)
    img = np.zeros((*lbl.shape, 3), dtype=np.float32)
    valid = lbl < len(colors)
    img[valid] = colors[lbl[valid].astype(np.int64)]
    img += rng.normal(0, 25, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_cityscapes_tree(root: str, n_train: int = 6, n_val: int = 4,
                         disk_size: tuple[int, int] = (48, 96),
                         seed: int = 0) -> dict:
    """Write a real-layout Cityscapes mini-tree; returns the 4 config dirs."""
    rng = np.random.default_rng(seed)
    cities = {"train": ["aachen", "bochum"], "val": ["frankfurt"]}
    counts = {"train": n_train, "val": n_val}
    for split in ("train", "val"):
        for i in range(counts[split]):
            city = cities[split][i % len(cities[split])]
            stem = f"{city}_{i:06d}_{19:06d}"
            img_dir = os.path.join(root, "images", split, city)
            lbl_dir = os.path.join(root, "gtFine", split, city)
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(lbl_dir, exist_ok=True)
            lbl = _block_label_map(rng, disk_size)
            img = _image_for_label(rng, lbl)
            Image.fromarray(img).save(
                os.path.join(img_dir, stem + "_leftImg8bit.png"))
            Image.fromarray(lbl, mode="L").save(
                os.path.join(lbl_dir, stem + "_gtFine_labelTrainIds.png"))
            color = np.zeros((*lbl.shape, 3), dtype=np.uint8)
            valid = lbl < 19
            color[valid] = TRAIN_ID_TO_COLOR[lbl[valid].astype(np.int64)]
            Image.fromarray(color).save(
                os.path.join(lbl_dir, stem + "_gtFine_color.png"))
    return {
        "images_train_dir": os.path.join(root, "images", "train"),
        "images_val_dir": os.path.join(root, "images", "val"),
        "segmentation_train_dir": os.path.join(root, "gtFine", "train"),
        "segmentation_val_dir": os.path.join(root, "gtFine", "val"),
    }


def make_gta5_tree(root: str, n: int = 6,
                   disk_size: tuple[int, int] = (56, 104),
                   rgb_coded: bool = False, seed: int = 1) -> dict:
    """Write a flat GTA5 mini-tree; ``rgb_coded=True`` writes RGB-coded
    label PNGs (the raw-download format) instead of trainId maps."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    key = class_colors_for_remap()  # (19, 3) trainId -> RGB
    for i in range(n):
        stem = f"{i + 1:05d}"
        lbl = _block_label_map(rng, disk_size)
        img = _image_for_label(rng, lbl)
        Image.fromarray(img).save(os.path.join(img_dir, stem + ".png"))
        if rgb_coded:
            rgb = np.zeros((*lbl.shape, 3), dtype=np.uint8)  # void -> (0,0,0)
            valid = lbl < 19
            rgb[valid] = key[lbl[valid].astype(np.int64)]
            Image.fromarray(rgb).save(os.path.join(lbl_dir, stem + ".png"))
        else:
            Image.fromarray(lbl, mode="L").save(
                os.path.join(lbl_dir, stem + ".png"))
    return {
        "images_dir": img_dir,
        "segmentation_dir": lbl_dir,
    }
