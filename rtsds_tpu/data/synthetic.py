"""Synthetic segmentation data for tests / smoke runs / benchmarks.

Deterministic procedurally-generated (image, label) pairs with loose
structure (blocks of constant class with matching color tint) so short
training runs can actually reduce loss.  Shares the SegmentationDataset
interface, so the real DataLoader/prefetch path is exercised end to end.

Two tint regimes:
  * default (``fixed_tints=False``): each image draws its OWN class ->
    color mapping — good for exercising pipelines, but the mapping is
    not learnable ACROSS images, so trained models plateau near chance.
  * ``fixed_tints=True``: one mapping shared by every dataset with the
    same ``num_classes`` (independent of ``seed``, so train and val
    splits agree) — short runs reach high mIoU, which is what
    accuracy-delta gates (e.g. int8-vs-bf16 on a trained model) need:
    a genuinely peaked, learned distribution instead of noise.
"""

from __future__ import annotations

import numpy as np


class SyntheticSegDataset:
    def __init__(self, length: int = 16, image_size: tuple[int, int] = (64, 128),
                 num_classes: int = 19, seed: int = 0,
                 fixed_tints: bool = False):
        self.length = length
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.seed = seed
        # shared across seeds/splits so the mapping is learnable
        self.tints = (np.random.default_rng(123456789 + num_classes)
                      .integers(40, 215, size=(num_classes, 3))
                      if fixed_tints else None)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + int(idx))
        h, w = self.image_size
        # coarse class blocks
        gh, gw = max(h // 8, 1), max(w // 8, 1)
        coarse = rng.integers(0, self.num_classes, size=(h // gh + 1, w // gw + 1))
        label = np.kron(coarse, np.ones((gh, gw), dtype=np.int64))[:h, :w]
        # image = class-dependent tint + noise
        tints = (rng.integers(40, 215, size=(self.num_classes, 3))
                 if self.tints is None else self.tints)
        image = tints[label] + rng.normal(0, 12, size=(h, w, 3))
        image = np.clip(image, 0, 255).astype(np.uint8)
        return image, label.astype(np.int32)
