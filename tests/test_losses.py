"""Loss parity vs torch criteria (the reference uses CrossEntropyLoss with
ignore_index and BCEWithLogitsLoss, main.py:124-134)."""

import numpy as np
import pytest

from rtsds_tpu.ops.losses import bce_with_logits, cross_entropy, segmentation_loss

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(2, 8, 8, 19)).astype(np.float32)
    labels = rng.integers(0, 20, size=(2, 8, 8))  # includes ignore id 19
    ours = float(cross_entropy(logits, labels, ignore_index=19))
    t_logits = torch.tensor(logits).permute(0, 3, 1, 2)  # NCHW for torch
    t_labels = torch.tensor(labels, dtype=torch.long)
    ref = torch.nn.CrossEntropyLoss(ignore_index=19)(t_logits, t_labels)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_cross_entropy_no_ignore(rng):
    logits = rng.normal(size=(4, 19)).astype(np.float32)
    labels = rng.integers(0, 19, size=(4,))
    ours = float(cross_entropy(logits, labels))
    ref = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                      torch.tensor(labels, dtype=torch.long))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(4, 1, 1, 1)).astype(np.float32) * 3
    for target in (0.0, 1.0):
        ours = float(bce_with_logits(logits, target))
        ref = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                           torch.full((4, 1, 1, 1), target))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_segmentation_loss_sums_aux_heads(rng):
    logits = rng.normal(size=(1, 4, 4, 19)).astype(np.float32)
    labels = rng.integers(0, 19, size=(1, 4, 4))
    single = float(segmentation_loss(logits, labels))
    triple = float(segmentation_loss((logits, logits, logits), labels))
    np.testing.assert_allclose(triple, 3 * single, rtol=1e-5)
    with_none = float(segmentation_loss((logits, None, None), labels))
    np.testing.assert_allclose(with_none, single, rtol=1e-6)
