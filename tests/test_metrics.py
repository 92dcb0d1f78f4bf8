"""Metric math vs an independent numpy oracle (and the reference formulas,
utils.py:52-63)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.utils.metrics import fast_hist, mean_iou, per_class_iou, pixel_accuracy


def numpy_hist(a, b, n):
    k = (a >= 0) & (a < n)
    return np.bincount(n * a[k].astype(int) + b[k], minlength=n ** 2).reshape(n, n)


def test_fast_hist_matches_numpy(rng):
    n = 19
    labels = rng.integers(0, 25, size=(4, 32, 64))  # includes out-of-range ids
    preds = rng.integers(0, n, size=(4, 32, 64))
    ours = np.asarray(fast_hist(labels, preds, n))
    ref = numpy_hist(labels.reshape(-1), preds.reshape(-1), n)
    np.testing.assert_array_equal(ours, ref)


def test_fast_hist_under_jit(rng):
    n = 19
    labels = jnp.asarray(rng.integers(0, 25, size=(2, 16, 16)))
    preds = jnp.asarray(rng.integers(0, n, size=(2, 16, 16)))
    jitted = jax.jit(lambda a, b: fast_hist(a, b, n))
    np.testing.assert_array_equal(np.asarray(jitted(labels, preds)),
                                  np.asarray(fast_hist(labels, preds, n)))


def test_per_class_iou_formula(rng):
    n = 19
    hist = rng.integers(0, 100, size=(n, n)).astype(np.float64)
    ours = np.asarray(per_class_iou(hist))
    diag = np.diag(hist)
    ref = diag / (hist.sum(1) + hist.sum(0) - diag + 1e-5)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_perfect_prediction_gives_miou_one(rng):
    n = 19
    labels = rng.integers(0, n, size=(1000,))
    hist = fast_hist(labels, labels, n)
    assert float(mean_iou(hist)) > 0.999
    assert float(pixel_accuracy(hist)) == 1.0


def test_ignored_labels_not_counted():
    n = 19
    labels = np.full((100,), 19)  # all void (clamped ignore id)
    preds = np.zeros((100,), dtype=np.int64)
    hist = fast_hist(labels, preds, n)
    assert int(np.asarray(hist).sum()) == 0
