"""Predictor serving path: shapes, padding/micro-batching, colorization."""

import numpy as np

from rtsds_tpu.serve import Predictor


def test_predictor_shapes_and_padding(rng):
    p = Predictor(image_size=(32, 64), batch_size=2).warmup()
    frames = rng.integers(0, 255, size=(3, 32, 64, 3)).astype(np.uint8)
    masks = p.predict(frames)  # 3 > batch 2: chunked
    assert masks.shape == (3, 32, 64)
    assert masks.dtype == np.int32
    assert masks.min() >= 0 and masks.max() < 19

    single = p.predict(frames[0])
    assert single.shape == (32, 64)
    np.testing.assert_array_equal(single, masks[0])


def test_predictor_colored(rng):
    p = Predictor(image_size=(16, 32), batch_size=1)
    frame = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
    colored = p.predict_colored(frame)
    assert colored.shape == (16, 32, 3)
    assert colored.dtype == np.uint8
