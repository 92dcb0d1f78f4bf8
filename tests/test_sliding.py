"""Sliding-window inference (eval/sliding.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


class _Tiny(nn.Module):
    classes: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.classes, (1, 1))(x)  # 1x1: window-invariant


@pytest.fixture(scope="module")
def setup():
    model = _Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 48, 80, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    return model, variables, x


def test_positions_cover_and_clamp():
    from rtsds_tpu.eval.sliding import _positions

    assert _positions(100, 100, 75) == [0]
    assert _positions(100, 120, 75) == [0]  # window larger than image
    pos = _positions(100, 40, 30)
    assert pos == [0, 30, 60]  # 60+40 == 100: flush, no extra
    pos = _positions(110, 40, 30)
    assert pos[-1] == 70 and pos[-1] + 40 == 110  # clamped final window
    # every pixel covered
    covered = np.zeros(110, bool)
    for p in pos:
        covered[p:p + 40] = True
    assert covered.all()


def test_stride_larger_than_window_rejected(setup):
    from rtsds_tpu.eval.sliding import make_sliding_predict

    model, variables, x = setup
    with pytest.raises(ValueError, match="stride"):
        make_sliding_predict(model.apply, (48, 80), window=(32, 48),
                             stride=(40, 48))


def test_whole_image_window_equals_plain(setup):
    from rtsds_tpu.eval.sliding import make_sliding_predict

    model, variables, x = setup
    predict = jax.jit(make_sliding_predict(model.apply, (48, 80),
                                           window=(48, 80)))
    plain = jnp.argmax(model.apply(variables, x), axis=-1)
    np.testing.assert_array_equal(predict(variables, x), plain)


def test_overlapping_windows_match_pointwise_model(setup):
    """With a 1x1-conv model, sliding windows must reproduce the full
    image prediction exactly regardless of tiling (probabilities at every
    pixel identical in every covering window)."""
    from rtsds_tpu.eval.sliding import make_sliding_predict

    model, variables, x = setup
    predict = jax.jit(make_sliding_predict(model.apply, (48, 80),
                                           window=(32, 48)))
    plain = jnp.argmax(model.apply(variables, x), axis=-1)
    np.testing.assert_array_equal(predict(variables, x), plain)

    probs = jax.jit(make_sliding_predict(model.apply, (48, 80),
                                         window=(32, 48),
                                         return_probs=True))(variables, x)
    assert probs.shape == (2, 48, 80, 6)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_window_chunk_schedules_agree(setup):
    """The batched-window forward (default), a 2-window chunking, and the
    sequential per-window schedule (chunk=1) are the same computation --
    identical probabilities regardless of how tiles are grouped into
    forwards."""
    from rtsds_tpu.eval.sliding import make_sliding_predict

    model, variables, x = setup
    probs = {}
    for chunk in (None, 2, 1):
        fn = jax.jit(make_sliding_predict(model.apply, (48, 80),
                                          window=(32, 48), stride=(16, 32),
                                          return_probs=True,
                                          window_chunk=chunk))
        probs[chunk] = np.asarray(fn(variables, x))
    np.testing.assert_allclose(probs[None], probs[1], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(probs[None], probs[2], rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="window_chunk"):
        make_sliding_predict(model.apply, (48, 80), window=(32, 48),
                             window_chunk=0)


@pytest.mark.slow
def test_sliding_on_real_bisenet():
    from rtsds_tpu.eval.sliding import make_sliding_predict
    from rtsds_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_classes=19, context_path="resnet18")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 96, 160, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    predict = jax.jit(make_sliding_predict(
        lambda v, im, train: model.apply(v, im, train=train),
        (96, 160), window=(64, 96)))
    masks = predict(variables, x)
    assert masks.shape == (1, 96, 160)
    assert int(masks.max()) < 19
