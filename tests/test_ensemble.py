"""Multi-scale + flip ensemble inference (eval/ensemble.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


class _Tiny(nn.Module):
    """Fully-convolutional toy with BiSeNet's apply signature."""

    classes: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.classes, (3, 3), padding="SAME")(x)


@pytest.fixture(scope="module")
def setup():
    model = _Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    return model, variables, x


def test_single_scale_no_flip_equals_plain_argmax(setup):
    from rtsds_tpu.eval.ensemble import make_ensemble_predict

    model, variables, x = setup
    predict = jax.jit(make_ensemble_predict(model.apply, (64, 96),
                                            scales=(1.0,), flip=False))
    plain = jnp.argmax(model.apply(variables, x), axis=-1)
    np.testing.assert_array_equal(predict(variables, x), plain)


def test_flip_average_matches_manual(setup):
    from rtsds_tpu.eval.ensemble import make_ensemble_predict

    model, variables, x = setup
    predict = jax.jit(make_ensemble_predict(model.apply, (64, 96),
                                            scales=(1.0,), flip=True,
                                            return_probs=True))
    p1 = jax.nn.softmax(model.apply(variables, x), axis=-1)
    p2 = jnp.flip(jax.nn.softmax(
        model.apply(variables, jnp.flip(x, axis=2)), axis=-1), axis=2)
    np.testing.assert_allclose(np.asarray(predict(variables, x)),
                               np.asarray((p1 + p2) / 2), rtol=2e-5,
                               atol=2e-6)


def test_multi_scale_shapes_and_probabilities(setup):
    from rtsds_tpu.eval.ensemble import make_ensemble_predict

    model, variables, x = setup
    predict = jax.jit(make_ensemble_predict(
        model.apply, (64, 96), scales=(0.5, 1.0, 1.5), flip=True,
        return_probs=True))
    probs = np.asarray(predict(variables, x))
    assert probs.shape == (2, 64, 96, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    masks = jax.jit(make_ensemble_predict(
        model.apply, (64, 96), scales=(0.5, 1.0, 1.5)))(variables, x)
    assert masks.shape == (2, 64, 96) and masks.dtype == jnp.int32


def test_scale_snapping_dedupes():
    from rtsds_tpu.eval.ensemble import _snap

    assert _snap(64 * 1.01) == 64  # snaps to multiple of 32
    assert _snap(10) == 32         # floor at one tile


def test_ensemble_eval_step_accumulates_hist(setup):
    from rtsds_tpu.eval.ensemble import make_ensemble_eval_step

    model, variables, x = setup
    labels = jnp.asarray(np.random.default_rng(1).integers(
        0, 7, size=(2, 64, 96)), jnp.int32)
    step = jax.jit(make_ensemble_eval_step(model.apply, (64, 96), 7,
                                           scales=(1.0,), flip=True))
    hist = step(variables, x, labels, jnp.zeros((7, 7), jnp.int32))
    assert int(hist.sum()) == 2 * 64 * 96


def test_ensemble_step_plugs_into_validate(setup):
    """The ensemble eval step drops into the standard validate() loop."""
    from rtsds_tpu.eval.ensemble import make_ensemble_eval_step
    from rtsds_tpu.eval.validate import validate

    model, variables, x = setup
    labels = jnp.asarray(np.random.default_rng(2).integers(
        0, 7, size=(2, 64, 96)), jnp.int32)
    step = make_ensemble_eval_step(model.apply, (64, 96), 7,
                                   scales=(1.0,), flip=True)
    miou, per_class = validate(variables, iter([(x, labels)]), 7,
                               class_names=[f"c{i}" for i in range(7)],
                               detailed_report=True, eval_step=step)
    assert 0.0 <= miou <= 1.0
    assert len(per_class) == 7


@pytest.mark.slow
def test_ensemble_on_real_bisenet():
    from rtsds_tpu.eval.ensemble import make_ensemble_predict
    from rtsds_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_classes=19, context_path="resnet18")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    predict = jax.jit(make_ensemble_predict(
        lambda v, im, train: model.apply(v, im, train=train),
        (64, 128), scales=(0.5, 1.0), flip=True))
    masks = predict(variables, x)
    assert masks.shape == (1, 64, 128)
    assert int(masks.max()) < 19
