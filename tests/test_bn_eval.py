"""model.deeplab.bn_eval (ours, opt-in): fully-frozen BatchNorm during
training -- normalize with running stats, never update them.  The
reference keeps its frozen-affine BNs in batch-stats mode while training
(deeplabv2.py:14-27, reproduced by the default bn_eval=False); this knob
offers the common DeepLab-DA recipe and skips the per-step BN stat
reductions (TPU cost in PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.deeplabv2 import DeepLabV2

LAYERS = (1, 1, 1, 1)


def _init(model, x):
    return model.init(jax.random.key(0), x, train=False)


def test_bn_eval_freezes_running_stats():
    x = jax.random.normal(jax.random.key(1), (2, 32, 64, 3), jnp.float32)
    model = DeepLabV2(num_classes=5, layers=LAYERS, bn_eval=True)
    variables = _init(model, x)
    _, mut = model.apply(variables, x, train=True,
                         mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                    jax.tree_util.tree_leaves(mut["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_eval_train_logits_use_running_stats():
    """With bn_eval, a train-mode forward normalizes exactly like the
    eval-mode forward (same params/stats) -- BN is a pure affine."""
    x = jax.random.normal(jax.random.key(2), (2, 32, 64, 3), jnp.float32)
    model = DeepLabV2(num_classes=5, layers=LAYERS, bn_eval=True)
    variables = _init(model, x)
    train_logits, _ = model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    eval_logits = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(train_logits[0]),
                               np.asarray(eval_logits), rtol=1e-6,
                               atol=1e-6)

    # and the default (reference semantics) does NOT: batch-stats mode
    ref = DeepLabV2(num_classes=5, layers=LAYERS)
    rl, _ = ref.apply(variables, x, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(rl[0]), np.asarray(eval_logits),
                           atol=1e-3)


def test_bn_eval_config_reaches_factory():
    from rtsds_tpu.config import default_config
    from rtsds_tpu.train.factory import build_supervised

    cfg = default_config().replace(
        model={"deeplab": {"bn_eval": True}})
    bundle = build_supervised(cfg, "deeplab", steps_per_epoch=10)
    assert bundle.model.bn_eval is True
    bundle = build_supervised(default_config(), "deeplab",
                              steps_per_epoch=10)
    assert bundle.model.bn_eval is False
