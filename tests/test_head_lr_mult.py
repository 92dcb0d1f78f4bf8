"""Discriminative LR (``optimizer.head_lr_mult``): the reference defined
1x/10x param splits but never consumed them (``deeplabv2.py:171-173``
``optim_parameters``; ``build_bisenet.py:121-128`` ``mul_lr``) — here the
config key must actually scale the head updates."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rtsds_tpu.config import default_config
from rtsds_tpu.models.bisenet import head_lr_multiplier_mask
from rtsds_tpu.models.deeplabv2 import lr_multiplier_mask
from rtsds_tpu.train.factory import build_adversarial, build_supervised

LR = 0.01


def _one_sgd_update(tx, params):
    """SGD momentum=0: update == -lr * mult * grad; feed ones as grads."""
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    return updates


def _cfg_with(model_section, mult):
    return default_config().replace(model={
        model_section: {"optimizer": {"name": "SGD", "lr": LR,
                                      "momentum": 0.0,
                                      "head_lr_mult": mult}}})


def test_bisenet_head_lr_mult_scales_head_updates(key):
    cfg = _cfg_with("bisenet", 10.0)
    bundle = build_supervised(cfg, "bisenet", steps_per_epoch=10)
    state = bundle.init_state(key, jnp.zeros((1, 32, 64, 3)))
    updates = _one_sgd_update(bundle.tx, state.params)

    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, u in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        expected = -LR * (1.0 if keys[0] == "context_path" else 10.0)
        np.testing.assert_allclose(np.asarray(u).ravel()[0], expected,
                                   rtol=1e-6, err_msg=str(keys))


def test_deeplab_head_lr_mult_scales_aspp_only(key):
    cfg = _cfg_with("deeplab", 10.0)
    bundle = build_supervised(cfg, "deeplab", steps_per_epoch=10)
    state = bundle.init_state(key, jnp.zeros((1, 33, 33, 3)))
    updates = _one_sgd_update(bundle.tx, state.params)

    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    seen_head = seen_frozen = False
    for path, u in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        val = np.asarray(u).ravel()[0]
        if any(k == "layer6" for k in keys):
            np.testing.assert_allclose(val, -LR * 10.0, rtol=1e-6,
                                       err_msg=str(keys))
            seen_head = True
        elif any(k.startswith("bn") or k == "downsample_bn" for k in keys):
            # frozen BN stays frozen regardless of the multiplier
            np.testing.assert_allclose(val, 0.0, err_msg=str(keys))
            seen_frozen = True
        else:
            np.testing.assert_allclose(val, -LR, rtol=1e-6,
                                       err_msg=str(keys))
    assert seen_head and seen_frozen


def test_head_lr_mult_zero_or_one_is_uniform(key):
    for mult in (0.0, 1.0):
        cfg = _cfg_with("bisenet", mult)
        bundle = build_supervised(cfg, "bisenet", steps_per_epoch=10)
        state = bundle.init_state(key, jnp.zeros((1, 32, 64, 3)))
        updates = _one_sgd_update(bundle.tx, state.params)
        for u in jax.tree_util.tree_leaves(updates):
            np.testing.assert_allclose(np.asarray(u).ravel()[0], -LR,
                                       rtol=1e-6)


def test_da_generator_head_lr_mult(key):
    cfg = default_config().replace(model={"adversarial_model": {
        "generator": {"optimizer": {"name": "SGD", "lr": LR,
                                    "momentum": 0.0, "head_lr_mult": 4.0}}}})
    gen_bundle, _ = build_adversarial(cfg)
    state = gen_bundle.init_state(key, jnp.zeros((1, 32, 64, 3)))
    updates = _one_sgd_update(gen_bundle.tx, state.params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, u in flat:
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        expected = -LR * (1.0 if keys[0] == "context_path" else 4.0)
        np.testing.assert_allclose(np.asarray(u).ravel()[0], expected,
                                   rtol=1e-6, err_msg=str(keys))


def test_head_lr_mult_rejected_on_discriminator():
    cfg = default_config().replace(model={"adversarial_model": {
        "discriminator": {"optimizer": {"name": "SGD", "lr": LR,
                                        "head_lr_mult": 10.0}}}})
    with pytest.raises(ValueError, match="head_lr_mult"):
        build_adversarial(cfg)


def test_mask_functions_parameterized():
    params = {"context_path": {"w": jnp.ones((2,))},
              "ffm": {"w": jnp.ones((2,))}}
    m = head_lr_multiplier_mask(params, 7.0)
    assert m["context_path"]["w"] == 1.0 and m["ffm"]["w"] == 7.0
    params = {"layer1": {"w": jnp.ones((2,))}, "layer6": {"w": jnp.ones((2,))}}
    m = lr_multiplier_mask(params, 3.0)
    assert m["layer1"]["w"] == 1.0 and m["layer6"]["w"] == 3.0
