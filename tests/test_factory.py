"""Factory layer: config -> models/optimizers/criteria (main.py:110-231
parity), frozen-BN masking actually freezing DeepLab BN affine params."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.config import default_config
from rtsds_tpu.train.factory import build_adversarial, build_supervised
from rtsds_tpu.train.supervised import make_train_step


def test_build_supervised_bisenet(key):
    cfg = default_config()
    bundle = build_supervised(cfg, "bisenet", steps_per_epoch=10)
    state = bundle.init_state(key, jnp.zeros((1, 32, 64, 3)))
    assert state.batch_stats is not None
    assert bundle.hparams["init_lr"] == 0.0001
    out = state.apply_fn(state.variables, jnp.zeros((1, 32, 64, 3)),
                         train=False)
    assert out.shape == (1, 32, 64, 19)


def test_build_supervised_deeplab_frozen_bn(key, rng):
    cfg = default_config().replace(
        model={"deeplab": {"num_classes": 19}})
    bundle = build_supervised(cfg, "deeplab", steps_per_epoch=10)
    # thin model for speed: override layers via a fresh module
    from rtsds_tpu.models.deeplabv2 import DeepLabV2

    bundle.model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    state = bundle.init_state(key, jnp.zeros((1, 33, 65, 3)))

    step = make_train_step(ignore_index=19, donate=False)
    images = jnp.asarray(rng.normal(size=(1, 33, 65, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(1, 33, 65)))
    before = state.params
    state, _ = step(state, images, labels)
    after = state.params

    def flat(tree):
        return {
            "/".join(str(k.key) for k in path if hasattr(k, "key")): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}

    b, a = flat(before), flat(after)
    bn_frozen = conv_moved = False
    for name in b:
        changed = not np.allclose(np.asarray(b[name]), np.asarray(a[name]))
        if "bn" in name:
            assert not changed, f"frozen BN param {name} moved"
            bn_frozen = True
        elif changed:
            conv_moved = True
    assert bn_frozen and conv_moved


def test_build_adversarial(key):
    cfg = default_config()
    gen_bundle, dis_bundle = build_adversarial(cfg)
    gen_state = gen_bundle.init_state(key, jnp.zeros((1, 40, 72, 3)))
    dis_state = dis_bundle.init_state(key, jnp.zeros((1, 32, 64, 19)))
    assert gen_bundle.hparams["gen_power"] == 0.9
    assert dis_bundle.hparams["dis_power"] == 0.05
    out = dis_state.apply_fn(dis_state.variables, jnp.zeros((1, 32, 64, 19)))
    assert out.shape == (1, 1, 1, 1)


def test_fc_discriminator_selectable(key):
    cfg = default_config().replace(model={
        "adversarial_model": {"discriminator": {"name": "fc"}}})
    _, dis_bundle = build_adversarial(cfg)
    from rtsds_tpu.models.discriminator import DomainDiscriminator

    assert isinstance(dis_bundle.model, DomainDiscriminator)


def test_v2_discriminator_lr_decays_per_iteration():
    """v1 holds the D LR within an epoch (poly over epochs,
    train.py:167); v2 decays it every iteration like the generator
    (train.py:386-388).  Probed through the factory-built optimizer: for
    Adam with constant gradients the bias-corrected update magnitude is
    the scheduled LR (f64 so schedule shape dominates eps noise)."""
    import numpy as np

    def lr_trace(cfg, steps):
        _, dis_bundle = build_adversarial(cfg)
        params = {"w": jnp.zeros((1,), jnp.float64)}
        opt_state = dis_bundle.tx.init(params)
        grads = {"w": jnp.ones((1,), jnp.float64)}
        lrs = []
        for _ in range(steps):
            updates, opt_state = dis_bundle.tx.update(grads, opt_state,
                                                      params)
            lrs.append(float(-updates["w"][0]))
        return lrs

    with jax.enable_x64(True):
        small = {"epochs": 2, "iterations": 4}
        cfg1 = default_config().replace(
            training={"domain_adaptation": small})
        cfg2 = default_config().replace(
            training={"domain_adaptation": {**small, "variant": "v2"}})
        dis_lr = float(cfg1.model["adversarial_model"]["discriminator"]
                       ["optimizer"]["lr"])
        v1, v2 = lr_trace(cfg1, 4), lr_trace(cfg2, 4)
    np.testing.assert_allclose(v1[0], dis_lr, rtol=1e-6)
    np.testing.assert_allclose(v2[0], dis_lr, rtol=1e-6)
    # v1: flat inside epoch 0; v2: strictly decaying per iteration
    np.testing.assert_allclose(v1, [v1[0]] * 4, rtol=1e-9)
    assert all(b < a * (1 - 1e-6) for a, b in zip(v2, v2[1:])), v2


def test_build_adversarial_deeplab_generator(key, rng):
    """adversarial_model.generator.name: deeplab (ours -- the reference
    restricts DA to bisenet, main.py:172, though AdaptSegNet defined the
    recipe on DeepLab).  The fused v1 step runs, BOTH networks update,
    and the generator's frozen-BN affine params stay frozen, exactly as
    in the supervised deeplab path."""
    from rtsds_tpu.models.deeplabv2 import DeepLabV2
    from rtsds_tpu.train.adversarial import make_adversarial_step

    cfg = default_config().replace(model={
        "adversarial_model": {"generator": {"name": "deeplab"}}})
    gen_bundle, dis_bundle = build_adversarial(cfg)
    assert isinstance(gen_bundle.model, DeepLabV2)

    # thin stages for CPU speed; the tx (with its frozen-BN mask
    # callable) is untouched
    gen_bundle.model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    gen_state = gen_bundle.init_state(key, jnp.zeros((1, 40, 72, 3)))
    dis_state = dis_bundle.init_state(key, jnp.zeros((1, 32, 64, 19)))

    step = make_adversarial_step(lambda_=0.1, iterations=2, epochs=1,
                                 donate=False)
    src = jnp.asarray(rng.normal(size=(1, 40, 72, 3)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, 19, size=(1, 40, 72)))
    tgt = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    g_before, d_before = gen_state.params, dis_state.params
    gen_state, dis_state, metrics = step(gen_state, dis_state, src, lbl,
                                         tgt)
    assert np.isfinite(float(metrics["loss_gen_source"]))
    assert np.isfinite(float(metrics["loss_disc_source"]))

    flat_b = jax.tree_util.tree_flatten_with_path(g_before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(gen_state.params)[0]
    changed = frozen_ok = 0
    for (path, b), (_, a) in zip(flat_b, flat_a):
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        is_bn = any(k.startswith("bn") or k == "downsample_bn"
                    for k in keys)
        if is_bn:
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
            frozen_ok += 1
        elif not np.array_equal(np.asarray(b), np.asarray(a)):
            changed += 1
    assert frozen_ok > 0 and changed > 0
    # discriminator updated too
    d_changed = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree_util.tree_leaves(d_before),
                        jax.tree_util.tree_leaves(dis_state.params)))
    assert d_changed


def test_build_adversarial_rejects_unknown_generator():
    import pytest

    cfg = default_config().replace(model={
        "adversarial_model": {"generator": {"name": "unet"}}})
    with pytest.raises(ValueError, match="deeplab or bisenet"):
        build_adversarial(cfg)


def test_remat_config_reaches_models():
    """model.*.remat (ours): gradient rematerialization is a config key,
    for both the supervised models and the DA generator."""
    cfg = default_config().replace(model={
        "deeplab": {"remat": True}, "bisenet": {"remat": True},
        "adversarial_model": {"generator": {"name": "deeplab"}}})
    assert build_supervised(cfg, "deeplab", 10).model.remat is True
    assert build_supervised(cfg, "bisenet", 10).model.remat is True
    gen_bundle, _ = build_adversarial(cfg)
    assert gen_bundle.model.remat is True
    assert build_supervised(default_config(), "deeplab",
                            10).model.remat is False
