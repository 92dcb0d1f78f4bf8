"""Model shape/dtype/contract tests (reference contracts:
build_bisenet.py:141-172, deeplabv2.py:113-131, model.py:30-83)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.models.deeplabv2 import DeepLabV2, frozen_bn_mask, lr_multiplier_mask
from rtsds_tpu.models.discriminator import (
    DomainDiscriminator,
    TinyDomainDiscriminator,
    gradient_reversal,
)
from rtsds_tpu.models.layers import max_pool_3x3_s2
from rtsds_tpu.models.resnet import ResNetBackbone


def test_resnet18_feature_shapes(key):
    model = ResNetBackbone(arch="resnet18")
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(key, x)
    c3, c4, tail = model.apply(variables, x)
    assert c3.shape == (1, 4, 8, 256)   # 1/16
    assert c4.shape == (1, 2, 4, 512)   # 1/32
    assert tail.shape == (1, 1, 1, 512)


def test_bisenet_train_eval_contract(key):
    model = BiSeNet(num_classes=19, context_path="resnet18")
    x = jnp.zeros((2, 64, 128, 3))
    variables = model.init(key, x, train=True)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    main, aux1, aux2 = out
    assert main.shape == (2, 64, 128, 19)
    assert aux1.shape == (2, 64, 128, 19)
    assert aux2.shape == (2, 64, 128, 19)
    assert "batch_stats" in mutated

    eval_out = model.apply(variables, x, train=False)
    assert not isinstance(eval_out, tuple)
    assert eval_out.shape == (2, 64, 128, 19)


@pytest.mark.slow
def test_bisenet_resnet101_channel_math(key):
    # FFM in_channels 3328 = 256 + 1024 + 2048 (build_bisenet.py:60-61)
    model = BiSeNet(num_classes=19, context_path="resnet101")
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(key, x, train=False)
    ffm_kernel = variables["params"]["ffm"]["convblock"]["conv1"]["kernel"]
    assert ffm_kernel.shape[-2] == 3328


def test_bisenet_without_interpolation(key):
    model = BiSeNet(num_classes=19, context_path="resnet18",
                    with_interpolation=False)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(key, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8, 16, 19)  # 1/8 resolution, no final upsample


def test_deeplab_shapes_and_tuple(key):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))  # thin for speed
    x = jnp.zeros((1, 65, 129, 3))  # odd sizes exercise ceil_mode path
    variables = model.init(key, x, train=True)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    main, aux1, aux2 = out
    assert main.shape == (1, 65, 129, 19)
    assert aux1 is None and aux2 is None
    eval_out = model.apply(variables, x, train=False)
    assert eval_out.shape == (1, 65, 129, 19)


def test_deeplab_dilated_stages_keep_stride_8(key):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(key, x, train=False)
    params = variables["params"]
    # layer3/layer4 first blocks have projection shortcuts (dilation 2/4)
    assert "downsample_conv" in params["layer3_0"]
    assert "downsample_conv" in params["layer4_0"]


def test_frozen_bn_mask_covers_all_bn(key):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    variables = model.init(key, jnp.zeros((1, 32, 32, 3)), train=False)
    mask = frozen_bn_mask(variables["params"])
    leaves_masked = [
        (path, m) for path, m in
        jax.tree_util.tree_flatten_with_path(mask)[0]]
    frozen = [p for p, m in leaves_masked if m]
    trainable = [p for p, m in leaves_masked if not m]
    assert frozen and trainable
    for p, m in leaves_masked:
        keys = tuple(k.key for k in p if hasattr(k, "key"))
        if any("bn" in k for k in keys):
            assert m, keys
        else:
            assert not m, keys


def test_lr_multiplier_mask(key):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    variables = model.init(key, jnp.zeros((1, 32, 32, 3)), train=False)
    mults = lr_multiplier_mask(variables["params"])
    assert set(np.unique(jax.tree_util.tree_leaves(mults))) == {1.0, 10.0}
    assert all(v == 10.0 for v in jax.tree_util.tree_leaves(mults["layer6"]))


def test_discriminators_output_shape(key):
    x = jax.nn.softmax(jnp.zeros((4, 64, 128, 19)), axis=-1)
    for cls in (DomainDiscriminator, TinyDomainDiscriminator):
        model = cls(num_classes=19)
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out.shape == (4, 1, 1, 1), cls.__name__


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 0.5) * 3.0)

    g = jax.grad(f)(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), -0.5 * 3.0 * np.ones(4), rtol=1e-6)
    # forward is identity
    np.testing.assert_allclose(
        np.asarray(gradient_reversal(jnp.arange(3.0), 0.9)), [0, 1, 2])


def test_maxpool_ceil_mode_matches_torch(rng):
    torch = pytest.importorskip("torch")
    for h, w in [(256, 512), (33, 65), (17, 31)]:
        x = rng.normal(size=(1, h, w, 4)).astype(np.float32)
        t = torch.tensor(x).permute(0, 3, 1, 2)
        for ceil in (False, True):
            ours = np.asarray(max_pool_3x3_s2(jnp.asarray(x), ceil_mode=ceil))
            ref = torch.nn.functional.max_pool2d(
                t, 3, stride=2, padding=1, ceil_mode=ceil)
            ref = ref.permute(0, 2, 3, 1).numpy()
            assert ours.shape == ref.shape, (h, w, ceil)
            np.testing.assert_allclose(ours, ref, rtol=1e-6)
