"""torch-state-dict -> Flax conversion (pretrained.py): key translation,
OIHW->HWIO transpose, prefix stripping (deeplabv2.py:183-188 rule),
non-strict merge into BiSeNet's context path."""

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.pretrained import (
    convert_torch_state_dict,
    merge_pretrained,
)
from rtsds_tpu.models.resnet import ResNetBackbone


def test_key_translation_and_transpose(rng):
    w = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)  # OIHW
    state = {
        "conv1.weight": w,
        "bn1.weight": np.ones(8, np.float32),
        "bn1.bias": np.zeros(8, np.float32),
        "bn1.running_mean": np.zeros(8, np.float32),
        "bn1.running_var": np.ones(8, np.float32),
        "bn1.num_batches_tracked": np.int64(5),
        "layer1.0.conv1.weight": rng.normal(size=(8, 8, 3, 3)).astype(np.float32),
        "layer1.0.downsample.0.weight": rng.normal(size=(8, 8, 1, 1)).astype(np.float32),
        "layer1.0.downsample.1.weight": np.ones(8, np.float32),
        "layer1.0.downsample.1.running_var": np.ones(8, np.float32),
        "layer6.conv2d_list.2.weight": rng.normal(size=(19, 8, 3, 3)).astype(np.float32),
        "layer6.conv2d_list.2.bias": np.zeros(19, np.float32),
        "fc.weight": rng.normal(size=(1000, 512)).astype(np.float32),
    }
    out = convert_torch_state_dict(state)
    p, bs = out["params"], out["batch_stats"]
    np.testing.assert_array_equal(p["conv1"]["kernel"], w.transpose(2, 3, 1, 0))
    assert p["bn1"]["scale"].shape == (8,)
    assert bs["bn1"]["mean"].shape == (8,)
    assert "num_batches_tracked" not in str(out)
    assert p["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 8, 8)
    assert p["layer1_0"]["downsample_conv"]["kernel"].shape == (1, 1, 8, 8)
    assert p["layer1_0"]["downsample_bn"]["scale"].shape == (8,)
    assert bs["layer1_0"]["downsample_bn"]["var"].shape == (8,)
    assert p["layer6"]["conv2d_list_2"]["kernel"].shape == (3, 3, 8, 19)
    # fc is carried along (merge skips it non-strictly)
    assert "fc" in p


def test_prefix_stripping():
    state = {"module.conv1.weight": np.zeros((4, 3, 1, 1), np.float32)}
    out = convert_torch_state_dict(state, strip_prefix=True)
    assert "conv1" in out["params"]


def test_merge_into_resnet_backbone(key, rng):
    model = ResNetBackbone(arch="resnet18")
    variables = dict(model.init(key, jnp.zeros((1, 32, 64, 3))))

    # fabricate a torchvision-shaped checkpoint for the stem only
    w = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    converted = convert_torch_state_dict({
        "conv1.weight": w,
        "bn1.weight": np.full(64, 2.0, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
        "fc.weight": rng.normal(size=(1000, 512)).astype(np.float32),  # skipped
    })
    merged = merge_pretrained(variables, converted, verbose=False)
    np.testing.assert_array_equal(merged["params"]["conv1"]["kernel"],
                                  w.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(merged["params"]["bn1"]["scale"],
                                  np.full(64, 2.0, np.float32))
    # untouched layers keep their init
    assert merged["params"]["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)


def test_merge_into_bisenet_submodule(key, rng):
    from rtsds_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_classes=19, context_path="resnet18")
    variables = dict(model.init(key, jnp.zeros((1, 32, 64, 3)), train=False))
    w = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    converted = convert_torch_state_dict({"conv1.weight": w})
    merged = merge_pretrained(variables, converted, submodule="context_path",
                              verbose=False)
    np.testing.assert_array_equal(
        merged["params"]["context_path"]["conv1"]["kernel"],
        w.transpose(2, 3, 1, 0))


def test_shape_mismatch_skipped(key, rng):
    model = ResNetBackbone(arch="resnet18")
    variables = dict(model.init(key, jnp.zeros((1, 32, 64, 3))))
    bad = convert_torch_state_dict(
        {"conv1.weight": rng.normal(size=(64, 1, 7, 7)).astype(np.float32)})
    before = np.asarray(variables["params"]["conv1"]["kernel"]).copy()
    merged = merge_pretrained(variables, bad, verbose=False)
    np.testing.assert_array_equal(merged["params"]["conv1"]["kernel"], before)
