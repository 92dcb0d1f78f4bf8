"""Golden whole-model parity for DeepLabV2 (thin [1,1,1,1] config): our
Flax model vs an independent torch implementation of the spec
(deeplabv2.py:7-131) -- stride-on-1x1 bottlenecks, dilation 2/4 stages with
projection shortcuts, ceil-mode maxpool, summed ASPP, bilinear restore."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.deeplabv2 import DeepLabV2

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _k(p):
    return torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))


def _bn(x, p, bs):
    return F.batch_norm(x, torch.tensor(np.asarray(bs["mean"])),
                        torch.tensor(np.asarray(bs["var"])),
                        torch.tensor(np.asarray(p["scale"])),
                        torch.tensor(np.asarray(p["bias"])),
                        training=False, eps=1e-5)


def _bottleneck(x, p, bs, stride, dilation):
    # stride on the 1x1 conv (original ResNet placement, deeplabv2.py:13)
    out = F.relu(_bn(F.conv2d(x, _k(p["conv1"]), stride=stride),
                     p["bn1"], bs["bn1"]))
    out = F.relu(_bn(F.conv2d(out, _k(p["conv2"]), stride=1,
                              padding=dilation, dilation=dilation),
                     p["bn2"], bs["bn2"]))
    out = _bn(F.conv2d(out, _k(p["conv3"])), p["bn3"], bs["bn3"])
    if "downsample_conv" in p:
        identity = _bn(F.conv2d(x, _k(p["downsample_conv"]), stride=stride),
                       p["downsample_bn"], bs["downsample_bn"])
    else:
        identity = x
    return F.relu(out + identity)


def torch_deeplab_eval(x, p, bs):
    h, w = x.shape[-2:]
    out = F.relu(_bn(F.conv2d(x, _k(p["conv1"]), stride=2, padding=3),
                     p["bn1"], bs["bn1"]))
    out = F.max_pool2d(out, 3, stride=2, padding=1, ceil_mode=True)
    stages = [(1, 1), (2, 1), (1, 2), (1, 4)]  # (stride, dilation)
    for i, (stride, dilation) in enumerate(stages):
        name = f"layer{i + 1}_0"
        out = _bottleneck(out, p[name], bs[name], stride, dilation)
    aspp = None
    for i, d in enumerate((6, 12, 18, 24)):
        pi = p["layer6"][f"conv2d_list_{i}"]
        y = F.conv2d(out, _k(pi), bias=torch.tensor(np.asarray(pi["bias"])),
                     padding=d, dilation=d)
        aspp = y if aspp is None else aspp + y
    return F.interpolate(aspp, size=(h, w), mode="bilinear")


def test_deeplab_logits_match_torch(key, rng):
    model = DeepLabV2(num_classes=19, layers=(1, 1, 1, 1))
    x = rng.normal(size=(1, 65, 97, 3)).astype(np.float32)  # odd: ceil path
    variables = model.init(key, jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = torch_deeplab_eval(xt, variables["params"],
                                 variables["batch_stats"])
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
