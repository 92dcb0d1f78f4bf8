"""Numeric parity of model building blocks vs torch doubles.

Each test builds the torch equivalent of one of our blocks from its
documented spec (conv/BN hyperparameters per build_bisenet.py:8-81,
build_contextpath.py:18-29, model.py:30-83), copies OUR initialized weights
into it, and checks outputs match.  This validates conv padding/stride
conventions, BN eval semantics, gating math and layout transposes without
any reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def to_torch_conv(conv, kernel, bias=None):
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1)))
        if bias is not None:
            conv.bias.copy_(torch.tensor(np.asarray(bias)))
    return conv


def to_torch_bn(bn, scale, b, mean, var):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(np.asarray(scale)))
        bn.bias.copy_(torch.tensor(np.asarray(b)))
        bn.running_mean.copy_(torch.tensor(np.asarray(mean)))
        bn.running_var.copy_(torch.tensor(np.asarray(var)))
    bn.eval()
    return bn


def nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def test_convblock_parity(key, rng):
    from rtsds_tpu.models.layers import ConvBlock

    block = ConvBlock(features=8)  # 3x3 stride 2 pad 1, bn, relu
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    variables = block.init(key, jnp.asarray(x), train=False)
    out = block.apply(variables, jnp.asarray(x), train=False)

    p, bs = variables["params"], variables["batch_stats"]
    t_conv = to_torch_conv(torch.nn.Conv2d(3, 8, 3, 2, 1, bias=False),
                           p["conv1"]["kernel"])
    t_bn = to_torch_bn(torch.nn.BatchNorm2d(8, eps=1e-5), p["bn"]["scale"],
                       p["bn"]["bias"], bs["bn"]["mean"], bs["bn"]["var"])
    ref = torch.relu(t_bn(t_conv(nchw(x))))
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_arm_parity(key, rng):
    from rtsds_tpu.models.bisenet import AttentionRefinementModule

    arm = AttentionRefinementModule(features=8)
    x = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    variables = arm.init(key, jnp.asarray(x), train=False)
    out = arm.apply(variables, jnp.asarray(x), train=False)

    p, bs = variables["params"], variables["batch_stats"]
    t_conv = to_torch_conv(torch.nn.Conv2d(8, 8, 1), p["conv"]["kernel"],
                           p["conv"]["bias"])
    t_bn = to_torch_bn(torch.nn.BatchNorm2d(8, eps=1e-5), p["bn"]["scale"],
                       p["bn"]["bias"], bs["bn"]["mean"], bs["bn"]["var"])
    xt = nchw(x)
    gate = torch.sigmoid(t_bn(t_conv(
        torch.nn.functional.adaptive_avg_pool2d(xt, 1))))
    ref = xt * gate
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_ffm_parity(key, rng):
    from rtsds_tpu.models.bisenet import FeatureFusionModule

    ffm = FeatureFusionModule(num_classes=5, in_channels=12)
    x1 = rng.normal(size=(2, 4, 6, 7)).astype(np.float32)
    x2 = rng.normal(size=(2, 4, 6, 5)).astype(np.float32)
    variables = ffm.init(key, jnp.asarray(x1), jnp.asarray(x2), train=False)
    out = ffm.apply(variables, jnp.asarray(x1), jnp.asarray(x2), train=False)

    p, bs = variables["params"], variables["batch_stats"]
    cb = p["convblock"]
    t_cb_conv = to_torch_conv(torch.nn.Conv2d(12, 5, 3, 1, 1, bias=False),
                              cb["conv1"]["kernel"])
    t_cb_bn = to_torch_bn(torch.nn.BatchNorm2d(5, eps=1e-5),
                          cb["bn"]["scale"], cb["bn"]["bias"],
                          bs["convblock"]["bn"]["mean"],
                          bs["convblock"]["bn"]["var"])
    t_c1 = to_torch_conv(torch.nn.Conv2d(5, 5, 1), p["conv1"]["kernel"],
                         p["conv1"]["bias"])
    t_c2 = to_torch_conv(torch.nn.Conv2d(5, 5, 1), p["conv2"]["kernel"],
                         p["conv2"]["bias"])

    xt = torch.cat([nchw(x1), nchw(x2)], dim=1)
    feature = torch.relu(t_cb_bn(t_cb_conv(xt)))
    g = torch.nn.functional.adaptive_avg_pool2d(feature, 1)
    g = torch.sigmoid(t_c2(torch.relu(t_c1(g))))
    ref = feature * g + feature
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_tiny_discriminator_parity(key, rng):
    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator

    d = TinyDomainDiscriminator(num_classes=19)
    x = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(2, 16, 32, 19)).astype(np.float32)), axis=-1)
    variables = d.init(key, x)
    out = d.apply(variables, x)

    p = variables["params"]
    t1 = to_torch_conv(torch.nn.Conv2d(19, 64, 4, 2, 1),
                       p["conv1"]["kernel"], p["conv1"]["bias"])
    t2 = to_torch_conv(torch.nn.Conv2d(64, 1, 4, 2, 1),
                       p["classifier"]["kernel"], p["classifier"]["bias"])
    xt = nchw(np.asarray(x))
    ref = torch.nn.functional.adaptive_avg_pool2d(
        t2(torch.nn.functional.leaky_relu(t1(xt), 0.2)), 1)
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_basicblock_parity(key, rng):
    from rtsds_tpu.models.resnet import BasicBlock

    blk = BasicBlock(features=8, stride=2, downsample=True)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    variables = blk.init(key, jnp.asarray(x), train=False)
    out = blk.apply(variables, jnp.asarray(x), train=False)

    p, bs = variables["params"], variables["batch_stats"]
    c1 = to_torch_conv(torch.nn.Conv2d(4, 8, 3, 2, 1, bias=False),
                       p["conv1"]["kernel"])
    b1 = to_torch_bn(torch.nn.BatchNorm2d(8, eps=1e-5), p["bn1"]["scale"],
                     p["bn1"]["bias"], bs["bn1"]["mean"], bs["bn1"]["var"])
    c2 = to_torch_conv(torch.nn.Conv2d(8, 8, 3, 1, 1, bias=False),
                       p["conv2"]["kernel"])
    b2 = to_torch_bn(torch.nn.BatchNorm2d(8, eps=1e-5), p["bn2"]["scale"],
                     p["bn2"]["bias"], bs["bn2"]["mean"], bs["bn2"]["var"])
    dc = to_torch_conv(torch.nn.Conv2d(4, 8, 1, 2, 0, bias=False),
                       p["downsample_conv"]["kernel"])
    db = to_torch_bn(torch.nn.BatchNorm2d(8, eps=1e-5),
                     p["downsample_bn"]["scale"], p["downsample_bn"]["bias"],
                     bs["downsample_bn"]["mean"], bs["downsample_bn"]["var"])
    xt = nchw(x)
    ref = torch.relu(b2(c2(torch.relu(b1(c1(xt))))) + db(dc(xt)))
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_aspp_parity(key, rng):
    from rtsds_tpu.models.deeplabv2 import ASPP

    aspp = ASPP(num_classes=5)
    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    variables = aspp.init(key, jnp.asarray(x))
    out = aspp.apply(variables, jnp.asarray(x))

    p = variables["params"]
    ref = None
    for i, d in enumerate((6, 12, 18, 24)):
        conv = to_torch_conv(
            torch.nn.Conv2d(16, 5, 3, 1, padding=d, dilation=d, bias=True),
            p[f"conv2d_list_{i}"]["kernel"], p[f"conv2d_list_{i}"]["bias"])
        y = conv(nchw(x))
        ref = y if ref is None else ref + y
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=1e-4, atol=1e-5)
