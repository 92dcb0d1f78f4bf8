"""Golden whole-model parity: our Flax BiSeNet vs an independently-written
torch implementation of the same architecture (spec: build_bisenet.py:84-172,
build_contextpath.py:5-29), with weights copied from OUR initialization.

This is the BASELINE.md fidelity gate ("logits within tolerance on identical
images") exercised end to end: stem + 4 ResNet-18 stages + ARM gates + tail
multiply + bilinear fusions + FFM + 8x upsample + classifier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.bisenet import BiSeNet

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _conv(p, bias=True):
    k = np.asarray(p["kernel"])  # HWIO
    kh, kw, cin, cout = k.shape
    m = torch.nn.Conv2d(cin, cout, (kh, kw), bias=bias)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
        if bias:
            m.bias.copy_(torch.tensor(np.asarray(p["bias"])))
    return m


def _bn_apply(x, p, bs):
    return F.batch_norm(
        x,
        torch.tensor(np.asarray(bs["mean"])),
        torch.tensor(np.asarray(bs["var"])),
        torch.tensor(np.asarray(p["scale"])),
        torch.tensor(np.asarray(p["bias"])),
        training=False, eps=1e-5)


def _convbn(x, p, bs, stride, padding, relu=True):
    k = torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    x = F.conv2d(x, k, stride=stride, padding=padding)
    x = _bn_apply(x, p, bs)
    return F.relu(x) if relu else x


def _convblock(x, p, bs, stride):
    x = F.conv2d(x, torch.tensor(
        np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1)),
        stride=stride, padding=1)
    return F.relu(_bn_apply(x, p["bn"], bs["bn"]))


def _conv1x1(x, p):
    k = torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    return F.conv2d(x, k, bias=torch.tensor(np.asarray(p["bias"])))


def _basicblock(x, p, bs, stride):
    # conv1/bn1/relu, conv2/bn2, (+projection), relu
    k1 = torch.tensor(np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    k2 = torch.tensor(np.asarray(p["conv2"]["kernel"]).transpose(3, 2, 0, 1))
    out = F.relu(_bn_apply(F.conv2d(x, k1, stride=stride, padding=1),
                           p["bn1"], bs["bn1"]))
    out = _bn_apply(F.conv2d(out, k2, stride=1, padding=1), p["bn2"], bs["bn2"])
    if "downsample_conv" in p:
        kd = torch.tensor(
            np.asarray(p["downsample_conv"]["kernel"]).transpose(3, 2, 0, 1))
        identity = _bn_apply(F.conv2d(x, kd, stride=stride),
                             p["downsample_bn"], bs["downsample_bn"])
    else:
        identity = x
    return F.relu(out + identity)


def _resnet18(x, p, bs):
    k = torch.tensor(np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    x = F.relu(_bn_apply(F.conv2d(x, k, stride=2, padding=3),
                         p["bn1"], bs["bn1"]))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = []
    for stage in range(1, 5):
        for blk in range(2):
            name = f"layer{stage}_{blk}"
            stride = 2 if (stage > 1 and blk == 0) else 1
            x = _basicblock(x, p[name], bs[name], stride)
        feats.append(x)
    tail = x.mean(dim=(2, 3), keepdim=True)
    return feats[2], feats[3], tail


def _arm(x, p, bs):
    g = F.adaptive_avg_pool2d(x, 1)
    g = torch.sigmoid(_bn_apply(_conv1x1(g, p["conv"]), p["bn"], bs["bn"]))
    return x * g


def _ffm(x1, x2, p, bs):
    x = torch.cat([x1, x2], dim=1)
    feat = _convblock(x, p["convblock"], bs["convblock"], stride=1)
    g = F.adaptive_avg_pool2d(feat, 1)
    g = torch.sigmoid(_conv1x1(F.relu(_conv1x1(g, p["conv1"])), p["conv2"]))
    return feat * g + feat


def torch_bisenet_eval(x, params, batch_stats):
    sx = _convblock(x, params["spatial_path"]["convblock1"],
                    batch_stats["spatial_path"]["convblock1"], 2)
    sx = _convblock(sx, params["spatial_path"]["convblock2"],
                    batch_stats["spatial_path"]["convblock2"], 2)
    sx = _convblock(sx, params["spatial_path"]["convblock3"],
                    batch_stats["spatial_path"]["convblock3"], 2)

    cx1, cx2, tail = _resnet18(x, params["context_path"],
                               batch_stats["context_path"])
    cx1 = _arm(cx1, params["arm1"], batch_stats["arm1"])
    cx2 = _arm(cx2, params["arm2"], batch_stats["arm2"])
    cx2 = cx2 * tail
    size = sx.shape[-2:]
    cx1 = F.interpolate(cx1, size=size, mode="bilinear")
    cx2 = F.interpolate(cx2, size=size, mode="bilinear")
    cx = torch.cat([cx1, cx2], dim=1)

    out = _ffm(sx, cx, params["ffm"], batch_stats["ffm"])
    out = F.interpolate(out, scale_factor=8, mode="bilinear")
    return _conv1x1(out, params["conv"])


def test_bisenet_logits_match_torch(key, rng):
    model = BiSeNet(num_classes=19, context_path="resnet18", fast_head=False)
    x = rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
    variables = model.init(key, jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = torch_bisenet_eval(xt, variables["params"],
                                 variables["batch_stats"])
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
