"""Shared helpers for importing the ACTUAL reference implementation from
``/root/reference`` (read-only, at test time; nothing is copied).

The reference's BiSeNet context path imports torchvision
(``build_contextpath.py:1-3``), which is absent here; a minimal fake
``torchvision.models`` with the standard attribute layout
(``conv1/bn1/relu/maxpool/layer1..4`` -- the only attributes the reference
wrapper reads, ``build_contextpath.py:8-16``) stands in.
"""

import importlib.util
import os
import sys
import types

import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

REF_ROOT = "/root/reference"
REF_BISENET_DIR = os.path.join(REF_ROOT, "models", "bisenet")
REF_DA_MODEL = os.path.join(REF_ROOT, "models", "domain_shift",
                            "adversarial", "model.py")


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False),
                nn.BatchNorm2d(width))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * self.expansion
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class FakeTorchvisionResNet(nn.Module):
    def __init__(self, block, layers):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (width, n) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(block(cin, width, stride))
                cin = width * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))


def install_fake_torchvision(monkeypatch):
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = lambda pretrained=False, **k: FakeTorchvisionResNet(
        BasicBlock, [2, 2, 2, 2])
    tv_models.resnet101 = lambda pretrained=False, **k: FakeTorchvisionResNet(
        Bottleneck, [3, 4, 23, 3])
    tv.models = tv_models
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.models", tv_models)


def load_reference_bisenet(monkeypatch):
    """Import the real ``build_bisenet.py`` (package-relative import of
    build_contextpath resolved via a synthetic package)."""
    if not os.path.isdir(REF_BISENET_DIR):
        pytest.skip("reference tree not mounted")
    install_fake_torchvision(monkeypatch)
    pkg = types.ModuleType("ref_bisenet_pkg")
    pkg.__path__ = [REF_BISENET_DIR]
    monkeypatch.setitem(sys.modules, "ref_bisenet_pkg", pkg)
    spec = importlib.util.spec_from_file_location(
        "ref_bisenet_pkg.build_bisenet",
        os.path.join(REF_BISENET_DIR, "build_bisenet.py"))
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, "ref_bisenet_pkg.build_bisenet", mod)
    spec.loader.exec_module(mod)
    return mod


def load_reference_da_models():
    """Import the real discriminator/GRL module (pure torch, no deps)."""
    if not os.path.exists(REF_DA_MODEL):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_da_model", REF_DA_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# torch module names in the reference BiSeNet -> our Flax scope names
BISENET_RENAMES = {
    "saptial_path": "spatial_path",
    "attention_refinement_module1": "arm1",
    "attention_refinement_module2": "arm2",
    "feature_fusion_module": "ffm",
}


def adapt_bisenet_state_dict(state_dict):
    out = {}
    for k, v in state_dict.items():
        if k.startswith("context_path.features."):
            continue  # duplicate aliases of context_path.conv1/bn1/layer1..4
        head, _, rest = k.partition(".")
        out[f"{BISENET_RENAMES.get(head, head)}.{rest}" if rest else
            BISENET_RENAMES.get(head, head)] = v
    return out


def randomize_bn_stats(model, gen):
    """Give every BN non-trivial affine params and running stats so parity
    checks exercise the batch_stats conversion, not just 0/1."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.2, 0.2, generator=gen)
                m.running_mean.uniform_(-0.5, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)


def load_reference_training(monkeypatch):
    """Import the reference's ACTUAL training stack — ``utils.py``,
    ``callbacks.py``, ``validation.py``, ``train.py`` — as live modules
    (read-only from ``/root/reference``; nothing copied).

    Absent third-party deps are faked at the import boundary only:
    torchvision (models + ``transforms.functional.to_pil_image``),
    fvcore (FLOPs tooling, unused by the loops), wandb (module-level
    import in ``callbacks.py:46``).  One catalogued reference bug is
    patched to intent (SURVEY §7): ``tabular_print`` references
    ``sys.stderr`` without importing ``sys`` (``utils.py:86``) — the
    module gets ``sys`` injected so the PrettyTable-less fallback works.
    """
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree not mounted")
    install_fake_torchvision(monkeypatch)
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvf.to_pil_image = lambda x: x
    tvt = types.ModuleType("torchvision.transforms")
    tvt.functional = tvf
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tvt)
    monkeypatch.setitem(sys.modules, "torchvision.transforms.functional",
                        tvf)
    sys.modules["torchvision"].transforms = tvt

    fv = types.ModuleType("fvcore")
    fvn = types.ModuleType("fvcore.nn")
    fvn.FlopCountAnalysis = object
    fvn.flop_count_table = lambda *a, **k: ""
    fv.nn = fvn
    monkeypatch.setitem(sys.modules, "fvcore", fv)
    monkeypatch.setitem(sys.modules, "fvcore.nn", fvn)

    wb = types.ModuleType("wandb")
    wb.init = lambda **k: None
    wb.log = lambda *a, **k: None
    wb.Table = lambda **k: None
    wb.finish = lambda: None
    monkeypatch.setitem(sys.modules, "wandb", wb)

    def load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_ROOT, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        monkeypatch.setitem(sys.modules, name, mod)
        spec.loader.exec_module(mod)
        return mod

    utils = load("utils")
    utils.sys = sys  # catalogued bug fix: utils.py:86 missing `import sys`
    callbacks = load("callbacks")
    validation = load("validation")
    train = load("train")
    return types.SimpleNamespace(utils=utils, callbacks=callbacks,
                                 validation=validation, train=train)
