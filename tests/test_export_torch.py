"""export_torch CLI: training checkpoint -> .pth the reference can load.

The full ecosystem round trip: CheckpointManager save -> ``python -m
rtsds_tpu.export_torch`` -> torch.load -> load_state_dict(strict=True)
into the ACTUAL reference BiSeNet (build_bisenet.py, torchvision faked).
"""

import jax
import jax.numpy as jnp
import numpy as np

from reference_loader import load_reference_bisenet, torch

from rtsds_tpu.callbacks.checkpoint import CheckpointManager
from rtsds_tpu.export_torch import main as export_main
from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state


def _save_bisenet_checkpoint(tmp_path, key):
    model = BiSeNet(num_classes=19, context_path="resnet18")
    # train=True init: supervision heads must exist for a strict load
    state = create_train_state(model, key, jnp.zeros((1, 32, 64, 3)),
                               make_optimizer("Adam", 1e-4), train=True)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, {"model": state}, monitor=0.3)
    mgr.close()
    return state


def test_cli_export_strict_loads_into_reference(tmp_path, key, monkeypatch):
    ref_mod = load_reference_bisenet(monkeypatch)
    state = _save_bisenet_checkpoint(tmp_path, key)

    out = str(tmp_path / "bisenet.pth")
    assert export_main([str(tmp_path / "ckpt"), out]) == 0

    loaded = torch.load(out, map_location="cpu", weights_only=True)
    torch.manual_seed(0)
    ref_model = ref_mod.BiSeNet(19, "resnet18")
    ref_model.load_state_dict(loaded, strict=True)
    # spot-check a tensor survived the trip (conv1 OIHW <- our HWIO)
    np.testing.assert_allclose(
        ref_model.saptial_path.convblock1.conv1.weight.detach().numpy(),
        np.asarray(state.params["spatial_path"]["convblock1"]["conv1"]
                   ["kernel"]).transpose(3, 2, 0, 1))


def test_cli_export_ema_item_and_no_ema(tmp_path, key):
    model = BiSeNet(num_classes=19, context_path="resnet18")
    state = create_train_state(model, key, jnp.zeros((1, 32, 64, 3)),
                               make_optimizer("Adam", 1e-4), train=True)
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, {"model": state, "ema": {"params": ema}}, monitor=0.3)
    mgr.close()

    ref_key = "saptial_path.convblock1.conv1.weight"
    out = str(tmp_path / "ema.pth")
    export_main([str(tmp_path / "ckpt"), out])
    got = torch.load(out, map_location="cpu", weights_only=True)[ref_key]
    np.testing.assert_allclose(
        got.numpy(), np.asarray(ema["spatial_path"]["convblock1"]["conv1"]
                                ["kernel"]).transpose(3, 2, 0, 1))

    out_raw = str(tmp_path / "raw.pth")
    export_main([str(tmp_path / "ckpt"), out_raw, "--no-ema"])
    got_raw = torch.load(out_raw, map_location="cpu",
                         weights_only=True)[ref_key]
    np.testing.assert_allclose(
        got_raw.numpy(),
        np.asarray(state.params["spatial_path"]["convblock1"]["conv1"]
                   ["kernel"]).transpose(3, 2, 0, 1))


def test_cli_export_raw_prefix(tmp_path, key):
    _save_bisenet_checkpoint(tmp_path, key)
    out = str(tmp_path / "raw.pth")
    export_main([str(tmp_path / "ckpt"), out, "--model", "raw",
                 "--prefix", "Scale."])
    loaded = torch.load(out, map_location="cpu", weights_only=True)
    assert all(k.startswith("Scale.") for k in loaded)
    # our scope names, un-renamed
    assert any(k.startswith("Scale.spatial_path.") for k in loaded)
