"""Regression tests for round-1 wiring bugs (VERDICT.md "What's weak"):

1. ImagePlotsCallback was dead through the standard loops: the loops
   pre-built eval_step with return_preds=False, so validate() never called
   add_sample and no validation images were ever written.
2. The supervised augmentation PRNG repeated every epoch: the per-epoch
   batch generator restarted its counter with the same key, so epoch N's
   k-th batch drew the same blur/flip randomness as every other epoch's.
3. make_mesh silently dropped chips when batch_size % n_devices != 0.
4. validate() per-batch callbacks force a host sync per batch; they must
   default OFF (the reference-shaped val/val_GTA5 keep them on).
5. G and D were initialized from the same PRNG key (correlated inits).
"""

import glob
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from rtsds_tpu.callbacks.base import Callback


def _config_with_plots(tmp_path, epochs=2):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "segmentation": {"epochs": epochs, "do_validation": 1},
            "domain_adaptation": {"epochs": 1, "iterations": 2,
                                  "do_validation": 1},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
            "images_plots": {"save_dir": str(tmp_path / "images"),
                             "number_of_samples": 2},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_image_plots_written_through_standard_loop(tmp_path):
    """A normal synthetic supervised run must write validation images
    (regression: return_preds was hardwired False in the loops)."""
    from rtsds_tpu import cli

    cfg_path = _config_with_plots(tmp_path, epochs=1)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])
    pngs = glob.glob(os.path.join(str(tmp_path / "images"), "*.png"))
    assert pngs, "ImagePlotsCallback wrote no images through supervised_fit"


@pytest.mark.slow
def test_augmentation_key_varies_per_epoch(tmp_path, monkeypatch):
    """The key handed to the per-epoch batch generator must differ across
    epochs (regression: same aug_key + counter restart every epoch)."""
    from rtsds_tpu import cli

    seen_keys = []
    orig = cli._device_batches

    def recording(loader, transform, mesh, key=None, augment=False,
                  infinite=False):
        if augment and not infinite:  # the supervised train path
            seen_keys.append(np.asarray(jax.random.key_data(key)).copy())
        return orig(loader, transform, mesh, key=key, augment=augment,
                    infinite=infinite)

    monkeypatch.setattr(cli, "_device_batches", recording)
    cfg_path = _config_with_plots(tmp_path, epochs=2)
    cli.main(["--config", cfg_path, "--synthetic", "--dataset", "gta5",
              "--augmented"])
    assert len(seen_keys) >= 2
    assert not np.array_equal(seen_keys[0], seen_keys[1]), \
        "epoch 0 and epoch 1 received identical augmentation keys"


def test_make_mesh_warns_on_device_trim():
    from rtsds_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    with pytest.warns(UserWarning, match="idling"):
        mesh = make_mesh(batch_size=6)  # 6 % 8 != 0 -> trims to 6
    assert mesh.devices.size == 6

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mesh = make_mesh(batch_size=16)  # divisible: no warning
    assert mesh.devices.size == 8


class _ValBatchRecorder(Callback):
    def __init__(self):
        self.batch_calls = 0

    def on_validation_batch_end(self, batch, logs=None):
        self.batch_calls += 1


def _tiny_eval_setup():
    from rtsds_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_classes=5, context_path="resnet18")
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    state = types.SimpleNamespace(apply_fn=model.apply, variables=variables)
    batches = [(jnp.zeros((1, 32, 64, 3)),
                jnp.zeros((1, 32, 64), jnp.int32))] * 3
    return state, batches


def test_validate_default_skips_per_batch_sync():
    from rtsds_tpu.eval.validate import val, validate

    state, batches = _tiny_eval_setup()
    rec = _ValBatchRecorder()
    validate(state, iter(batches), 5, callbacks=[rec])
    assert rec.batch_calls == 0, "validate() default must not sync per batch"

    rec = _ValBatchRecorder()
    val(0, state, iter(batches), 5, callbacks=[rec])
    assert rec.batch_calls == 3, "reference-shaped val() keeps per-batch hooks"


@pytest.mark.slow
def test_gen_disc_inits_uncorrelated(tmp_path, monkeypatch):
    """G and D must be initialized from different PRNG keys."""
    from rtsds_tpu import cli
    from rtsds_tpu.train import factory

    keys = []
    orig_init = factory.ModelBundle.init_state

    def recording(self, key, *a, **k):
        keys.append(np.asarray(jax.random.key_data(key)).copy())
        return orig_init(self, key, *a, **k)

    monkeypatch.setattr(factory.ModelBundle, "init_state", recording)
    cfg_path = _config_with_plots(tmp_path, epochs=1)
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation"])
    assert len(keys) == 2, "expected exactly one G and one D init"
    assert not np.array_equal(keys[0], keys[1]), \
        "generator and discriminator share an init key"


@pytest.mark.slow
def test_config_mesh_spec_limits_devices(tmp_path, monkeypatch):
    """config mesh: {data: N} restricts the data-parallel mesh size."""
    from rtsds_tpu import cli

    sizes = []
    import rtsds_tpu.parallel.mesh as mesh_mod

    orig = mesh_mod.make_mesh

    def recording(devices=None, axis_name="data", batch_size=None):
        m = orig(devices=devices, axis_name=axis_name, batch_size=batch_size)
        sizes.append(m.devices.size)
        return m

    monkeypatch.setattr(cli, "make_mesh", recording, raising=False)
    import yaml as _yaml

    cfg = _yaml.safe_load(open(_config_with_plots(tmp_path, epochs=1)))
    cfg["mesh"] = {"data": 2}
    cfg["callbacks"].pop("images_plots")
    path = tmp_path / "cfg2.yaml"
    path.write_text(_yaml.safe_dump(cfg))
    # import-time binding: cli.main calls make_mesh via local import name
    monkeypatch.setattr("rtsds_tpu.parallel.mesh.make_mesh", recording)
    cli.main(["--config", str(path), "--synthetic", "--model", "bisenet"])
    assert sizes and sizes[0] <= 2
