"""End-to-end smoke: tiny supervised + adversarial runs through the real
wiring (config -> data -> factory -> fused steps -> validation -> callbacks
-> checkpoint), on synthetic data (SURVEY.md §4 test plan)."""

import os

import numpy as np
import pytest
import yaml

from rtsds_tpu.callbacks.base import Callback


class RecorderCallback(Callback):
    def __init__(self):
        self.batch_logs = []
        self.epoch_logs = []
        self.val_logs = []
        self.train_ended = False

    def on_batch_end(self, batch, logs=None):
        self.batch_logs.append(logs)

    def on_epoch_end(self, epoch, logs=None):
        self.epoch_logs.append(logs)

    def on_validation_end(self, logs=None, data=None):
        self.val_logs.append((logs, data))

    def on_train_end(self, logs=None):
        self.train_ended = True


def _tiny_config(tmp_path, epochs=1, iterations=2, variant="v1"):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "segmentation": {"epochs": epochs, "do_validation": 1},
            "domain_adaptation": {"epochs": epochs, "iterations": iterations,
                                  "do_validation": 1, "variant": variant},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
            "early_stopping": {"monitor": "validation_mIoU", "mode": "max",
                               "patience": 50},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_supervised_smoke(tmp_path, monkeypatch):
    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path)
    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])

    assert recorder.train_ended
    assert recorder.batch_logs and "train_loss" in recorder.batch_logs[0]
    assert recorder.val_logs
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0
    # checkpoint actually written (the declared-but-unimplemented
    # config.yaml:128-134 schema, now real)
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "model"))


@pytest.mark.slow
def test_supervised_gta5_augmented_smoke(tmp_path, monkeypatch):
    """--dataset gta5 --augmented: train on GTA5 (blur+flip augmentation),
    validate on Cityscapes (main.py:338-340)."""
    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path)
    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--dataset", "gta5",
              "--augmented"])
    assert recorder.train_ended
    assert recorder.val_logs


@pytest.mark.slow
def test_supervised_bf16_smoke(tmp_path, monkeypatch):
    """precision.compute_dtype: bfloat16 — the mixed-precision config runs
    end to end (params f32, conv/matmul path bf16) with finite losses."""
    import yaml as _yaml

    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path)
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["precision"] = {"compute_dtype": "bfloat16"}
    open(cfg_path, "w").write(_yaml.safe_dump(cfg))

    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])
    assert recorder.train_ended
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


@pytest.mark.slow
def test_supervised_composed_mesh_smoke(tmp_path, monkeypatch):
    """config `mesh: {data: 2, spatial: 2, model: 2}`: the CLI trains with
    batch AND image height sharded and params FSDP-sharded, end to end."""
    import yaml as _yaml

    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path)
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["mesh"] = {"data": 2, "spatial": 2, "model": 2}
    open(cfg_path, "w").write(_yaml.safe_dump(cfg))

    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])
    assert recorder.train_ended
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


@pytest.mark.slow
def test_supervised_deeplab_smoke(tmp_path, monkeypatch):
    """`--model deeplab` end to end: frozen-BN DeepLabV2-R101 trains and
    validates through the real CLI on synthetic data."""
    from rtsds_tpu import cli

    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", _tiny_config(tmp_path), "--synthetic",
              "--model", "deeplab"])
    assert recorder.train_ended
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


@pytest.mark.slow
def test_cli_resume_continues_at_next_epoch(tmp_path, monkeypatch):
    """Train 1 epoch, bump config to 2 epochs, rerun with --resume: only
    the remaining epoch runs, from the restored state."""
    import yaml as _yaml

    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path, epochs=1)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])

    cfg = _yaml.safe_load(open(cfg_path))
    cfg["training"]["segmentation"]["epochs"] = 2
    open(cfg_path, "w").write(_yaml.safe_dump(cfg))

    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet",
              "--resume"])
    assert len(recorder.epoch_logs) == 1  # epoch 0 skipped, epoch 1 ran
    assert recorder.train_ended


@pytest.mark.slow
def test_cli_validate_only(tmp_path, capsys):
    """--validate_only restores the best checkpoint and reports mIoU
    without training; errors cleanly when no checkpoint exists."""
    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path, epochs=1)
    with pytest.raises(SystemExit, match="no checkpoint"):
        cli.main(["--config", cfg_path, "--synthetic", "--validate_only"])

    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])
    capsys.readouterr()
    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet",
              "--validate_only"])
    out = capsys.readouterr().out
    assert "validate_only: checkpoint step 0 -> validation_mIoU" in out


@pytest.mark.slow
def test_adversarial_smoke(tmp_path, monkeypatch):
    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path)
    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation",
              "--augmented"])

    assert recorder.train_ended
    keys = set(recorder.batch_logs[0].keys())
    assert {"loss_gen_source", "loss_adversarial", "loss_disc_source",
            "loss_disc_target"} <= keys
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


@pytest.mark.slow
def test_adversarial_v2_smoke(tmp_path, monkeypatch):
    """variant: v2 config dispatches the alternate loop semantics
    (train.py:322-500)."""
    from rtsds_tpu import cli

    cfg_path = _tiny_config(tmp_path, variant="v2")
    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
