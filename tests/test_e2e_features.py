"""CLI/config reachability of the beyond-parity training features
(VERDICT r2 weak #4): EMA, gradient accumulation, ensemble eval and
sliding-window eval must be drivable from the documented surface
(``python main.py --config ...``), not just the library API.
"""

import numpy as np
import pytest
import yaml

from test_e2e import RecorderCallback


def _config(tmp_path, extra=None):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "segmentation": {"epochs": 1, "do_validation": 1},
            "domain_adaptation": {"epochs": 1, "iterations": 2,
                                  "do_validation": 1},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
        },
    }
    if extra:
        for k, v in extra.items():
            node = cfg
            *parents, leaf = k.split(".")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = v
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _recording(monkeypatch):
    from rtsds_tpu import cli

    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    return recorder


def _assert_trained(recorder):
    assert recorder.train_ended
    assert recorder.batch_logs and recorder.val_logs
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0


@pytest.mark.slow
def test_cli_gradient_accumulation(tmp_path, monkeypatch):
    """training.segmentation.accumulate_steps=2: batch 2 splits into two
    micro-batches per optimizer step, through the real CLI."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path,
                  {"training.segmentation.accumulate_steps": 2})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
    _assert_trained(recorder)


def test_cli_accumulation_rejects_indivisible_batch(tmp_path):
    from rtsds_tpu import cli

    cfg = _config(tmp_path,
                  {"training.segmentation.accumulate_steps": 3})
    with pytest.raises(SystemExit, match="does not divide"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])


@pytest.mark.slow
def test_cli_ema(tmp_path, monkeypatch, capsys):
    """training.segmentation.ema.enabled: validation runs on the EMA
    weights through the real CLI, the EMA tree is checkpointed, and
    --validate_only reproduces the EMA-validated mIoU exactly (it would
    differ if only the raw params were stored)."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"training.segmentation.ema":
                             {"enabled": True, "decay": 0.9}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
    _assert_trained(recorder)

    capsys.readouterr()
    cli.main(["--config", cfg, "--synthetic", "--validate_only"])
    out = capsys.readouterr().out
    reported = float(out.split("validation_mIoU = ")[1].split()[0])
    best = max(logs["validation_mIoU"] for logs, _ in recorder.val_logs)
    np.testing.assert_allclose(reported, best, atol=1e-6)

    # resume restores the ema item (no 'items absent' fallback printed)
    cfg2 = _config(tmp_path, {"training.segmentation.ema":
                              {"enabled": True, "decay": 0.9},
                              "training.segmentation.epochs": 2})
    capsys.readouterr()
    cli.main(["--config", cfg2, "--synthetic", "--model", "bisenet",
              "--resume"])
    out = capsys.readouterr().out
    assert "Resuming from epoch 1" in out
    assert "items absent" not in out  # the ema item WAS in the checkpoint


@pytest.mark.slow
def test_cli_ensemble_validation(tmp_path, monkeypatch, capsys):
    """validation.ensemble: multi-scale+flip eval drives both the
    training validation pass and --validate_only -- and image-plot
    callbacks still receive predictions (the ensemble step supports
    return_preds like the default eval step)."""
    import glob

    from rtsds_tpu import cli

    cfg = _config(tmp_path, {
        "validation.ensemble": {"enabled": True, "scales": "1.0, 2.0",
                                "flip": True},
        "callbacks.images_plots": {"save_dir": str(tmp_path / "plots"),
                                   "number_of_samples": 2}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
    _assert_trained(recorder)
    assert glob.glob(str(tmp_path / "plots" / "**" / "*.png"),
                     recursive=True), "no validation plot images written"

    capsys.readouterr()
    cli.main(["--config", cfg, "--synthetic", "--validate_only"])
    out = capsys.readouterr().out
    assert "validate_only: checkpoint step" in out
    # the ensemble protocol must reproduce the training-time validation
    reported = float(out.split("validation_mIoU = ")[1].split()[0])
    best = max(logs["validation_mIoU"] for logs, _ in recorder.val_logs)
    np.testing.assert_allclose(reported, best, atol=1e-6)


@pytest.mark.slow
def test_cli_sliding_validation(tmp_path, monkeypatch):
    """validation.sliding: overlapping-window eval through the CLI."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"validation.sliding":
                             {"enabled": True, "window": "32, 32",
                              "stride": "16, 32"}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
    _assert_trained(recorder)


def test_cli_ensemble_and_sliding_mutually_exclusive(tmp_path):
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {
        "validation.ensemble": {"enabled": True},
        "validation.sliding": {"enabled": True}})
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])


@pytest.mark.slow
def test_cli_da_with_ensemble_validation(tmp_path, monkeypatch):
    """The DA loop's validation also honors the validation: protocol."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"validation.ensemble":
                             {"enabled": True, "scales": "1.0, 2.0"}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    assert recorder.val_logs


@pytest.mark.slow
def test_cli_da_ema(tmp_path, monkeypatch):
    """training.domain_adaptation.ema: mean-teacher EMA of the generator
    drives DA validation through the real CLI."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"training.domain_adaptation.ema":
                             {"enabled": True, "decay": 0.9}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    _assert_trained(recorder)


@pytest.mark.slow
def test_cli_da_deeplab_generator(tmp_path, monkeypatch):
    """adversarial_model.generator.name: deeplab (ours; the reference
    restricts DA to bisenet, main.py:172) drives the full DA loop from
    the CLI: fused step, validation, checkpoint."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {
        "model.adversarial_model.generator.name": "deeplab",
        "model.deeplab.num_classes": 19,
    })
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    _assert_trained(recorder)


@pytest.mark.slow
def test_cli_da_deeplab_generator_self_training(tmp_path, monkeypatch):
    """The second-generation DA techniques compose with the deeplab
    generator too: mean-teacher EMA + self-training pseudo-labels drive
    the full loop from the CLI."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {
        "model.adversarial_model.generator.name": "deeplab",
        "training.domain_adaptation.ema": {"enabled": True, "decay": 0.9},
        "training.domain_adaptation.self_training": {
            "enabled": True, "threshold": 0.5, "lambda_pl": 0.1},
    })
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    _assert_trained(recorder)
    assert any("pl_coverage" in logs for logs in recorder.batch_logs)
