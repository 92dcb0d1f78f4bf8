"""The docs/RUNBOOK.md drill, executed end-to-end in one chained test.

"Datasets appeared on disk" -> data.check (catches the RGB-coded GTA5
labels) -> convert_gta5 -> data.check green -> stage-0 supervised
baseline -> stage-1 adversarial DA (+EMA teacher) -> stage-2
self-training resumed from the stage-1 checkpoint (CBST calibration on
the restored teacher) -> --validate_only.  Every command in the runbook
maps to a step here, on the same miniature real-layout trees the other
non-synthetic e2e tests use (tests/realdata_fixtures.py).
"""

import numpy as np
import pytest
import yaml

from realdata_fixtures import make_cityscapes_tree, make_gta5_tree
from test_e2e import RecorderCallback


def _write_config(path, cs_dirs, gta5_dirs, ckpt_dir, da_extra=None,
                  decode_label_colors=False):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2, **cs_dirs},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2,
                              "decode_label_colors": decode_label_colors,
                              **gta5_dirs},
        },
        "training": {
            "segmentation": {"epochs": 1, "do_validation": 1},
            "domain_adaptation": {"epochs": 1, "iterations": 2,
                                  "do_validation": 1, **(da_extra or {})},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(ckpt_dir), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
        },
    }
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


@pytest.mark.slow
def test_runbook_drill(tmp_path, monkeypatch, capsys):
    from rtsds_tpu import cli
    from rtsds_tpu.data import check, convert_gta5

    cs = make_cityscapes_tree(str(tmp_path / "Cityscapes"))
    gta5_raw = make_gta5_tree(str(tmp_path / "GTA5_raw"), rgb_coded=True)

    # -- runbook step 1: data.check flags the RGB-coded labels ----------
    cfg_raw = _write_config(tmp_path / "raw.yaml", cs, gta5_raw,
                            tmp_path / "ckpt0")
    rc = check.main(["--config", cfg_raw])
    out = capsys.readouterr().out
    assert rc == 1
    assert "decode_label_colors" in out  # the actionable fix

    # -- step 2: pre-convert, then data.check is green -------------------
    dst = tmp_path / "GTA5_Modified"
    convert_gta5.main(["--src", str(tmp_path / "GTA5_raw"),
                       "--dst", str(dst), "--workers", "2"])
    gta5 = {"images_dir": str(dst / "images"),
            "segmentation_dir": str(dst / "labels")}
    cfg0 = _write_config(tmp_path / "stage0.yaml", cs, gta5,
                         tmp_path / "ckpt0")
    assert check.main(["--config", cfg0]) == 0
    capsys.readouterr()

    # -- step 3: stage 0 -- source-only supervised baseline --------------
    rec0 = _recording(monkeypatch)
    cli.main(["--config", cfg0, "--dataset", "gta5", "--model", "bisenet"])
    assert rec0.train_ended and rec0.val_logs
    assert all(np.isfinite(list(logs.values())).all()
               for logs in rec0.batch_logs)

    # -- step 4: stage 1 -- adversarial DA with the EMA mean-teacher -----
    cfg1 = _write_config(
        tmp_path / "stage1.yaml", cs, gta5, tmp_path / "ckpt1",
        da_extra={"ema": {"enabled": True, "decay": 0.99},
                  "entropy_min": {"enabled": True, "lambda": 0.005}})
    rec1 = _recording(monkeypatch)
    cli.main(["--config", cfg1, "--domain_adaptation"])
    assert rec1.train_ended
    assert {"loss_adversarial", "loss_disc_source"} <= set(
        rec1.batch_logs[0].keys())

    # -- step 5: stage 2 -- self-training resumed from the stage-1 teacher
    # resume continues the epoch counter: stage 1 completed epoch 0, so
    # stage 2 must raise `epochs` past the watermark or zero epochs run
    # (documented in the runbook)
    cfg2 = _write_config(
        tmp_path / "stage2.yaml", cs, gta5, tmp_path / "ckpt1",
        da_extra={"epochs": 2,
                  "ema": {"enabled": True, "decay": 0.99},
                  "self_training": {
                      "enabled": True, "lambda_pl": 1.0,
                      "calibration": {"enabled": True, "portion": 0.5,
                                      "batches": 2},
                      "classmix": {"enabled": True}}})
    rec2 = _recording(monkeypatch)
    capsys.readouterr()
    cli.main(["--config", cfg2, "--domain_adaptation", "--resume"])
    out = capsys.readouterr().out
    assert "thresholds" in out  # CBST calibration ran on the restored EMA
    assert rec2.train_ended
    assert "pl_coverage" in rec2.batch_logs[0]
    assert all(np.isfinite(list(logs.values())).all()
               for logs in rec2.batch_logs)

    # -- step 7: score the result -----------------------------------------
    capsys.readouterr()
    cli.main(["--config", cfg2, "--domain_adaptation", "--validate_only"])
    out = capsys.readouterr().out
    assert "validation_mIoU = " in out
