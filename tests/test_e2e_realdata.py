"""Non-synthetic end-to-end dress rehearsal through the real CLI.

Every other e2e run passes ``--synthetic``; these runs exercise the full
on-disk path the reference users actually take — real-layout dataset
trees (tests/realdata_fixtures.py), the Cityscapes/GTA5 index builders,
the native PNG batch decoder + threaded loader, host resizing, and (for
raw GTA5) the RGB->trainId decode wired via
``data.gta5_modified.decode_label_colors`` (the reference's
``in_getting_decoder``, ``/root/reference/datasets/gta5.py:51,66-70``).
"""

import numpy as np
import pytest
import yaml

from realdata_fixtures import make_cityscapes_tree, make_gta5_tree
from test_e2e import RecorderCallback


def _config(tmp_path, cs_dirs, gta5_dirs, decode_label_colors=False,
            epochs=1, iterations=2):
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
            "segmentation": {"epochs": epochs, "do_validation": 1},
            "domain_adaptation": {"epochs": epochs, "iterations": iterations,
                                  "do_validation": 1},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
        },
    }
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


@pytest.fixture(scope="module")
def trees(tmp_path_factory):
    root = tmp_path_factory.mktemp("realdata")
    return {
        "cs": make_cityscapes_tree(str(root / "Cityscapes")),
        "gta5": make_gta5_tree(str(root / "GTA5_Modified")),
        "gta5_rgb": make_gta5_tree(str(root / "GTA5_raw"), rgb_coded=True,
                                   seed=1),  # same seed: same label content
    }


@pytest.mark.slow
def test_supervised_bisenet_on_disk_then_validate_only(tmp_path, monkeypatch,
                                                       capsys, trees):
    """Real-layout Cityscapes tree -> CLI train (no --synthetic) ->
    --validate_only reproduces the checkpointed mIoU."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, trees["cs"], trees["gta5"], epochs=2)
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--model", "bisenet"])

    assert recorder.train_ended
    assert recorder.batch_logs and recorder.val_logs
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    best = max(logs["validation_mIoU"] for logs, _ in recorder.val_logs)

    capsys.readouterr()
    cli.main(["--config", cfg, "--validate_only"])
    out = capsys.readouterr().out
    assert "validate_only: checkpoint step" in out
    reported = float(out.split("validation_mIoU = ")[1].split()[0])
    np.testing.assert_allclose(reported, best, atol=1e-6)


@pytest.mark.slow
def test_supervised_deeplab_on_gta5_preconverted(tmp_path, monkeypatch,
                                                 trees):
    """--dataset gta5 --model deeplab over the pre-converted (trainId)
    GTA5 layout, validating on the Cityscapes tree."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, trees["cs"], trees["gta5"])
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--dataset", "gta5", "--model", "deeplab"])
    assert recorder.train_ended
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


@pytest.mark.slow
def test_adversarial_da_on_disk_with_rgb_coded_gta5(tmp_path, monkeypatch,
                                                    trees):
    """DA v1 with RAW (RGB color-coded) GTA5 labels: the
    decode_label_colors config key drives the load-time RGB->trainId
    remap through the native batch decoder."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, trees["cs"], trees["gta5_rgb"],
                  decode_label_colors=True)
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--domain_adaptation", "--augmented"])
    assert recorder.train_ended
    keys = set(recorder.batch_logs[0].keys())
    assert {"loss_gen_source", "loss_adversarial", "loss_disc_source",
            "loss_disc_target"} <= keys
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    assert recorder.val_logs


def test_rgb_coded_and_preconverted_trees_decode_identically(trees):
    """The rgb_coded fixture (same seed) decodes to EXACTLY the trainId
    maps of the pre-converted fixture -- proving the load-time remap, not
    just that training doesn't crash."""
    from rtsds_tpu.data.indexing import build_gta5_index
    from rtsds_tpu.data.pipeline import SegmentationDataset

    size = (40, 72)
    pre = SegmentationDataset(
        build_gta5_index(trees["gta5"]["images_dir"],
                         trees["gta5"]["segmentation_dir"]), size)
    raw = SegmentationDataset(
        build_gta5_index(trees["gta5_rgb"]["images_dir"],
                         trees["gta5_rgb"]["segmentation_dir"]), size,
        decode_label_colors=True)
    assert len(pre) == len(raw) > 0
    for i in range(len(pre)):
        img_p, lbl_p = pre[i]
        img_r, lbl_r = raw[i]
        np.testing.assert_array_equal(lbl_p, lbl_r)
        np.testing.assert_array_equal(img_p, img_r)
    # the batch (native C++) path agrees with the per-item path
    idxs = list(range(len(raw)))
    imgs_b, lbls_b = raw.load_batch(idxs)
    for i in idxs:
        np.testing.assert_array_equal(lbls_b[i], raw[i][1])
