"""Training-history JSONL recorder (callbacks/history.py)."""

import numpy as np
import pytest
import yaml

from rtsds_tpu.callbacks.history import HistoryCallback, read_history


def test_history_records_events(tmp_path):
    path = tmp_path / "runs" / "h.jsonl"  # parent dir auto-created
    cb = HistoryCallback(str(path))
    cb.on_train_begin()
    cb.on_epoch_end(0, {"train_loss": 1.5, "train_accuracy": 40.0})
    cb.on_validation_end({"validation_mIoU": 0.25},
                         data=[("road", 0.5), ("sky", float("nan"))])
    cb.on_epoch_end(1, {"train_loss": 1.0})
    cb.on_validation_end({"validation_mIoU": 0.30})
    cb.on_train_end()

    events = read_history(str(path))
    kinds = [e["event"] for e in events]
    assert kinds == ["train_begin", "epoch", "validation", "epoch",
                     "validation", "train_end"]
    assert events[1]["train_loss"] == 1.5 and events[1]["epoch"] == 0
    val0 = events[2]
    assert val0["validation_mIoU"] == 0.25 and val0["epoch"] == 0
    assert val0["per_class_iou"]["road"] == 0.5
    assert val0["per_class_iou"]["sky"] is None  # NaN -> null, valid JSON
    assert events[4]["epoch"] == 1
    # appending across separate callback instances (resume) keeps history
    cb2 = HistoryCallback(str(path))
    cb2.on_epoch_end(2, {"train_loss": 0.5})
    assert len(read_history(str(path))) == 7


@pytest.mark.slow
def test_cli_writes_history(tmp_path, monkeypatch):
    from rtsds_tpu import cli

    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {"segmentation": {"epochs": 1, "do_validation": 1}},
        "callbacks": {
            "history": {"path": str(tmp_path / "history.jsonl")},
        },
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.main(["--config", str(cfg_path), "--synthetic", "--model",
              "bisenet"])

    events = read_history(str(tmp_path / "history.jsonl"))
    kinds = {e["event"] for e in events}
    assert {"epoch", "validation", "train_end"} <= kinds
    epoch = next(e for e in events if e["event"] == "epoch")
    assert np.isfinite(epoch["train_loss"])
    val = next(e for e in events if e["event"] == "validation")
    assert 0.0 <= val["validation_mIoU"] <= 1.0
    assert "per_class_iou" in val


def test_nonfinite_metrics_serialize_as_strict_json_null(tmp_path):
    """NaN/Inf must become null so jq/browsers (RFC-8259 parsers) can read
    the file; Python's default json.dumps would emit bare NaN tokens."""
    import json

    path = tmp_path / "h.jsonl"
    cb = HistoryCallback(str(path))
    cb.on_epoch_end(0, logs={"loss": float("nan"), "lr": float("inf"),
                             "ok": 1.5})

    def reject(tok):  # strict parser: NaN/Infinity tokens are an error
        raise ValueError(f"non-RFC-8259 token {tok}")

    with open(path) as f:
        [rec] = [json.loads(line, parse_constant=reject) for line in f]
    assert rec["loss"] is None and rec["lr"] is None and rec["ok"] == 1.5
