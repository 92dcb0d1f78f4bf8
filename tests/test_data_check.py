"""Dataset layout validator (``python -m rtsds_tpu.data.check``)."""

import yaml

from realdata_fixtures import make_cityscapes_tree, make_gta5_tree
from rtsds_tpu.data.check import check_cityscapes, check_gta5, main


def _levels(findings):
    return [f["level"] for f in findings]


def test_cityscapes_clean_tree_passes(tmp_path):
    cfg = make_cityscapes_tree(str(tmp_path))
    cfg["num_classes"] = 19
    findings = check_cityscapes(cfg, "train")
    assert "ERROR" not in _levels(findings)
    assert any("paired samples" in f["message"] for f in findings)


def test_missing_directory_is_an_error(tmp_path):
    cfg = make_cityscapes_tree(str(tmp_path))
    cfg["images_train_dir"] = str(tmp_path / "nope")
    findings = check_cityscapes(dict(cfg, num_classes=19), "train")
    assert _levels(findings) == ["ERROR"]
    assert "images_train_dir" in findings[0]["message"]


def test_gta5_rgb_labels_without_decode_flag_is_an_error(tmp_path):
    cfg = make_gta5_tree(str(tmp_path), rgb_coded=True)
    cfg["num_classes"] = 19
    cfg["decode_label_colors"] = False
    findings = check_gta5(cfg)
    errors = [f for f in findings if f["level"] == "ERROR"]
    assert errors and "decode_label_colors" in errors[0]["message"]
    # with the flag on the same tree is clean
    cfg["decode_label_colors"] = True
    findings = check_gta5(cfg)
    assert "ERROR" not in _levels(findings)


def test_gta5_trainid_labels_with_decode_flag_warns(tmp_path):
    cfg = make_gta5_tree(str(tmp_path), rgb_coded=False)
    cfg["num_classes"] = 19
    cfg["decode_label_colors"] = True
    findings = check_gta5(cfg)
    warns = [f for f in findings if f["level"] == "WARN"]
    assert warns and "decode_label_colors" in warns[0]["message"]


def test_cli_main_exit_codes(tmp_path, capsys):
    cs = make_cityscapes_tree(str(tmp_path / "cs"))
    gta = make_gta5_tree(str(tmp_path / "gta"))
    cfg = {"data": {"cityscapes": {**cs, "num_classes": 19},
                    "gta5_modified": {**gta, "num_classes": 19}}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    assert main(["--config", str(p)]) == 0
    out = capsys.readouterr().out
    assert "0 error(s)" in out

    # a broken path fails with exit 1 and names the config key
    cfg["data"]["gta5_modified"]["images_dir"] = str(tmp_path / "missing")
    p.write_text(yaml.safe_dump(cfg))
    assert main(["--config", str(p), "--dataset", "gta5"]) == 1
    out = capsys.readouterr().out
    assert "images_dir" in out and "1 error(s)" in out
