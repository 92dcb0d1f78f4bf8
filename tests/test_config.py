"""Config loader: reference-schema YAML round trip (main.py:272-282,
config.yaml:2-152)."""

import textwrap

from rtsds_tpu.config import default_config, load_config, parse_float_list, parse_int_list


def test_defaults_cover_reference_schema():
    cfg = default_config()
    # the access patterns main.py actually uses must all work
    assert cfg.data.get("cityscapes")["num_classes"] == 19
    assert cfg.model["bisenet"]["backbone"] == "resnet18"
    assert cfg.model.get("adversarial_model").get("generator")["name"] == "bisenet"
    assert cfg.training["domain_adaptation"]["iterations"] == 100
    assert len(cfg.meta["class_names"]) == 19
    assert "GaussianBlur" in cfg.augmentation.keys()
    assert cfg.callbacks.get("logging")["wandb"]["project_name"]


def test_yaml_override(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(textwrap.dedent("""
        data:
          cityscapes:
            batch_size: 8
            image_size: 256, 512
        training:
          domain_adaptation:
            epochs: 2
    """))
    cfg = load_config(str(p))
    assert cfg.data["cityscapes"]["batch_size"] == 8
    assert parse_int_list(cfg.data["cityscapes"]["image_size"]) == [256, 512]
    assert cfg.training["domain_adaptation"]["epochs"] == 2
    # untouched defaults survive the merge
    assert cfg.training["domain_adaptation"]["iterations"] == 100
    assert cfg.data["gta5_modified"]["batch_size"] == 4


def test_comma_string_parsers():
    assert parse_int_list("512, 1024") == [512, 1024]
    assert parse_int_list([720, 1280]) == [720, 1280]
    assert parse_float_list("0.1, 5") == [0.1, 5.0]


def test_asdict_and_replace():
    cfg = default_config()
    d = cfg._asdict()
    assert isinstance(d, dict) and "model" in d
    cfg2 = cfg.replace(device="cpu")
    assert cfg2.device == "cpu"
    assert cfg.device == "tpu"  # original untouched
