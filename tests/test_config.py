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


def test_null_callback_section_disables_it(tmp_path):
    """callbacks.<section>: null in the user YAML must DISABLE the
    default callback (the deep-merged defaults are otherwise impossible
    to turn off)."""
    import yaml

    from rtsds_tpu.cli import build_callbacks
    from rtsds_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "callbacks": {"model_checkpoint": None, "early_stopping": None,
                      "images_plots": None}}))
    cfg = load_config(str(p))
    callbacks, checkpoint = build_callbacks(cfg, use_wandb=False)
    assert checkpoint is None
    assert callbacks == []

    # defaults (no user override) still build checkpoint + early stopping
    cfg2 = load_config(None)
    callbacks2, checkpoint2 = build_callbacks(
        cfg2.replace(callbacks={"model_checkpoint":
                                {"save_dir": str(tmp_path / "ck"),
                                 "save_name": "m"}}), use_wandb=False)
    assert checkpoint2 is not None


def test_lint_flags_typoed_feature_switch():
    """The classic silent footgun: `enable:` instead of `enabled:` would
    leave the feature off with no error -- the linter must name it with
    a did-you-mean hint."""
    from rtsds_tpu.config import lint_config

    problems = lint_config({
        "training": {"domain_adaptation": {
            "entropy_min": {"enable": True}}}})
    assert len(problems) == 1
    assert "training.domain_adaptation.entropy_min.enable" in problems[0]
    assert "did you mean 'enabled'" in problems[0]


def test_lint_clean_configs():
    import yaml

    from rtsds_tpu.config import lint_config

    # our shipped config and the ACTUAL reference config both lint clean
    for path in ("configs/config.yaml", "/root/reference/config.yaml"):
        user = yaml.safe_load(open(path))
        assert lint_config(user) == [], path


def test_lint_allows_freeform_and_null_sections():
    from rtsds_tpu.config import lint_config

    assert lint_config({"callbacks": {
        "logging": {"wandb": {"anything": 1, "entity": "me"}},
        "history": {"path": "h.jsonl"},
        "model_checkpoint": None,  # null-disable
    }}) == []


def test_load_config_prints_warning_for_unknown_key(tmp_path, capsys):
    import yaml

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "training": {"segmentation": {"epohcs": 3}}}))
    load_config(str(p))
    out = capsys.readouterr().out
    assert "config warning: unknown key training.segmentation.epohcs" in out
    assert "did you mean 'epochs'" in out
