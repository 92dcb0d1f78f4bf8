"""The shipped configs/config.yaml must load and drive both factory paths
(guards against schema drift in the default config)."""

import os

import jax.numpy as jnp

from rtsds_tpu.config import load_config, parse_int_list
from rtsds_tpu.train.factory import build_adversarial, build_supervised

SHIPPED = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "config.yaml")


def test_shipped_config_loads():
    cfg = load_config(SHIPPED)
    assert parse_int_list(cfg.data["cityscapes"]["image_size"]) == [512, 1024]
    assert parse_int_list(cfg.data["gta5_modified"]["image_size"]) == [720, 1280]
    assert cfg.training["domain_adaptation"]["variant"] == "v1"
    assert len(cfg.meta["class_names"]) == 19


def test_shipped_config_builds_bundles(key):
    cfg = load_config(SHIPPED)
    bundle = build_supervised(cfg, "bisenet", steps_per_epoch=5)
    state = bundle.init_state(key, jnp.zeros((1, 32, 64, 3)))
    assert state.params
    gen_b, dis_b = build_adversarial(cfg)
    dis_state = dis_b.init_state(key, jnp.zeros((1, 32, 64, 19)))
    assert dis_state.params
