"""Persistent compilation cache (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp
import pytest


def _restore_default_cache():
    """Re-point the cache singleton at the conftest-wide directory so
    later tests in this process don't write into a dead tmpdir."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()


def test_enable_compilation_cache_populates_dir(tmp_path):
    from rtsds_tpu.utils.compile_cache import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "xla-cache"))
    try:
        assert os.path.isdir(d)
        out = jax.jit(lambda x: x @ x.T * 1.2345)(jnp.ones((32, 48)))
        out.block_until_ready()
        assert any("cache" in name for name in os.listdir(d))
    finally:
        _restore_default_cache()


@pytest.mark.slow
def test_cli_consumes_compilation_cache_key(tmp_path):
    """config `compilation_cache:` turns the cache on inside cli.main."""
    import yaml

    from rtsds_tpu import cli

    cache = tmp_path / "cc"
    cfg = {
        "data": {
            "cityscapes": {"image_size": "16, 32", "batch_size": 2,
                           "num_workers": 1},
            "gta5_modified": {"image_size": "16, 32", "batch_size": 2,
                              "num_workers": 1},
        },
        "training": {"segmentation": {"epochs": 1, "do_validation": 0}},
        "callbacks": {},
        "compilation_cache": str(cache),
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    try:
        cli.main(["--config", str(path), "--synthetic", "--model", "bisenet"])
        assert cache.is_dir() and len(os.listdir(cache)) > 0
    finally:
        _restore_default_cache()
