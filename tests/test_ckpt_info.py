"""Checkpoint inspection CLI (``python -m rtsds_tpu.ckpt_info``)."""

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.callbacks.checkpoint import CheckpointManager
from rtsds_tpu.ckpt_info import describe_checkpoint, format_report, main


def _make_ckpts(tmp_path):
    d = str(tmp_path / "m_da")
    mgr = CheckpointManager(d)
    states = {"generator": {"params": {"w": jnp.ones((2,))}},
              "discriminator": {"params": {"w": jnp.zeros((2,))}}}
    mgr.save(0, states, monitor=0.25)
    mgr.save(2, states, monitor=0.5)
    mgr.close()
    return d


def test_describe_checkpoint(tmp_path):
    d = _make_ckpts(tmp_path)
    info = describe_checkpoint(d)
    assert [r["step"] for r in info["steps"]] == [0, 2]
    assert info["best_step"] == 2 and info["latest_step"] == 2
    assert info["emergency_step"] is None
    row = info["steps"][0]
    assert row["items"] == ["discriminator", "generator"]
    np.testing.assert_allclose(row["monitor"], 0.25)


def test_emergency_marker_reported(tmp_path):
    d = _make_ckpts(tmp_path)
    (tmp_path / "m_da" / "EMERGENCY").write_text("2")
    info = describe_checkpoint(d)
    assert info["emergency_step"] == 2
    report = format_report(d, info)
    assert "EMERGENCY(mid-epoch)" in report
    assert "best" in report and "latest" in report


def test_cli_main_and_root_descend(tmp_path, capsys):
    _make_ckpts(tmp_path)
    # exact directory
    assert main([str(tmp_path / "m_da")]) == 0
    out = capsys.readouterr().out
    assert "step    0" in out and "step    2" in out
    assert "monitor=  0.5000" in out
    assert "items=[discriminator, generator]" in out
    # run root: descends into children that hold checkpoints
    assert main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "m_da" in out and "step    2" in out
    # empty dir: exit 1
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main([str(empty)]) == 1
