"""Knowledge distillation (``train/distill.py``): KL math, alpha=1
supervised equivalence, teacher checkpoint loading (ema preference),
learning signal, and CLI reachability
(``training.segmentation.distillation``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from rtsds_tpu.train.distill import (
    distillation_kl,
    load_teacher_variables,
    make_distill_step,
)
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step
from test_train_steps import TinySeg


def _setup(key, num_classes=19, **kwargs):
    ks, kt = jax.random.split(key)
    student = create_train_state(TinySeg(num_classes), ks,
                                 jnp.zeros((2, 8, 8, 3)),
                                 make_optimizer("Adam", 0.05))
    teacher = create_train_state(TinySeg(num_classes), kt,
                                 jnp.zeros((2, 8, 8, 3)),
                                 make_optimizer("Adam", 0.05))
    t_vars = {"params": teacher.params}
    if teacher.batch_stats is not None:
        t_vars["batch_stats"] = teacher.batch_stats
    step = make_distill_step(teacher.apply_fn, donate=False, **kwargs)
    return student, teacher, t_vars, step


def _batch(rng, num_classes=19):
    images = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, num_classes, size=(2, 8, 8)).astype(np.int32))
    return images, labels


def test_kl_zero_when_equal(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 19)).astype(np.float32))
    np.testing.assert_allclose(
        float(distillation_kl(logits, logits, temperature=3.0)), 0.0,
        atol=1e-6)


def test_kl_matches_manual_formula(rng):
    s = rng.normal(size=(1, 2, 2, 5)).astype(np.float32)
    t = rng.normal(size=(1, 2, 2, 5)).astype(np.float32)
    T = 2.5

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p_t, p_s = softmax(t / T), softmax(s / T)
    want = (p_t * (np.log(p_t) - np.log(p_s))).sum(-1).mean() * T * T
    np.testing.assert_allclose(
        float(distillation_kl(jnp.asarray(s), jnp.asarray(t), T)), want,
        rtol=1e-5)


def test_alpha_one_equals_supervised(key, rng):
    """alpha=1 zeroes the KD term: the post-step student matches the plain
    supervised step exactly (the teacher contributes nothing)."""
    student, _, t_vars, step = _setup(key, alpha=1.0)
    images, labels = _batch(rng)
    sup_step = make_train_step(ignore_index=19, donate=False)

    got, m1 = step(student, t_vars, images, labels)
    want, m2 = sup_step(student, images, labels)
    np.testing.assert_allclose(float(m1["loss_ce"]),
                               float(m2["train_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got.params),
                    jax.tree_util.tree_leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_teacher_variables_untouched(key, rng):
    student, _, t_vars, step = _setup(key, alpha=0.3)
    images, labels = _batch(rng)
    before = jax.tree_util.tree_map(np.array, t_vars)
    step(student, t_vars, images, labels)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(t_vars)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_distill_loss_decreases(key, rng):
    """Pure distillation (alpha=0): the student's KL against a fixed
    teacher drops over repeated steps on the same batch."""
    student, _, t_vars, step = _setup(key, alpha=0.0)
    images, labels = _batch(rng)
    first = None
    for _ in range(15):
        student, metrics = step(student, t_vars, images, labels)
        if first is None:
            first = float(metrics["loss_distill"])
    assert float(metrics["loss_distill"]) < 0.5 * first


def test_load_teacher_variables(tmp_path, key):
    from rtsds_tpu.callbacks.checkpoint import CheckpointManager

    state = create_train_state(TinySeg(4), key, jnp.zeros((1, 8, 8, 3)),
                               make_optimizer("Adam", 0.05))
    ema_params = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    mgr = CheckpointManager(str(tmp_path / "t"))
    mgr.save(1, {"model": state, "ema": {"params": ema_params}},
             monitor=0.5)
    mgr.close()

    got = load_teacher_variables(str(tmp_path / "t"))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(ema_params)[0]))
    assert "batch_stats" in got

    raw = load_teacher_variables(str(tmp_path / "t"), use_ema=False)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(raw["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))

    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        load_teacher_variables(str(tmp_path / "empty"))


# ---------------------------------------------------------------------------
# CLI reachability


def _cfg(tmp_path, extra=None, name="config.yaml"):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {"segmentation": {"epochs": 1, "do_validation": 1}},
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
    path = tmp_path / name
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_cli_distillation(tmp_path, monkeypatch):
    """Two-run workflow through the real CLI: train a teacher, then train
    a student with distillation.teacher.checkpoint_dir pointing at it —
    loss_distill appears in the batch logs and the run validates."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    # run 1: the teacher (bisenet keeps the smoke cheap; the config key
    # supports deeplab identically)
    teacher_cfg = _cfg(tmp_path, {
        "callbacks.model_checkpoint.save_dir": str(tmp_path / "teacher")},
        name="teacher.yaml")
    cli.main(["--config", teacher_cfg, "--synthetic", "--model", "bisenet"])

    # run 2: the student distills from it
    student_cfg = _cfg(tmp_path, {
        "training.segmentation.distillation": {
            "enabled": True, "temperature": 2.0, "alpha": 0.5,
            "teacher": {"model": "bisenet",
                        "checkpoint_dir": str(tmp_path / "teacher" /
                                              "model")}}},
        name="student.yaml")
    recorder = _recording(monkeypatch)
    cli.main(["--config", student_cfg, "--synthetic", "--model", "bisenet"])
    assert recorder.train_ended
    last = recorder.batch_logs[-1]
    assert "loss_distill" in last and "loss_ce" in last
    assert np.isfinite(last["loss_distill"])
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0


def test_cli_distillation_requires_checkpoint_dir(tmp_path):
    from rtsds_tpu import cli

    cfg = _cfg(tmp_path, {
        "training.segmentation.distillation": {"enabled": True}})
    with pytest.raises(SystemExit, match="checkpoint_dir"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])


def test_cli_distillation_rejects_accumulation(tmp_path):
    from rtsds_tpu import cli

    cfg = _cfg(tmp_path, {
        "training.segmentation.accumulate_steps": 2,
        "training.segmentation.distillation": {
            "enabled": True,
            "teacher": {"checkpoint_dir": str(tmp_path / "x")}}})
    with pytest.raises(SystemExit, match="accumulate"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
