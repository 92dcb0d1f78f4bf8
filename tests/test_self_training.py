"""Self-training (pseudo-label) DA: pseudo-label math, exact v1
equivalence at zero coverage, teacher isolation, fused mean-teacher
update, and CLI reachability (``training.domain_adaptation.self_training``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
from rtsds_tpu.train.adversarial import make_adversarial_step
from rtsds_tpu.train.ema import ema_init, ema_update
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.self_training import (
    make_self_training_step,
    pseudo_labels,
)
from rtsds_tpu.train.state import create_train_state
from test_train_steps import TinySeg, _da_batch


def _st_setup(key, lambda_=0.1, threshold=0.9, lambda_pl=1.0,
              ema_decay=0.9):
    kg, kd = jax.random.split(key)
    gen_state = create_train_state(TinySeg(), kg, jnp.zeros((2, 8, 8, 3)),
                                   make_optimizer("Adam", 0.05))
    dis = TinyDomainDiscriminator(num_classes=19)
    dis_state = create_train_state(dis, kd, jnp.zeros((2, 8, 8, 19)),
                                   make_optimizer("Adam", 0.05,
                                                  weight_decay=1e-4))
    step = make_self_training_step(
        lambda_=lambda_, iterations=4, threshold=threshold,
        lambda_pl=lambda_pl, ema_decay=ema_decay, donate=False)
    return gen_state, dis_state, ema_init(gen_state.params), step


def test_pseudo_labels_threshold_and_coverage():
    # 2 pixels: one confident (softmax ~0.95 on class 2), one uniform
    logits = jnp.array([[[[0.0, 0.0, 6.0, 0.0],
                          [0.0, 0.0, 0.0, 0.0]]]])  # (1, 1, 2, 4)
    labels, coverage = pseudo_labels(logits, threshold=0.9, ignore_index=7)
    assert labels.shape == (1, 1, 2)
    assert int(labels[0, 0, 0]) == 2
    assert int(labels[0, 0, 1]) == 7  # below threshold -> ignored
    np.testing.assert_allclose(float(coverage), 0.5)

    # threshold above 1: nothing passes
    labels, coverage = pseudo_labels(logits, threshold=1.1, ignore_index=7)
    assert np.all(np.asarray(labels) == 7)
    assert float(coverage) == 0.0


def test_pseudo_labels_per_class_thresholds():
    """CBST-style per-class bars: each pixel gated by its argmax class's
    threshold."""
    logits = jnp.array([[[[0.0, 0.0, 6.0, 0.0],     # class 2, conf ~0.993
                          [6.0, 0.0, 0.0, 0.0]]]])  # class 0, conf ~0.993
    thr = jnp.array([0.999, 0.5, 0.5, 0.5])  # class 0 gets a higher bar
    labels, coverage = pseudo_labels(logits, thr, ignore_index=7)
    assert int(labels[0, 0, 0]) == 2      # 0.993 >= 0.5 -> kept
    assert int(labels[0, 0, 1]) == 7      # 0.993 < 0.999 -> ignored
    np.testing.assert_allclose(float(coverage), 0.5)
    # scalar threshold keeps both
    labels, _ = pseudo_labels(logits, 0.5, ignore_index=7)
    assert int(labels[0, 0, 0]) == 2 and int(labels[0, 0, 1]) == 0


def test_step_accepts_per_class_threshold_vector(key, rng):
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, _ = _st_setup(key)
    from rtsds_tpu.train.self_training import make_self_training_step

    step = make_self_training_step(
        lambda_=0.1, iterations=4, threshold=jnp.full((19,), 0.0),
        donate=False)
    _, _, _, metrics = step(gen_state, dis_state, ema, src, lbl, tgt)
    np.testing.assert_allclose(float(metrics["pl_coverage"]), 1.0)


def test_zero_coverage_equals_plain_v1(key, rng):
    """threshold > 1 masks every pixel, so the pseudo-label CE is exactly
    zero and the G/D updates must be BIT-IDENTICAL to the plain v1 step
    on the same inputs -- the feature composes, never perturbs."""
    src, lbl, tgt = _da_batch(rng)

    st_gen, st_dis, ema, st_step = _st_setup(key, threshold=1.5)
    v1_step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                    variant="v1", donate=False)
    # same initial states for both paths (donate=False keeps them alive)
    g1, d1, _, _ = st_step(st_gen, st_dis, ema, src, lbl, tgt)
    g2, d2, _ = v1_step(st_gen, st_dis, src, lbl, tgt)

    for a, b in zip(jax.tree_util.tree_leaves(g1.params),
                    jax.tree_util.tree_leaves(g2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(d1.params),
                    jax.tree_util.tree_leaves(d2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_updates_all_three_and_reports_metrics(key, rng):
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, step = _st_setup(key, threshold=0.0)
    g0 = jax.tree_util.tree_leaves(gen_state.params)
    e0 = jax.tree_util.tree_leaves(ema)
    gen_state, dis_state, ema, metrics = step(gen_state, dis_state, ema,
                                              src, lbl, tgt)
    assert any(not np.allclose(a, b) for a, b in
               zip(g0, jax.tree_util.tree_leaves(gen_state.params)))
    assert any(not np.allclose(a, b) for a, b in
               zip(e0, jax.tree_util.tree_leaves(ema)))
    # threshold 0 keeps every pixel
    np.testing.assert_allclose(float(metrics["pl_coverage"]), 1.0)
    for k in ("loss_gen_source", "loss_adversarial", "loss_pseudo",
              "loss_disc_source", "loss_disc_target"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["loss_pseudo"]) > 0


def test_fused_ema_matches_manual_update(key, rng):
    """The in-step teacher update equals ema_update(old_ema, new_params)
    at the step's warmup decay."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, step = _st_setup(key, ema_decay=0.9)
    old_ema = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), ema)
    new_gen, _, new_ema, _ = step(gen_state, dis_state, ema, src, lbl, tgt)
    expected = ema_update(old_ema, new_gen.params, decay=0.9,
                          step=new_gen.step)
    for a, b in zip(jax.tree_util.tree_leaves(new_ema),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_teacher_gets_no_gradient(key, rng):
    """The teacher tree must only change through the EMA formula -- G/D
    optimizer updates never touch it: two steps from teachers that
    produce IDENTICAL pseudo-labels give identical G updates."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, step = _st_setup(key, threshold=1.5)
    # two different teachers, but threshold>1 makes their pseudo-labels
    # identical (all ignored); G update must not depend on teacher params
    ema2 = jax.tree_util.tree_map(lambda x: x + 1.0, ema)
    g1, _, _, _ = step(gen_state, dis_state, ema, src, lbl, tgt)
    g2, _, _, _ = step(gen_state, dis_state, ema2, src, lbl, tgt)
    for a, b in zip(jax.tree_util.tree_leaves(g1.params),
                    jax.tree_util.tree_leaves(g2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibration_exact_small_case():
    """Crafted two-population class: portion=0.5 keeps only the
    confident pixels, portion=1.0 keeps all."""
    from rtsds_tpu.train.self_training import calibrate_class_thresholds

    # 4 class-0 pixels: 3 confident (logit 6 -> conf .9926), 1 weak
    # (logit 1 -> conf .4750); class 1 never predicted
    logits = jnp.array([[[[6.0, 0, 0, 0], [6.0, 0, 0, 0]],
                         [[6.0, 0, 0, 0], [1.0, 0, 0, 0]]]])

    def apply_fn(variables, images, train=False):
        return logits

    batches = [jnp.zeros((1, 2, 2, 3))]
    thr = calibrate_class_thresholds(apply_fn, {}, batches, 4, portion=0.5,
                                     bins=512)
    assert thr.shape == (4,)
    assert 0.475 < thr[0] <= 0.9926  # keeps the 3 confident, drops the weak
    labels, coverage = pseudo_labels(logits, thr, ignore_index=7)
    np.testing.assert_allclose(float(coverage), 0.75)
    # unpredicted classes get the cap
    np.testing.assert_allclose(thr[1:], 0.999)
    # portion=1.0 keeps everything
    thr_all = calibrate_class_thresholds(apply_fn, {}, batches, 4,
                                         portion=1.0, bins=512)
    _, coverage = pseudo_labels(logits, thr_all, ignore_index=7)
    np.testing.assert_allclose(float(coverage), 1.0)


def test_calibration_coverage_tracks_portion(key, rng):
    """On random teacher logits, applying the calibrated thresholds keeps
    roughly the requested portion of pixels."""
    from rtsds_tpu.train.self_training import calibrate_class_thresholds

    gen_state, _, ema, _ = _st_setup(key)
    variables = {"params": ema}
    if gen_state.batch_stats is not None:
        variables["batch_stats"] = gen_state.batch_stats
    imgs = [jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
            for _ in range(3)]
    for portion in (0.3, 0.7):
        thr = calibrate_class_thresholds(gen_state.apply_fn, variables,
                                         imgs, 19, portion=portion)
        logits = gen_state.apply_fn(variables, imgs[0], train=False)
        _, coverage = pseudo_labels(logits, thr, ignore_index=19)
        # quantiles computed over 3 batches, applied to 1: loose band
        assert portion - 0.2 <= float(coverage) <= portion + 0.2, \
            (portion, float(coverage))


def test_requires_ignore_index():
    with pytest.raises(ValueError, match="ignore_index"):
        make_self_training_step(lambda_=0.1, iterations=4,
                                ignore_index=None)


# ---------------------------------------------------------------------------
# CLI reachability


def _st_config(tmp_path, extra=None):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "domain_adaptation": {
                "epochs": 1, "iterations": 2, "do_validation": 1,
                "ema": {"enabled": True, "decay": 0.99},
                "self_training": {"enabled": True, "threshold": 0.5,
                                  "lambda_pl": 0.5},
            },
        },
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
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_cli_self_training_da(tmp_path, monkeypatch):
    """self_training.enabled drives the fused pseudo-label step through
    the real CLI: loss_pseudo/pl_coverage appear in the batch logs and
    the run validates + checkpoints (incl. the ema item)."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    cfg = _st_config(tmp_path)
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    assert recorder.batch_logs
    last = recorder.batch_logs[-1]
    assert "loss_pseudo" in last and "pl_coverage" in last
    assert 0.0 <= last["pl_coverage"] <= 1.0
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0
    # the ema (teacher) item is checkpointed alongside G and D
    # (layout: ckpt/<save_name>_da/<step>/{generator,discriminator,ema})
    ckpt_root = tmp_path / "ckpt"
    items = {p.name for p in ckpt_root.rglob("*") if p.is_dir()}
    assert {"generator", "discriminator", "ema"} <= items


@pytest.mark.slow
def test_cli_self_training_calibration(tmp_path, monkeypatch, capsys):
    """calibration.enabled derives CBST per-class thresholds from the
    teacher before the fused step is built, through the real CLI."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    cfg = _st_config(tmp_path, {
        "training.domain_adaptation.self_training.calibration": {
            "enabled": True, "portion": 0.6, "batches": 2}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    out = capsys.readouterr().out
    assert "self-training calibration (portion=0.6)" in out
    last = recorder.batch_logs[-1]
    assert "loss_pseudo" in last and "pl_coverage" in last


def test_cli_self_training_requires_ema(tmp_path):
    from rtsds_tpu import cli

    cfg = _st_config(tmp_path, {
        "training.domain_adaptation.ema": {"enabled": False}})
    with pytest.raises(SystemExit, match="mean-teacher"):
        cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])


def test_cli_per_class_threshold_count_validated(tmp_path):
    from rtsds_tpu import cli

    cfg = _st_config(tmp_path, {
        "training.domain_adaptation.self_training": {
            "enabled": True, "threshold": "0.9, 0.8"}})  # 19 expected
    with pytest.raises(SystemExit, match="one value per"):
        cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])


def test_cli_self_training_rejects_v2(tmp_path):
    from rtsds_tpu import cli

    cfg = _st_config(tmp_path, {
        "training.domain_adaptation.variant": "v2"})
    with pytest.raises(SystemExit, match="v1"):
        cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
