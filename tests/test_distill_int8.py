"""int8-quantized KD teacher (``train/distill.py:quantize_teacher``).

The frozen distillation teacher is a pure eval-mode inference repeated
every train step — the exact profile the W8A8 PTQ serving path was
measured on — so ``distillation.teacher.quantize: int8`` runs it through
``ops/quant.py``.  These tests gate OUR claims: the quantized teacher's
soft targets must stay close to the bf16 teacher's (rel-norm + mask
agreement + KD-loss agreement), the fused step must train against the
qtree, and the config knob must reach the step through the real CLI.
The reference has no distillation or quantization (torch fp32 only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from rtsds_tpu.models.deeplabv2 import DeepLabV2
from rtsds_tpu.train.distill import (
    distillation_kl,
    make_distill_step,
    quantize_teacher,
)
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from test_train_steps import TinySeg

LAYERS = (1, 1, 1, 1)
HW = (32, 64)


@pytest.fixture(scope="module")
def teacher():
    """Tiny DeepLab teacher with non-trivial running stats (the BN fold
    under the PTQ path is exercised against real statistics)."""
    model = DeepLabV2(num_classes=19, layers=LAYERS)
    x = jax.random.normal(jax.random.key(1), (2, *HW, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    for i in range(3):
        xi = 0.5 + 1.5 * jax.random.normal(jax.random.key(2 + i),
                                           x.shape, jnp.float32)
        _, mut = model.apply(variables, xi, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    return model, dict(variables), x


def test_quantized_teacher_soft_targets_close(teacher):
    """The int8 teacher's logits/masks/soft-target KL agree with the
    full-precision teacher — the gate for distilling from it."""
    model, variables, x = teacher
    apply_fn, qtree = quantize_teacher("deeplab", variables, [x])
    base = np.asarray(model.apply(variables, x, train=False),
                      np.float32)
    quant = np.asarray(apply_fn(qtree, x), np.float32)

    rel = np.linalg.norm(quant - base) / max(np.linalg.norm(base), 1e-12)
    assert rel < 0.1, f"relative logits error {rel:.4f}"
    agreement = (base.argmax(-1) == quant.argmax(-1)).mean()
    assert agreement > 0.95, f"mask agreement {agreement:.4f}"

    # the KD target itself: KL(teacher_int8 || student) tracks
    # KL(teacher_bf16 || student) for an arbitrary student
    student = jax.random.normal(jax.random.key(7), base.shape)
    kl_b = float(distillation_kl(student, jnp.asarray(base)))
    kl_q = float(distillation_kl(student, jnp.asarray(quant)))
    assert abs(kl_q - kl_b) / max(abs(kl_b), 1e-12) < 0.05, (kl_q, kl_b)


def test_distill_step_trains_against_qtree(teacher):
    """The fused KD step runs with the quantized teacher: loss finite
    and close to the bf16-teacher loss; the qtree is never touched."""
    model, variables, x = teacher
    apply_fn, qtree = quantize_teacher("deeplab", variables, [x])
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 19, size=(2, *HW)).astype(np.int32))

    def run(teacher_apply, t_vars):
        state = create_train_state(TinySeg(19), jax.random.key(3),
                                   jnp.zeros((2, *HW, 3)),
                                   make_optimizer("SGD", 0.05))
        step = make_distill_step(teacher_apply, donate=False)
        state, metrics = step(state, t_vars, x, labels)
        return state, {k: float(v) for k, v in metrics.items()}

    before = jax.tree.map(np.asarray, qtree)
    _, m_q = run(apply_fn, qtree)
    _, m_b = run(model.apply, variables)
    assert np.isfinite(m_q["train_loss"])
    assert abs(m_q["loss_distill"] - m_b["loss_distill"]) \
        / max(abs(m_b["loss_distill"]), 1e-12) < 0.05, (m_q, m_b)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        a, np.asarray(b)), before, qtree)


def test_quantize_teacher_unknown_model(teacher):
    _, variables, x = teacher
    with pytest.raises(ValueError, match="int8 teacher"):
        quantize_teacher("resnet", variables, [x])


def _cfg(tmp_path, extra, name):
    from test_distill import _cfg as base_cfg

    return base_cfg(tmp_path, extra, name=name)


@pytest.mark.slow
def test_cli_distillation_int8_teacher(tmp_path, monkeypatch):
    """teacher.quantize: int8 through the real CLI: train a teacher,
    distill a student from its QUANTIZED form — loss_distill appears and
    the run validates."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    teacher_cfg = _cfg(tmp_path, {
        "callbacks.model_checkpoint.save_dir": str(tmp_path / "teacher")},
        name="teacher.yaml")
    cli.main(["--config", teacher_cfg, "--synthetic", "--model", "bisenet"])

    student_cfg = _cfg(tmp_path, {
        "training.segmentation.distillation": {
            "enabled": True, "temperature": 2.0, "alpha": 0.5,
            "teacher": {"model": "bisenet", "quantize": "int8",
                        "calib_batches": 1,
                        "checkpoint_dir": str(tmp_path / "teacher" /
                                              "model")}}},
        name="student.yaml")
    recorder = _recording(monkeypatch)
    cli.main(["--config", student_cfg, "--synthetic", "--model", "bisenet"])
    assert recorder.train_ended
    last = recorder.batch_logs[-1]
    assert "loss_distill" in last and np.isfinite(last["loss_distill"])
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0


def test_cli_rejects_unknown_quantize(tmp_path):
    from rtsds_tpu import cli

    cfg = _cfg(tmp_path, {
        "training.segmentation.distillation": {
            "enabled": True,
            "teacher": {"quantize": "int4",
                        "checkpoint_dir": str(tmp_path / "x")}}},
        name="bad.yaml")
    with pytest.raises(SystemExit, match="quantize"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])


def test_cli_rejects_bad_calib_batches(tmp_path):
    from rtsds_tpu import cli

    cfg = _cfg(tmp_path, {
        "training.segmentation.distillation": {
            "enabled": True,
            "teacher": {"quantize": "int8", "calib_batches": 0,
                        "checkpoint_dir": str(tmp_path / "x")}}},
        name="bad2.yaml")
    with pytest.raises(SystemExit, match="calib_batches"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
