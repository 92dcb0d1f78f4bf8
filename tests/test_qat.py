"""QAT fine-tuning over the W8A8 serving grid (``train/qat.py``).

The contract: the fake-quant forward sees EXACTLY the serving path's
quantization grid (so what the fine-tune optimizes is what serving
runs), gradients flow through the STEs, the tuned weights re-export
onto the real int8 path, and :func:`writeback` returns a standard flax
checkpoint whose eval forward is unchanged.  The reference has no
quantization (torch fp32 only); the recovery gate at the bottom is this
extension's reason to exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.deeplabv2 import DeepLabV2
from rtsds_tpu.ops.quant import (
    fake_quant_act,
    fake_quant_kernel,
    quantize_act,
    quantize_kernel,
)
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.qat import (
    create_qat_state,
    export_int8,
    prepare_qat,
    writeback,
)
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step

HW, NC = (32, 64), 5
LAYERS = (1, 1, 1, 1)


def _deeplab(seed=0):
    model = DeepLabV2(num_classes=NC, layers=LAYERS)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, *HW, 3)),
                           train=False)
    return model, variables


def test_fake_quant_kernel_matches_serving_grid():
    kernel = jax.random.normal(jax.random.key(1), (3, 3, 8, 16))
    w_q, w_scale = quantize_kernel(kernel)
    fq = fake_quant_kernel(kernel)
    np.testing.assert_allclose(np.asarray(fq),
                               np.asarray(w_q.astype(jnp.float32) * w_scale),
                               rtol=0, atol=1e-6)
    # STE: gradients pass straight through (exact -- nothing saturates
    # when the scale tracks the live per-channel max)
    grads = jax.grad(lambda k: jnp.sum(fake_quant_kernel(k)))(kernel)
    np.testing.assert_allclose(np.asarray(grads), 1.0, rtol=0, atol=1e-6)


def test_fake_quant_act_matches_grid_and_clips_gradient():
    scale = 0.05
    x = jnp.asarray([-10.0, -0.3, -0.024, 0.0, 0.026, 0.3, 10.0])
    fq = fake_quant_act(x, scale)
    served = quantize_act(x, scale).astype(jnp.float32) * scale
    np.testing.assert_allclose(np.asarray(fq), np.asarray(served),
                               rtol=0, atol=1e-6)
    # clipped STE: identity gradient inside the representable range
    # (|x| <= 127*scale = 6.35), zero on saturated values
    grads = jax.grad(lambda x: jnp.sum(fake_quant_act(x, scale)))(x)
    np.testing.assert_allclose(np.asarray(grads),
                               [0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
                               rtol=0, atol=1e-6)


def test_qat_forward_matches_real_int8_path():
    """The fake-quant (f32, differentiable) and real int8 (MXU grid)
    forwards compute the same function up to accumulation dtype --
    near-total argmax agreement."""
    _, variables = _deeplab()
    x = jax.random.uniform(jax.random.key(2), (2, *HW, 3))
    prep = prepare_qat("deeplab", variables, [x])
    from rtsds_tpu.train.qat import make_qat_apply

    fake = make_qat_apply(prep)({"params": prep.folded}, x)
    int8_apply, qtree = export_int8(prep)
    real = int8_apply(qtree, x)
    agree = np.mean(np.asarray(jnp.argmax(fake, -1))
                    == np.asarray(jnp.argmax(real, -1)))
    assert agree > 0.95, f"fake/real argmax agreement {agree:.3f}"


def test_qat_step_trains_every_conv():
    """One supervised step through the UNCHANGED train step factory
    moves both quantized and bf16-policy kernels (gradients flow through
    the STEs and the plain convs alike)."""
    _, variables = _deeplab()
    x = jax.random.uniform(jax.random.key(3), (2, *HW, 3))
    labels = jax.random.randint(jax.random.key(4), (2, *HW), 0, NC)
    prep = prepare_qat("deeplab", variables, [x])
    assert prep.quant_names and any(
        name not in prep.quant_names for name in prep.folded)

    state = create_qat_state(prep, make_optimizer("Adam", 1e-3))
    step = make_train_step(ignore_index=19, donate=False)
    new_state, metrics = step(state, x, labels)
    assert np.isfinite(float(metrics["train_loss"]))
    quant_name = sorted(prep.quant_names)[0]
    bf16_name = sorted(set(prep.folded) - prep.quant_names)[0]
    for name in (quant_name, bf16_name):
        before = np.asarray(prep.folded[name][0])
        after = np.asarray(new_state.params[name][0])
        assert np.abs(after - before).max() > 0, name


@pytest.mark.parametrize("model_name", ["deeplab", "bisenet"])
def test_writeback_roundtrip(model_name):
    """fold(writeback(vars, folded)) == folded (the BN identity is
    exact), and the flax EVAL forward of the written-back checkpoint
    equals the original model's."""
    if model_name == "deeplab":
        from rtsds_tpu.models.deeplab_int8 import fold_deeplab

        model, variables = _deeplab()
        folded_fn = fold_deeplab
    else:
        from rtsds_tpu.models.bisenet import BiSeNet
        from rtsds_tpu.models.bisenet_int8 import fold_bisenet

        model = BiSeNet(num_classes=NC, context_path="resnet18")
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, *HW, 3)), train=False)
        folded_fn = fold_bisenet

    folded = folded_fn(variables)
    wb = writeback(model_name, variables, folded)
    refolded = folded_fn(wb)
    assert set(refolded) == set(folded)
    for name in folded:
        for a, b in zip(folded[name], refolded[name]):
            if a is None:
                assert b is None
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6, err_msg=name)

    x = jax.random.uniform(jax.random.key(5), (2, *HW, 3))
    orig = model.apply(variables, x, train=False)
    back = model.apply(wb, x, train=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(orig),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_qat_recovers_damaged_ptq():
    """The tool's reason to exist: deliberately damage PTQ (60th-
    percentile activation calibration clips hard), measure the mIoU
    drop ON THE REAL INT8 PATH, recover it with a short QAT fine-tune
    against that damaged grid, and verify the recovery survives the
    write-back round trip (re-fold + re-calibrate + re-export, exactly
    what serving a written-back checkpoint does).

    Margins pinned UNDER THIS TEST ENV (8 virtual CPU devices — see the
    round-5 CLAUDE.md trap).  Observed (seeds 0/1/2): f32 0.658/0.651/
    0.642; damaged int8 0.497/0.519/0.528 (drop 0.115-0.161); QAT int8
    0.624/0.650/0.632 (recovers >75% of the drop, lands within 0.035 of
    f32); the sidecar-grid write-back reproduces the QAT mIoU exactly,
    while RE-CALIBRATING the write-back at pct=60 lands erratically at
    0.623/0.547/0.610."""
    from rtsds_tpu.data.synthetic import SyntheticSegDataset
    from rtsds_tpu.ops.preprocess import normalize
    from rtsds_tpu.utils.metrics import fast_hist, per_class_iou

    HW2, NC2 = (64, 128), 5
    train_ds = SyntheticSegDataset(16, HW2, NC2, seed=42, fixed_tints=True)
    val_ds = SyntheticSegDataset(8, HW2, NC2, seed=43, fixed_tints=True)
    tr_i = np.stack([train_ds[j][0] for j in range(16)])
    tr_l = np.stack([train_ds[j][1] for j in range(16)])
    ev_i = np.stack([val_ds[j][0] for j in range(8)])
    ev_l = np.stack([val_ds[j][1] for j in range(8)])
    xtr = normalize(jnp.asarray(tr_i, jnp.float32), True)
    xev = normalize(jnp.asarray(ev_i, jnp.float32), True)
    ltr = jnp.asarray(tr_l)

    def miou(logits):
        pred = np.asarray(jnp.argmax(logits, -1))
        hist = np.asarray(fast_hist(ev_l, pred, NC2))
        return float(np.nanmean(np.asarray(per_class_iou(hist))))

    # 1. a converged float model (the bn_eval-gate training recipe)
    model = DeepLabV2(num_classes=NC2, layers=LAYERS)
    from rtsds_tpu.train.state import create_train_state as _cts

    state = _cts(model, jax.random.key(0), jnp.zeros((4, *HW2, 3)),
                 make_optimizer("Adam", 0.005))
    step = make_train_step(ignore_index=19, donate=False)
    for i in range(200):
        b = (i * 4) % 16
        state, _ = step(state, xtr[b:b + 4], ltr[b:b + 4])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    miou_f32 = miou(model.apply(variables, xev, train=False))

    # 2. damaged PTQ: hard-clipped activation scales hurt, measurably
    prep = prepare_qat("deeplab", variables, [xtr[:4], xtr[4:8]],
                       calib_stat="percentile", calib_percentile=60.0)
    int8_apply, qtree = export_int8(prep)
    miou_damaged = miou(int8_apply(qtree, xev))
    assert miou_damaged < miou_f32 - 0.08, (miou_f32, miou_damaged)

    # 3. QAT fine-tune against that exact damaged grid
    qstate = create_qat_state(prep, make_optimizer("Adam", 5e-4))
    qstep = make_train_step(ignore_index=19, donate=False)
    for i in range(150):
        b = (i * 4) % 16
        qstate, _ = qstep(qstate, xtr[b:b + 4], ltr[b:b + 4])
    _, qtree_tuned = export_int8(prep, folded=qstate.params)
    miou_qat = miou(int8_apply(qtree_tuned, xev))
    assert miou_qat > miou_damaged + 0.06, (miou_damaged, miou_qat)
    assert miou_qat > miou_f32 - 0.06, (miou_f32, miou_qat)

    # 4. the recovery survives write-back + the SIDECAR grid: re-fold
    # the standard flax checkpoint and re-export with the exact scales
    # the fine-tune trained against -- what from_checkpoint
    # (quantize='int8') serves via qat_act_scales.json.  Deterministic:
    # the identity-BN refold is exact, so the mIoU reproduces.
    # (Re-CALIBRATING at the damaged percentile instead re-clips the
    # same probability mass of the ADAPTED activations and can re-apply
    # the damage -- measured 0.547 recalibrated vs 0.650 sidecar on
    # seed 1.  That measurement is why the sidecar design exists.)
    from rtsds_tpu.models.deeplab_int8 import fold_deeplab

    wb = writeback("deeplab", variables, qstate.params)
    refolded = fold_deeplab(wb)
    _, qtree_wb = export_int8(prep, folded=refolded)
    miou_wb = miou(int8_apply(qtree_wb, xev))
    assert abs(miou_wb - miou_qat) < 1e-9, (miou_qat, miou_wb)


def test_qat_cli_end_to_end(tmp_path, capsys):
    """``python -m rtsds_tpu.qat`` over a real fixture tree: fine-tune a
    checkpoint for a few steps, write the serving checkpoint, and serve
    it through the UNCHANGED Predictor surface (the write-back product
    claim)."""
    import json

    from realdata_fixtures import make_cityscapes_tree

    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.qat import main
    from rtsds_tpu.serve import Predictor

    dirs = make_cityscapes_tree(str(tmp_path / "cs"), n_train=4, n_val=1,
                                disk_size=(48, 96))
    model = BiSeNet(num_classes=19, context_path="resnet18",
                    output_f32=False)
    state = create_train_state(model, jax.random.key(0),
                               jnp.zeros((1, *HW, 3)),
                               make_optimizer("Adam", 0.01))
    from rtsds_tpu.callbacks.checkpoint import CheckpointManager

    ckpt = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt)
    mgr.save(1, {"model": state}, monitor=0.5)
    mgr.close()

    out = str(tmp_path / "ckpt_qat")
    main(["--checkpoint_dir", ckpt, "--images", dirs["images_train_dir"],
          "--labels", dirs["segmentation_train_dir"], "--out", out,
          "--model", "bisenet", "--size", f"{HW[0]}, {HW[1]}",
          "--batch", "2", "--steps", "3", "--lr", "1e-4",
          "--calib_batches", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["steps"] == 3 and stats["quantized_convs"] > 0
    assert np.isfinite(stats["final_loss"])

    # the written-back checkpoint serves through every standard surface
    p = Predictor.from_checkpoint(out, model_name="bisenet",
                                  image_size=HW, batch_size=2)
    frames = np.zeros((2, *HW, 3), np.uint8)
    masks = p.predict(frames)
    assert masks.shape == (2, *HW)

    # ... and the int8 surface picks up the QAT scales sidecar: no
    # calib_frames needed, the served grid is the tuned one
    import os

    from rtsds_tpu.train.qat import SCALES_SIDECAR

    assert os.path.isfile(stats["scales_sidecar"])
    assert os.path.basename(stats["scales_sidecar"]) == SCALES_SIDECAR
    q = Predictor.from_checkpoint(out, model_name="bisenet",
                                  image_size=HW, batch_size=2,
                                  quantize="int8")
    masks_q = q.predict(frames)
    assert masks_q.shape == (2, *HW)

    # wrong-topology scales must fail loudly, not silently serve bf16
    with pytest.raises(ValueError, match="do not match"):
        Predictor(model_name="bisenet", image_size=HW, batch_size=1,
                  quantize="int8", act_scales={"not/a/conv": 0.1})

    # ... and so must a PARTIAL dict (e.g. a trimmed/stale sidecar):
    # build_quantized quietly serves any uncovered conv in bf16, so
    # missing coverage is silent int8-grid degradation, not an option
    from rtsds_tpu.train.qat import load_act_scales

    scales, _meta = load_act_scales(out)
    partial = dict(list(scales.items())[:-1])
    with pytest.raises(ValueError, match="missing convs"):
        Predictor(model_name="bisenet", image_size=HW, batch_size=1,
                  quantize="int8", act_scales=partial)

    # use_qat_scales=False (CLI --recalibrate) really ignores the
    # sidecar: calib_frames becomes required again...
    with pytest.raises(ValueError, match="calib_frames"):
        Predictor.from_checkpoint(out, model_name="bisenet",
                                  image_size=HW, batch_size=2,
                                  quantize="int8", use_qat_scales=False)
    # ... and with frames given, the recalibrated predictor serves
    q2 = Predictor.from_checkpoint(out, model_name="bisenet",
                                   image_size=HW, batch_size=2,
                                   quantize="int8", use_qat_scales=False,
                                   calib_frames=frames)
    assert q2.predict(frames).shape == (2, *HW)
