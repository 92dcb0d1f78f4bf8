"""W8A8 post-training quantization for BiSeNet: fold exactness against
the flax serving model (incl. the split-form FFM and ARM gate folds),
calibration coverage, policy shape, and int8-vs-bf16 mask agreement
(``models/bisenet_int8.py`` over the shared ``ops/quant.py`` driver).

The reference has no quantization (torch fp32); this subsystem is a
TPU-native serving extension, so the tests gate OUR claims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.models.bisenet_int8 import (
    _structure,
    bisenet_bf16_apply,
    bisenet_int8_apply,
    build_quantized,
    calibrate,
    default_policy,
    fold_bisenet,
)

HW = (64, 128)


def _warmed_variables(model, x, n=3):
    """Init with train=True (so every param exists) and advance the
    running stats away from their trivial init (mean 0 / var 1), making
    the BN fold a real test."""
    variables = model.init(jax.random.key(0), x, train=True)
    for i in range(n):
        xi = 0.5 + 1.5 * jax.random.normal(jax.random.key(2 + i),
                                           x.shape, jnp.float32)
        _, mut = model.apply(variables, xi, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    return variables


@pytest.fixture(scope="module")
def tiny_bisenet():
    model = BiSeNet(num_classes=19, context_path="resnet18")
    x = jax.random.normal(jax.random.key(1), (2, *HW, 3), jnp.float32)
    return model, _warmed_variables(model, x), x


def test_folded_walk_matches_flax_model(tiny_bisenet):
    """The hand-written folded forward reproduces the flax BiSeNet
    serving forward (f32, running-stats BN, fast_head) -- the
    topology-parity gate for everything the quantized path reuses."""
    model, variables, x = tiny_bisenet
    ref = model.apply(variables, x, train=False)
    got = bisenet_bf16_apply(variables, x, dtype=jnp.float32,
                             output_f32=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fold_inventory(tiny_bisenet):
    """Every serving-time conv is folded exactly once; supervision heads
    (train-only) are excluded; the FFM kernel splits into 3 parts with
    the bias carried once."""
    _, variables, _ = tiny_bisenet
    folded = fold_bisenet(variables)
    # spatial 3 + stem 1 + resnet18 blocks (4+5+5+5) + ARMs 2
    # + FFM parts 3 + FFM gates 2 + final 1
    assert len(folded) == 3 + 1 + 19 + 2 + 3 + 2 + 1
    assert not any("supervision" in n for n in folded)
    assert folded["ffm/convblock:p0"][1] is not None
    assert folded["ffm/convblock:p1"][1] is None
    assert folded["ffm/convblock:p2"][1] is None
    # part widths: spatial 256 + context (256, 512) for resnet18
    assert folded["ffm/convblock:p0"][0].shape[2] == 256
    assert folded["ffm/convblock:p1"][0].shape[2] == 256
    assert folded["ffm/convblock:p2"][0].shape[2] == 512
    blocks, bottleneck = _structure(folded)
    assert blocks == [2, 2, 2, 2] and not bottleneck


def test_calibrate_covers_every_conv(tiny_bisenet):
    _, variables, x = tiny_bisenet
    scales = calibrate(variables, [x, x * 2.0])
    folded = fold_bisenet(variables)
    assert set(scales) == set(folded)
    assert all(s > 0 for s in scales.values())
    # doubling the input doubles (at least) the stem's observed max
    one = calibrate(variables, [x])
    assert scales["context_path/conv1"] >= \
        2.0 * one["context_path/conv1"] - 1e-9


def test_int8_masks_agree_with_bf16(tiny_bisenet):
    """PTQ gate: the quantized network's argmax masks agree with the
    bf16 baseline on nearly every pixel, and logits stay close."""
    _, variables, x = tiny_bisenet
    scales = calibrate(variables, [x])
    qtree = build_quantized(variables, scales)
    base = bisenet_bf16_apply(variables, x, output_f32=True)
    quant = bisenet_int8_apply(qtree, x, output_f32=True)

    rel = (np.linalg.norm(np.asarray(quant - base))
           / max(np.linalg.norm(np.asarray(base)), 1e-12))
    assert rel < 0.1, f"relative logits error {rel:.4f}"

    m_base = np.asarray(jnp.argmax(base, -1))
    m_quant = np.asarray(jnp.argmax(quant, -1))
    agreement = (m_base == m_quant).mean()
    assert agreement > 0.95, f"mask agreement {agreement:.4f}"


def test_default_policy_shape(tiny_bisenet):
    """The measured winner (1.249x at b48 @1024x2048): quantize every
    conv EXCEPT the two 3-channel input stems, the tiny pooled
    ARM/FFM-gate convs, and the final logits conv."""
    _, variables, x = tiny_bisenet
    scales = calibrate(variables, [x])
    qtree = build_quantized(variables, scales, policy=default_policy)
    q8, bf = qtree["q8"], qtree["bf16"]
    for name in ("context_path/layer1_0/conv1",
                 "context_path/layer2_0/conv1",
                 "context_path/layer4_1/conv2",
                 "spatial_path/convblock2", "spatial_path/convblock3",
                 "ffm/convblock:p0", "ffm/convblock:p2"):
        assert name in q8, name
    for name in ("context_path/conv1", "spatial_path/convblock1",
                 "arm1/conv", "arm2/conv",
                 "ffm/conv1", "ffm/conv2", "conv"):
        assert name in bf, name


def test_int8_apply_jits(tiny_bisenet):
    """One jit program over the qtree pytree (dict keys static, weights
    as arguments -- never constants)."""
    _, variables, x = tiny_bisenet
    scales = calibrate(variables, [x])
    qtree = build_quantized(variables, scales)
    fn = jax.jit(lambda q, x: jnp.argmax(bisenet_int8_apply(q, x), -1))
    m1 = fn(qtree, x)
    m2 = fn(qtree, x)
    assert m1.shape == (x.shape[0], *HW)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


@pytest.mark.slow
def test_predictor_int8_serving_bisenet():
    """Predictor(quantize='int8') serves BiSeNet through the quantized
    path: masks agree with the unquantized predictor (the round-2
    'rejected for bisenet' guard is gone -- e2e measurement overturned
    the microbench estimate)."""
    from rtsds_tpu.serve import Predictor

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(2, 64, 128, 3), dtype=np.uint8)
    calib = rng.randint(0, 255, size=(2, 64, 128, 3), dtype=np.uint8)

    base = Predictor(model_name="bisenet", image_size=(64, 128),
                     batch_size=2)
    quant = Predictor(model_name="bisenet", image_size=(64, 128),
                      batch_size=2, quantize="int8", calib_frames=calib)
    assert quant.quantize == "int8"
    m_base = base.predict(frames)
    m_quant = quant.predict(frames)
    assert m_quant.shape == m_base.shape and m_quant.dtype == np.int32
    agreement = (m_base == m_quant).mean()
    assert agreement > 0.9, f"mask agreement {agreement:.4f}"

    with pytest.raises(ValueError, match="calib_frames"):
        Predictor(model_name="bisenet", image_size=(64, 128),
                  quantize="int8")


@pytest.fixture(scope="module")
def trained_bisenet(tmp_path_factory):
    """A CLI-trained BiSeNet checkpoint on structured synthetic data
    (shared by the trained-model accuracy gates below — training once,
    gating thrice).  Mirrors the DeepLab fixture in
    ``test_quant.py:test_int8_miou_matches_bf16_on_trained_model``."""
    import yaml

    from rtsds_tpu import cli
    from rtsds_tpu.data.synthetic import SyntheticSegDataset

    tmp_path = tmp_path_factory.mktemp("bisenet_ckpt")
    # 64x128: the synthetic class blocks (h//8 x w//8 px) must be at
    # least as large as the model's /8 output granularity or the task
    # is structurally unresolvable; 10 epochs reaches ~0.54 val mIoU --
    # a genuinely peaked model (32x64/3-epoch runs plateau near chance)
    size = (64, 128)
    cfg = {
        "data": {
            "cityscapes": {"image_size": "64, 128", "batch_size": 4,
                           "num_classes": 5, "num_workers": 2},
            "gta5_modified": {"image_size": "64, 128", "batch_size": 4,
                              "num_classes": 5, "num_workers": 2},
            "correct_preprocessing": True,
            # learnable class->color mapping: the gate needs a genuinely
            # trained (peaked) model, not a near-chance one
            "synthetic": {"fixed_tints": True},
        },
        "meta": {"class_names": ["a", "b", "c", "d", "e"]},
        "model": {"bisenet": {"num_classes": 5,
                              "optimizer": {"name": "Adam", "lr": 0.005},
                              "criterion": {"name": "CrossEntropy"}}},
        "training": {
            "segmentation": {"num_classes": 5, "epochs": 10,
                             "do_validation": 1, "lr_decay_iter": 10**9},
            "domain_adaptation": {"epochs": 1, "iterations": 1,
                                  "do_validation": 1},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
        },
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cli.main(["--config", str(cfg_path), "--synthetic", "--model",
              "bisenet"])

    val_ds = SyntheticSegDataset(16, size, 5, seed=42 + 1,
                                 fixed_tints=True)
    frames = np.stack([val_ds[j][0] for j in range(16)])
    labels = np.stack([val_ds[j][1] for j in range(16)])
    return str(tmp_path / "ckpt" / "model"), frames, labels


def _miou_of_masks(masks, labels, num_classes=5):
    from rtsds_tpu.utils.metrics import fast_hist, per_class_iou

    hist = np.asarray(fast_hist(labels, masks, num_classes))
    return float(np.nanmean(np.asarray(per_class_iou(hist))))


@pytest.mark.slow
def test_int8_miou_matches_bf16_on_trained_model_bisenet(trained_bisenet):
    """The accuracy gate behind the 395-403 FPS int8 BiSeNet headline
    (VERDICT r4 weak #1): random-weight mask agreement cannot see
    calibration/clipping effects on a peaked trained distribution;
    scoring a CLI-trained checkpoint through BOTH serving paths can.
    The reference's accuracy instrument is ``validation.py:137-147``."""
    from rtsds_tpu.serve import Predictor

    ckpt_dir, frames, labels = trained_bisenet
    common = dict(model_name="bisenet", image_size=(64, 128), batch_size=4,
                  num_classes=5, correct_preprocessing=True)

    def miou(predictor):
        masks = np.concatenate([predictor.predict(frames[i:i + 4])
                                for i in range(0, 16, 4)])
        return _miou_of_masks(masks, labels)

    base = Predictor.from_checkpoint(ckpt_dir, **common)
    quant = Predictor.from_checkpoint(ckpt_dir, quantize="int8",
                                      calib_frames=frames[:4], **common)
    m_base, m_quant = miou(base), miou(quant)
    # trained-model gate: quantization costs (or gains) < 2 mIoU points
    assert abs(m_quant - m_base) < 0.02, (m_quant, m_base)
    print(f"\nbisenet trained-model mIoU: bf16 {m_base:.4f} "
          f"int8 {m_quant:.4f} (delta {m_quant - m_base:+.4f})")


@pytest.mark.slow
def test_int8_export_agreement_on_trained_model(trained_bisenet):
    """The quantized AOT export's known near-tie argmax flips were gated
    on random weights only (VERDICT r4 weak #6); on a trained model
    near-ties concentrate on class boundaries, where mIoU lives — gate
    the reloaded artifact's masks AND mIoU against the live int8 path."""
    import tempfile

    from rtsds_tpu.serve import Predictor
    from rtsds_tpu.serve_export import export_predictor, load_predictor

    ckpt_dir, frames, labels = trained_bisenet
    live = Predictor.from_checkpoint(
        ckpt_dir, model_name="bisenet", image_size=(64, 128), batch_size=4,
        num_classes=5, correct_preprocessing=True, quantize="int8",
        calib_frames=frames[:4])
    with tempfile.TemporaryDirectory() as td:
        aot = None
        export_predictor(live, f"{td}/q8.rtsds")
        aot = load_predictor(f"{td}/q8.rtsds")
        m_live = np.concatenate([live.predict(frames[i:i + 4])
                                 for i in range(0, 16, 4)])
        m_aot = np.concatenate([aot.predict(frames[i:i + 4])
                                for i in range(0, 16, 4)])
    agreement = (m_live == m_aot).mean()
    assert agreement > 0.95, f"AOT mask agreement {agreement:.4f}"
    miou_live = _miou_of_masks(m_live, labels)
    miou_aot = _miou_of_masks(m_aot, labels)
    assert abs(miou_aot - miou_live) < 0.02, (miou_aot, miou_live)


@pytest.mark.slow
def test_calibration_ablation_on_trained_model(trained_bisenet):
    """{max-abs, percentile} x {1, 4, 16 calibration frames}: every cell
    must hold the trained-model mIoU gate, measuring the calibration
    choice instead of assuming it (VERDICT r4 weak #2).  The table this
    prints is recorded in PERF.md."""
    import jax

    from rtsds_tpu.models.bisenet_int8 import (
        bisenet_bf16_apply as bf16_apply,
        bisenet_int8_apply as int8_apply,
        build_quantized,
        calibrate,
        default_policy,
        fold_bisenet,
    )
    from rtsds_tpu.ops.preprocess import normalize
    from rtsds_tpu.serve import load_checkpoint_variables

    ckpt_dir, frames, labels = trained_bisenet
    variables = load_checkpoint_variables(ckpt_dir)
    folded = fold_bisenet(variables)
    x = normalize(jnp.asarray(frames, jnp.float32), True)
    batches4 = [x[i:i + 4] for i in range(0, 16, 4)]

    base_fn = jax.jit(lambda v, x: jnp.argmax(
        bf16_apply(v, x, output_f32=True), -1))
    quant_fn = jax.jit(lambda q, x: jnp.argmax(
        int8_apply(q, x, output_f32=True), -1))
    m_base = _miou_of_masks(
        np.concatenate([np.asarray(base_fn(variables, b))
                        for b in batches4]), labels)

    rows = []
    for stat in ("max", "percentile"):
        for n_frames in (1, 4, 16):
            calib = ([x[:1]] if n_frames == 1
                     else batches4[:n_frames // 4])
            scales = calibrate(variables, calib, folded=folded, stat=stat)
            qtree = build_quantized(variables, scales,
                                    policy=default_policy, folded=folded)
            m = _miou_of_masks(
                np.concatenate([np.asarray(quant_fn(qtree, b))
                                for b in batches4]), labels)
            rows.append((stat, n_frames, m))
            assert abs(m - m_base) < 0.02, (stat, n_frames, m, m_base)

    print(f"\ncalibration ablation (bf16 mIoU {m_base:.4f}):")
    for stat, n, m in rows:
        print(f"  {stat:>10} n={n:>2}: mIoU {m:.4f} "
              f"(delta {m - m_base:+.4f})")


@pytest.mark.slow
def test_resnet101_fold_matches_flax():
    """The walk generalizes to the Bottleneck context path (BiSeNet-
    resnet101): structure detection + fold exactness."""
    model = BiSeNet(num_classes=19, context_path="resnet101")
    x = jax.random.normal(jax.random.key(5), (1, *HW, 3), jnp.float32)
    variables = _warmed_variables(model, x, n=1)
    folded = fold_bisenet(variables)
    blocks, bottleneck = _structure(folded)
    assert blocks == [3, 4, 23, 3] and bottleneck
    # FFM parts: spatial 256 + context (1024, 2048)
    assert folded["ffm/convblock:p1"][0].shape[2] == 1024
    assert folded["ffm/convblock:p2"][0].shape[2] == 2048
    ref = model.apply(variables, x, train=False)
    got = bisenet_bf16_apply(variables, x, dtype=jnp.float32,
                             output_f32=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
