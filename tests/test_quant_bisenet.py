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
