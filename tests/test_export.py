"""AOT serving-artifact export/load roundtrip (serve_export.py).

The artifact must reproduce the live Predictor's masks exactly on the
same backend, carry its metadata, and serve without any rtsds model code
on the loading side (only jax + the file).
"""

import numpy as np
import pytest

from rtsds_tpu.serve import Predictor
from rtsds_tpu.serve_export import (
    ExportedPredictor,
    export_predictor,
    load_predictor,
)

SIZE = (64, 128)


@pytest.fixture(scope="module")
def predictor():
    # f32 compute: argmax is then deterministic across lowering variants
    # (bf16 + symbolic-shape lowering can flip near-tied classes)
    import jax.numpy as jnp

    return Predictor(model_name="bisenet", image_size=SIZE, batch_size=2,
                     num_classes=19, dtype=jnp.float32)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, *SIZE, 3), dtype=np.uint8)


def test_export_roundtrip_exact(tmp_path, predictor):
    path = export_predictor(predictor, str(tmp_path / "m.rtsds"),
                            platforms=("cpu",), batch=2)
    ep = load_predictor(path)
    assert isinstance(ep, ExportedPredictor)
    assert ep.image_size == SIZE
    assert ep.meta["model"] == "BiSeNet"

    frames = _frames(2)
    np.testing.assert_array_equal(ep.predict(frames),
                                  predictor.predict(frames))


def test_export_dynamic_batch(tmp_path, predictor):
    path = export_predictor(predictor, str(tmp_path / "dyn.rtsds"),
                            platforms=("cpu",), batch="dynamic")
    ep = load_predictor(path)
    for n in (1, 2, 5):
        frames = _frames(n, seed=n)
        masks = ep.predict(frames)
        assert masks.shape == (n, *SIZE)
        np.testing.assert_array_equal(masks, predictor.predict(frames))
    # single-frame convenience path
    one = ep.predict(_frames(1)[0])
    assert one.shape == SIZE


def test_static_batch_pads_and_chunks(tmp_path, predictor):
    path = export_predictor(predictor, str(tmp_path / "b2.rtsds"),
                            platforms=("cpu",), batch=2)
    ep = load_predictor(path)
    frames = _frames(5, seed=7)  # 2 + 2 + 1(pad)
    np.testing.assert_array_equal(ep.predict(frames),
                                  predictor.predict(frames))


def test_serve_cli_export_and_artifact_inference(tmp_path):
    """`python -m rtsds_tpu.serve --export` then serving from --artifact."""
    from PIL import Image

    from rtsds_tpu import serve

    art = str(tmp_path / "model.rtsds")
    serve.main(["--size", "64, 128", "--export", art])
    assert (tmp_path / "model.rtsds").stat().st_size > 0

    img = tmp_path / "frame.png"
    Image.fromarray(_frames(1, seed=3)[0]).save(str(img))
    serve.main([str(img), "--artifact", art, "--out", str(tmp_path)])
    mask = np.asarray(Image.open(str(tmp_path / "frame_mask.png")))
    assert mask.shape == SIZE
    assert mask.max() < 19


def test_wrong_size_and_bad_magic(tmp_path, predictor):
    path = export_predictor(predictor, str(tmp_path / "m.rtsds"),
                            platforms=("cpu",), batch=2)
    ep = load_predictor(path)
    with pytest.raises(ValueError, match="compiled for"):
        ep.predict(np.zeros((1, 32, 32, 3), np.uint8))
    bad = tmp_path / "bad.rtsds"
    bad.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="artifact"):
        load_predictor(str(bad))
    trunc = tmp_path / "trunc.rtsds"
    trunc.write_bytes(b"RTSDS1\n\x09")  # valid magic, truncated header
    with pytest.raises(ValueError, match="truncated"):
        load_predictor(str(trunc))


def test_export_roundtrip_with_ensemble_protocol(tmp_path):
    """The serving protocol is baked into predictor._predict, so AOT
    export of an ensemble predictor carries the whole protocol into the
    artifact (multi-scale + flip in one StableHLO program)."""
    predictor = Predictor(model_name="bisenet", image_size=SIZE,
                          batch_size=2, num_classes=19, dtype=None,
                          protocol="ensemble",
                          protocol_kwargs={"scales": (1.0, 2.0),
                                           "flip": True})
    path = export_predictor(predictor, str(tmp_path / "ens.rtsds"),
                            platforms=("cpu",), batch=2)
    ep = load_predictor(path)
    frames = _frames(2, seed=3)
    np.testing.assert_array_equal(ep.predict(frames),
                                  predictor.predict(frames))


def test_export_meta_records_protocol(tmp_path):
    predictor = Predictor(model_name="bisenet", image_size=SIZE,
                          batch_size=2, num_classes=19, dtype=None,
                          protocol="sliding",
                          protocol_kwargs={"window": SIZE})
    path = export_predictor(predictor, str(tmp_path / "s.rtsds"),
                            platforms=("cpu",), batch=2)
    ep = load_predictor(path)
    assert ep.meta["protocol"] == "sliding"
