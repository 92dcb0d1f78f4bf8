"""Inference CLI smoke: ``python -m rtsds_tpu.serve`` writes mask PNGs."""

import numpy as np
from PIL import Image

from rtsds_tpu import serve


def test_serve_cli_writes_masks(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        p = tmp_path / f"frame{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    out = tmp_path / "out"
    serve.main([*paths, "--size", "32, 64", "--out", str(out)])
    for i in range(2):
        mask = np.asarray(Image.open(out / f"frame{i}_mask.png"))
        assert mask.shape == (32, 64)
        assert mask.max() < 19

    serve.main([paths[0], "--size", "32, 64", "--out", str(out),
                "--colored"])
    colored = np.asarray(Image.open(out / "frame0_color.png"))
    assert colored.shape == (32, 64, 3)


def test_predict_iter_matches_batch_predict():
    import jax.numpy as jnp  # noqa: F401
    from rtsds_tpu.serve import Predictor

    rng = np.random.default_rng(1)
    predictor = Predictor(image_size=(32, 64), batch_size=2, dtype=None)
    batches = [rng.integers(0, 256, size=(2, 32, 64, 3), dtype=np.uint8)
               for _ in range(3)]
    batches.append(rng.integers(0, 256, size=(1, 32, 64, 3),
                                dtype=np.uint8))  # ragged tail
    streamed = list(predictor.predict_iter(iter(batches)))
    assert len(streamed) == 4
    for got, frames in zip(streamed, batches):
        np.testing.assert_array_equal(got, predictor.predict(frames))


def test_export_with_images_also_predicts(tmp_path):
    """--export alongside image paths must export AND predict (previously
    the images were silently ignored after the export)."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    p = tmp_path / "frame.png"
    PILImage.fromarray(img).save(p)
    out = tmp_path / "out"
    artifact = tmp_path / "model.rtsds"
    serve.main([str(p), "--size", "32, 64", "--out", str(out),
                "--export", str(artifact)])
    assert artifact.exists()
    mask = np.asarray(Image.open(out / "frame_mask.png"))
    assert mask.shape == (32, 64)


def test_serve_cli_protocol_flags(tmp_path):
    """--protocol ensemble/sliding drive the serving protocols from the
    CLI surface."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    p = tmp_path / "f.png"
    Image.fromarray(img).save(p)
    out = tmp_path / "out"
    serve.main([str(p), "--size", "32, 64", "--out", str(out),
                "--protocol", "ensemble", "--scales", "1.0, 2.0"])
    assert np.asarray(Image.open(out / "f_mask.png")).shape == (32, 64)
    serve.main([str(p), "--size", "32, 64", "--out", str(out),
                "--protocol", "sliding", "--window", "32, 32",
                "--stride", "16, 32"])
    assert np.asarray(Image.open(out / "f_mask.png")).shape == (32, 64)


def test_serve_cli_mesh_modes(tmp_path):
    """--mesh batch|spatial serve across the 8 virtual devices from the
    CLI; masks land as usual."""
    rng = np.random.default_rng(1)
    paths = []
    for i in range(8):  # batch 8 shards the full 8-device mesh
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    out = tmp_path / "mesh_out"
    serve.main([*paths, "--size", "32, 64", "--out", str(out),
                "--mesh", "batch"])
    masks_mesh = [np.asarray(Image.open(out / f"f{i}_mask.png"))
                  for i in range(8)]
    out2 = tmp_path / "flat_out"
    serve.main([*paths, "--size", "32, 64", "--out", str(out2)])
    # the CLI serves bf16, where sharded reduction order can flip argmax
    # ties (random init + noise inputs = near-uniform logits, ties
    # everywhere; the f32 bit-exactness check lives in
    # test_serve.py) -- demand near-total agreement, not identity
    for i in range(8):
        flat = np.asarray(Image.open(out2 / f"f{i}_mask.png"))
        agree = (masks_mesh[i] == flat).mean()
        assert agree > 0.95, (i, agree)

    out3 = tmp_path / "spatial_out"
    serve.main([paths[0], "--size", "32, 64", "--out", str(out3),
                "--mesh", "spatial"])
    sp = np.asarray(Image.open(out3 / "f0_mask.png"))
    assert sp.shape == (32, 64) and sp.max() < 19


def test_serve_cli_mesh_rejects_aot(tmp_path):
    import pytest

    rng = np.random.default_rng(2)
    p = tmp_path / "x.png"
    Image.fromarray(rng.integers(0, 256, size=(32, 64, 3),
                                 dtype=np.uint8)).save(p)
    with pytest.raises(SystemExit):
        serve.main([str(p), "--mesh", "batch", "--artifact", "a.rtsds"])
    with pytest.raises(SystemExit):
        serve.main(["--mesh", "batch", "--export", str(tmp_path / "a.r")])


def test_serve_cli_quantize_flag(tmp_path):
    """--quantize int8 serves BOTH models through the W8A8 path,
    calibrating on the input images; misuse flags error out up front."""
    import pytest
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
    p = tmp_path / "frame.png"
    Image.fromarray(img).save(p)
    out = tmp_path / "out"

    serve.main([str(p), "--size", "32, 64", "--out", str(out),
                "--model", "deeplab", "--quantize", "int8"])
    mask = np.asarray(Image.open(out / "frame_mask.png"))
    assert mask.shape == (32, 64) and mask.max() < 19

    out2 = tmp_path / "out2"
    serve.main([str(p), "--size", "32, 64", "--out", str(out2),
                "--model", "bisenet", "--quantize", "int8"])
    mask = np.asarray(Image.open(out2 / "frame_mask.png"))
    assert mask.shape == (32, 64) and mask.max() < 19

    with pytest.raises(SystemExit):  # no images to calibrate on
        serve.main(["--size", "32, 64", "--model", "deeplab",
                    "--quantize", "int8",
                    "--export", str(tmp_path / "x.rtsds")])
