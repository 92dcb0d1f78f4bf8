"""Predictor serving path: shapes, padding/micro-batching, colorization."""

import numpy as np
import pytest

from rtsds_tpu.serve import Predictor


def test_predictor_shapes_and_padding(rng):
    p = Predictor(image_size=(32, 64), batch_size=2).warmup()
    frames = rng.integers(0, 255, size=(3, 32, 64, 3)).astype(np.uint8)
    masks = p.predict(frames)  # 3 > batch 2: chunked
    assert masks.shape == (3, 32, 64)
    assert masks.dtype == np.int32
    assert masks.min() >= 0 and masks.max() < 19

    single = p.predict(frames[0])
    assert single.shape == (32, 64)
    np.testing.assert_array_equal(single, masks[0])


def test_predictor_mesh_batch_and_spatial_match_single_device(rng):
    """Multi-chip serving: batch-sharded (throughput) and spatial-sharded
    (single-frame latency) predictors agree with the single-device one."""
    import jax

    from rtsds_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    frames = rng.integers(0, 255, size=(8, 32, 64, 3)).astype(np.uint8)
    # f32 compute: bf16 rounding differs across sharding reduction orders
    # and can flip argmax ties, which would make exact comparison flaky
    ref = Predictor(image_size=(32, 64), batch_size=8,
                    dtype=np.float32).predict(frames)

    mesh = make_mesh()
    p_batch = Predictor(image_size=(32, 64), batch_size=8,
                        dtype=np.float32, mesh=mesh, sharding="batch")
    np.testing.assert_array_equal(p_batch.predict(frames), ref)

    p_sp = Predictor(image_size=(32, 64), batch_size=8,
                     dtype=np.float32, mesh=mesh, sharding="spatial")
    masks = p_sp.predict(frames)
    agree = (masks == ref).mean()
    assert agree > 0.999, f"spatial-sharded masks diverge: {agree:.4f}"


@pytest.mark.slow
def test_predictor_mesh_validation(rng):
    import pytest

    from rtsds_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    with pytest.raises(ValueError, match="multiple"):
        Predictor(image_size=(32, 64), batch_size=3, mesh=mesh)
    with pytest.raises(ValueError, match="height"):
        Predictor(image_size=(36, 64), batch_size=8, mesh=mesh,
                  sharding="spatial")
    with pytest.raises(ValueError, match="sharding"):
        Predictor(image_size=(32, 64), batch_size=8, mesh=mesh,
                  sharding="nope")


def test_predictor_colored(rng):
    p = Predictor(image_size=(16, 32), batch_size=1)
    frame = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
    colored = p.predict_colored(frame)
    assert colored.shape == (16, 32, 3)
    assert colored.dtype == np.uint8


def test_predictor_protocols_degenerate_equal_plain(rng):
    """Serving protocols compile into the predictor: an ensemble of the
    single identity scale without flip and a sliding window covering the
    whole frame must both reproduce the plain forward exactly."""
    from rtsds_tpu.serve import Predictor

    frames = rng.integers(0, 255, size=(2, 32, 64, 3)).astype(np.uint8)
    plain = Predictor(image_size=(32, 64), batch_size=2, dtype=None)
    ens = Predictor(image_size=(32, 64), batch_size=2, dtype=None,
                    variables=plain.variables, protocol="ensemble",
                    protocol_kwargs={"scales": (1.0,), "flip": False})
    sld = Predictor(image_size=(32, 64), batch_size=2, dtype=None,
                    variables=plain.variables, protocol="sliding",
                    protocol_kwargs={"window": (32, 64)})
    ref = plain.predict(frames)
    np.testing.assert_array_equal(ens.predict(frames), ref)
    np.testing.assert_array_equal(sld.predict(frames), ref)

    import pytest

    with pytest.raises(ValueError, match="unknown serving protocol"):
        Predictor(image_size=(32, 64), protocol="nope")


def test_predictor_ensemble_protocol_multiscale_runs(rng):
    """A real multi-scale + flip ensemble predictor serves masks."""
    from rtsds_tpu.serve import Predictor

    p = Predictor(image_size=(32, 64), batch_size=1, dtype=None,
                  protocol="ensemble",
                  protocol_kwargs={"scales": (1.0, 2.0), "flip": True})
    frame = rng.integers(0, 255, size=(32, 64, 3)).astype(np.uint8)
    mask = p.predict(frame)
    assert mask.shape == (32, 64)
    assert mask.max() < 19


def test_mask_wire_format_uint8_device_int32_host(rng):
    """The serving program emits uint8 masks (4x less device->host
    traffic -- the measured tunnel bottleneck) while predict() keeps the
    int32 public contract; padding rows are sliced before the fetch."""
    import jax.numpy as jnp

    p = Predictor(image_size=(32, 64), batch_size=4, dtype=None)
    frames = rng.integers(0, 256, size=(1, 32, 64, 3)).astype(np.uint8)
    dev = p._predict(p.variables,
                     p._stage(np.zeros((4, 32, 64, 3), np.uint8)))
    assert dev.dtype == jnp.uint8
    masks = p.predict(frames)
    assert masks.dtype == np.int32 and masks.shape == (1, 32, 64)
    # streaming path honors the same contract
    stream = next(iter(p.predict_iter([frames])))
    assert stream.dtype == np.int32 and stream.shape == (1, 32, 64)


def test_predictor_rejects_classes_beyond_uint8_wire():
    """The uint8 mask wire format cannot represent ids > 255 — the
    constructor must refuse rather than silently wrap masks mod 256."""
    import pytest

    from rtsds_tpu.serve import Predictor

    with pytest.raises(ValueError, match="uint8"):
        Predictor(image_size=(32, 64), batch_size=1, num_classes=300)


def test_protocol_kwargs_from_flags_window_chunk():
    """The shared CLI flag parser forwards --window_chunk to the sliding
    protocol only when set (>0), and never leaks it into other
    protocols."""
    from rtsds_tpu.serve import protocol_kwargs_from_flags

    kw = protocol_kwargs_from_flags("sliding", window="64, 128",
                                    stride="32, 64", window_chunk=4)
    assert kw == {"window": (64, 128), "stride": (32, 64),
                  "window_chunk": 4}
    assert "window_chunk" not in protocol_kwargs_from_flags(
        "sliding", window="64, 128")
    assert protocol_kwargs_from_flags("ensemble", scales="1.0",
                                      window_chunk=4) == {"scales": (1.0,)}


def test_predictor_sliding_composes_with_mesh(rng):
    """Sliding protocol (batched-window schedule) x mesh sharding: the
    batch-sharded predictor is exact vs single device; spatial agrees up
    to halo-boundary argmax ties (same bar as the plain spatial test)."""
    import jax

    from rtsds_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    frames = rng.integers(0, 255, size=(8, 64, 64, 3)).astype(np.uint8)
    kw = dict(image_size=(64, 64), batch_size=8, dtype=np.float32,
              protocol="sliding",
              protocol_kwargs={"window": (32, 32), "stride": (16, 16)})
    ref = Predictor(**kw).predict(frames)

    mesh = make_mesh()
    p_batch = Predictor(**kw, mesh=mesh, sharding="batch")
    np.testing.assert_array_equal(p_batch.predict(frames), ref)

    p_sp = Predictor(**kw, mesh=mesh, sharding="spatial")
    agree = (p_sp.predict(frames) == ref).mean()
    assert agree > 0.999, f"spatial x sliding masks diverge: {agree:.4f}"
