"""Pipeline parallelism (GPipe schedule over a 'pipe' mesh axis): the
pipelined result must be identical to applying the blocks sequentially."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.parallel.mesh import make_mesh
from rtsds_tpu.parallel.pipeline import pipeline_apply, stack_block_params


def _pipe_mesh(n):
    return make_mesh(jax.devices()[:n], axis_name="pipe")


def test_pipeline_matmul_blocks_match_sequential(rng):
    n_blocks, feat = 8, 16
    params = [jnp.asarray(rng.normal(scale=0.3, size=(feat, feat))
                          .astype(np.float32)) for _ in range(n_blocks)]
    x = jnp.asarray(rng.normal(size=(8, feat)).astype(np.float32))
    block_fn = lambda p, h: jnp.tanh(h @ p)  # noqa: E731

    ref = x
    for p in params:
        ref = block_fn(p, ref)

    stacked = stack_block_params(params)
    for n_stages, n_micro in [(4, None), (4, 8), (2, 4), (8, 8)]:
        out = pipeline_apply(block_fn, stacked, x, _pipe_mesh(n_stages),
                             num_microbatches=n_micro)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"stages={n_stages} M={n_micro}")


def test_pipeline_residual_conv_blocks(rng):
    """The DeepLab-layer3 shape: homogeneous residual conv blocks."""
    n_blocks, c = 4, 8
    params = [{
        "kernel": jnp.asarray(rng.normal(scale=0.1, size=(3, 3, c, c))
                              .astype(np.float32)),
        "bias": jnp.asarray(rng.normal(scale=0.1, size=(c,))
                            .astype(np.float32)),
    } for _ in range(n_blocks)]
    x = jnp.asarray(rng.normal(size=(8, 8, 12, c)).astype(np.float32))

    def block_fn(p, h):
        y = jax.lax.conv_general_dilated(
            h, p["kernel"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        return h + jnp.maximum(y, 0.0)

    ref = x
    for p in params:
        ref = block_fn(p, ref)

    out = pipeline_apply(block_fn, stack_block_params(params), x,
                         _pipe_mesh(4), num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_real_deeplab_layer3_blocks(key, rng):
    """Pipeline the ACTUAL model blocks: DeepLabV2's dilated layer3
    bottlenecks (deeplabv2.py:82-83 in the reference; 22 homogeneous
    blocks at full depth) are the natural pipeline stage unit.  A reduced
    9-block layer3 gives 8 homogeneous (non-projection) blocks -> 4
    stages x 2 blocks; the pipelined result must equal running the same
    blocks sequentially."""
    from rtsds_tpu.models.deeplabv2 import DeepLabV2
    from rtsds_tpu.models.resnet import Bottleneck

    model = DeepLabV2(num_classes=19, layers=(1, 1, 9, 1))
    x_img = jnp.asarray(rng.normal(size=(1, 65, 129, 3)).astype(np.float32))
    variables = model.init(key, x_img, train=False)

    block = Bottleneck(features=256, stride=1, dilation=2, downsample=False,
                       stride_in_1x1=True)
    names = [f"layer3_{i}" for i in range(1, 9)]
    block_vars = [{
        "params": variables["params"][n],
        "batch_stats": variables["batch_stats"][n],
    } for n in names]

    def block_fn(p, h):
        return block.apply(p, h, False)

    # a realistic layer3 input: 1024 channels at 1/8 resolution
    h = jnp.asarray(rng.normal(size=(8, 8, 16, 1024)).astype(np.float32))
    ref = h
    for p in block_vars:
        ref = block_fn(p, ref)

    out = pipeline_apply(block_fn, stack_block_params(block_vars), h,
                         _pipe_mesh(4), num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_validation(rng):
    feat = 4
    stacked = stack_block_params(
        [jnp.zeros((feat, feat)) for _ in range(3)])
    x = jnp.zeros((4, feat))
    block_fn = lambda p, h: h @ p  # noqa: E731
    with pytest.raises(ValueError, match="split over"):
        pipeline_apply(block_fn, stacked, x, _pipe_mesh(2))
    stacked4 = stack_block_params(
        [jnp.zeros((feat, feat)) for _ in range(4)])
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(block_fn, stacked4, x, _pipe_mesh(2),
                       num_microbatches=3)
