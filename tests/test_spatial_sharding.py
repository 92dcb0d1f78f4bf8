"""Spatial (height-band) sharding: XLA's SPMD partitioner must produce the
same result as unsharded execution, inserting conv halo exchanges and
global-pool all-reduces automatically (SURVEY.md §5.7 stretch goal)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_spatial
import pytest


@pytest.mark.slow
def test_spatially_sharded_bisenet_matches_unsharded(key, rng):
    assert jax.device_count() >= 8
    model = BiSeNet(num_classes=19, context_path="resnet18")
    # H = 256 -> 32 rows per device at full res, 4 rows at 1/8
    x = jnp.asarray(rng.normal(size=(1, 256, 64, 3)).astype(np.float32))
    variables = model.init(key, x, train=False)

    ref = np.asarray(model.apply(variables, x, train=False))

    mesh = make_mesh()
    repl = replicated_sharding(mesh)
    variables_r = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl) if hasattr(a, "shape") else a,
        variables)
    x_sharded = shard_spatial(x, mesh)
    assert len(x_sharded.sharding.device_set) == 8

    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables_r,
                                                               x_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
