"""remat (gradient checkpointing) produces identical outputs/grads."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.ops.losses import cross_entropy
import pytest


@pytest.mark.slow
def test_remat_identical_forward_and_grads(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(1, 32, 64)))
    plain = BiSeNet(num_classes=19, context_path="resnet18", remat=False)
    remat = BiSeNet(num_classes=19, context_path="resnet18", remat=True)
    variables = plain.init(key, x, train=False)  # same param structure

    def loss(model, params):
        out = model.apply({**variables, "params": params}, x, train=False)
        return cross_entropy(out, labels, 19)

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
