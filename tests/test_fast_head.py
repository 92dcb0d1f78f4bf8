"""fast_head identity: conv1x1 and bilinear upsample commute exactly
(rtsds_tpu/models/bisenet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.bisenet import BiSeNet


def test_fast_head_equals_reference_order(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    fast = BiSeNet(num_classes=19, context_path="resnet18", fast_head=True)
    slow = BiSeNet(num_classes=19, context_path="resnet18", fast_head=False)
    variables = fast.init(key, x, train=False)  # identical param structure
    out_fast = fast.apply(variables, x, train=False)
    out_slow = slow.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow),
                               rtol=1e-4, atol=1e-5)
