"""adaptive_avg_pool2d parity vs torch (used by the v2 DA loop,
train.py:410,438,445)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.ops.pool import adaptive_avg_pool2d

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (4, 4)),
    ((7, 13), (3, 5)),
    ((45, 80), (32, 64)),   # non-integer ratios like 720x1280 -> 512x1024
    ((6, 6), (6, 6)),       # identity
])
def test_adaptive_avg_pool_matches_torch(rng, in_hw, out_hw):
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    t = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.adaptive_avg_pool2d(t, out_hw)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
