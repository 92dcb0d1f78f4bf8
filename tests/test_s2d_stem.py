"""Space-to-depth stem: exact equality with the standard 7x7/s2 conv, and
the odd-size fallback."""

import jax.numpy as jnp
import numpy as np

from rtsds_tpu.models.layers import Stem7x7


def test_s2d_stem_matches_standard_conv(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    fast = Stem7x7(features=16, s2d=True)
    slow = Stem7x7(features=16, s2d=False)
    variables = fast.init(key, x)
    out_fast = fast.apply(variables, x)
    out_slow = slow.apply(variables, x)
    assert out_fast.shape == out_slow.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_matches_torch(key, rng):
    import pytest

    torch = pytest.importorskip("torch")
    x = rng.normal(size=(1, 32, 48, 3)).astype(np.float32)
    stem = Stem7x7(features=8, s2d=True)
    variables = stem.init(key, jnp.asarray(x))
    ours = np.asarray(stem.apply(variables, jnp.asarray(x)))
    k = np.asarray(variables["params"]["kernel"]).transpose(3, 2, 0, 1)
    ref = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(k),
        stride=2, padding=3)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_odd_size_fallback(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 33, 47, 3)).astype(np.float32))
    stem = Stem7x7(features=8, s2d=True)
    variables = stem.init(key, x)
    out = stem.apply(variables, x)
    # standard 7x7/s2/p3 output size: floor((n + 6 - 7)/2) + 1
    assert out.shape == (1, 17, 24, 8)
