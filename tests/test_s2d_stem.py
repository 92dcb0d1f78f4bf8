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


def test_bisenet_s2d_stem_exact(key, rng):
    """s2d_stem=True: both 3-channel stems consume ONE shared rearranged
    input; logits must match the standard graph (same params)."""
    from rtsds_tpu.models.bisenet import BiSeNet

    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    base = BiSeNet(num_classes=19, context_path="resnet18")
    s2d = BiSeNet(num_classes=19, context_path="resnet18", s2d_stem=True)
    v = base.init(key, x, train=False)
    a = base.apply(v, x, train=False)
    b = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    # odd sizes fall back to the standard convs
    xo = jnp.asarray(rng.normal(size=(1, 66, 130, 3)).astype(np.float32))
    vo = base.init(key, xo, train=False)
    np.testing.assert_allclose(
        np.asarray(base.apply(vo, xo, train=False)),
        np.asarray(s2d.apply(vo, xo, train=False)), rtol=1e-4, atol=1e-5)


def test_conv3x3stride2_s2d_exact(key, rng):
    from rtsds_tpu.models.layers import Conv3x3Stride2, space_to_depth2

    x = jnp.asarray(rng.normal(size=(2, 32, 48, 5)).astype(np.float32))
    m = Conv3x3Stride2(features=7)
    v = m.init(key, x)
    a = m.apply(v, x)
    b = m.apply(v, x, space_to_depth2(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
