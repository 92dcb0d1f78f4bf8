"""Gradient accumulation (train/accumulate.py): K micro-batches in one
jit program must reproduce the full-batch update exactly (no-BN case) and
advance the optimizer once."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rtsds_tpu.train.accumulate import (
    make_accumulating_train_step,
    split_microbatches,
)
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step


class _NoBN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(8, (3, 3))(x)
        h = nn.relu(h)
        logits = nn.Conv(5, (1, 1))(h)
        return (logits, None, None) if train else logits


class _WithBN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(8, (3, 3), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        logits = nn.Conv(5, (1, 1))(h)
        return (logits, None, None) if train else logits


def _data(n=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 8, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(n, 8, 12)), jnp.int32)
    return x, y


def test_accumulated_equals_full_batch_sgd():
    x, y = _data(8)
    model = _NoBN()
    tx = make_optimizer("SGD", 1e-2, momentum=0.9)
    s_full = create_train_state(model, jax.random.key(0), x, tx)
    s_acc = create_train_state(model, jax.random.key(0), x, tx)

    full_step = make_train_step(ignore_index=None, donate=False)
    acc_step = make_accumulating_train_step(ignore_index=None, donate=False)

    s_full, m_full = full_step(s_full, x, y)
    s_acc, m_acc = acc_step(s_acc, split_microbatches(x, 4),
                            split_microbatches(y, 4))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-7),
        s_full.params, s_acc.params)
    assert int(s_acc.step) == 1  # ONE optimizer step for 4 micro-batches
    assert float(m_acc["train_loss"]) == pytest.approx(
        float(m_full["train_loss"]), rel=1e-5)
    assert int(m_acc["correct"]) == int(m_full["correct"])
    assert int(m_acc["total"]) == y.size


def test_accumulation_updates_bn_stats_sequentially():
    x, y = _data(8)
    model = _WithBN()
    s = create_train_state(model, jax.random.key(0), x,
                           make_optimizer("Adam", 1e-3))
    before = jax.tree_util.tree_map(np.asarray, s.batch_stats)
    acc_step = make_accumulating_train_step(ignore_index=None, donate=False)
    s, _ = acc_step(s, split_microbatches(x, 4), split_microbatches(y, 4))
    after = s.batch_stats
    # stats moved (4 sequential micro-batch updates)
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before, after)
    assert all(jax.tree_util.tree_leaves(changed))


def test_split_microbatches_validates():
    with pytest.raises(ValueError, match="split"):
        split_microbatches(jnp.zeros((7, 2)), 4)
    out = split_microbatches(jnp.zeros((8, 2)), 4)
    assert out.shape == (4, 2, 2)
