"""Failure recovery (SURVEY §5.3): a crash mid-training must leave an
emergency checkpoint behind so --resume can continue -- the reference
loses the entire run on any exception."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rtsds_tpu.callbacks.checkpoint import ModelCheckpoint
from rtsds_tpu.train.loop import supervised_fit
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = nn.Conv(5, (1, 1))(x)
        if train:
            return logits, None, None
        return logits


def test_crash_leaves_emergency_checkpoint(tmp_path, key, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(2, 8, 12)), jnp.int32)
    state = create_train_state(_Tiny(), key, x, make_optimizer("Adam", 1e-3))
    step = make_train_step(ignore_index=None, donate=False)

    def train_batches(epoch):
        def gen():
            yield x, y
            if epoch == 1:
                raise RuntimeError("host OOM / preemption")
            yield x, y
        return gen()

    def val_batches(_epoch):
        return iter([(x, y)])

    ckpt = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                           save_best=False, save_freq=100)  # never periodic
    with pytest.raises(RuntimeError, match="preemption"):
        supervised_fit(state, step, train_batches, val_batches, epochs=3,
                       num_classes=5, checkpoint=ckpt, do_validation=0)

    # the emergency snapshot exists and restores to a progressed step
    restored = ckpt.manager.restore({"model": state})["model"]
    assert int(restored.step) > 0
    ckpt.manager.close()
