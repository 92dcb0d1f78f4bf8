"""Graceful preemption: SIGTERM mid-training -> emergency checkpoint ->
resumable (utils/preemption.py; the reference loses the run)."""

import os
import signal

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
from rtsds_tpu.utils.preemption import (
    Preempted,
    install_preemption_handler,
    restore_handlers,
)


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = nn.Conv(5, (1, 1))(x)
        return (logits, None, None) if train else logits


def test_sigterm_checkpoints_and_raises(tmp_path):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(2, 8, 12)), jnp.int32)
    state = create_train_state(_Tiny(), jax.random.key(0), x,
                               make_optimizer("Adam", 1e-3))
    step = make_train_step(ignore_index=None, donate=True)  # real CLI config

    def train_batches(epoch):
        def gen():
            yield x, y
            if epoch == 1:  # the scheduler pulls the plug mid-epoch 1
                os.kill(os.getpid(), signal.SIGTERM)
            yield x, y
        return gen()

    ckpt = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                           save_best=False, save_freq=100)
    previous = install_preemption_handler()
    try:
        with pytest.raises(Preempted):
            supervised_fit(state, step, train_batches,
                           lambda e: iter([(x, y)]), epochs=4, num_classes=5,
                           checkpoint=ckpt, do_validation=0)
    finally:
        restore_handlers(previous)

    restored, start_epoch = ckpt.resume({"model": state})
    # the emergency snapshot is the EPOCH-START state of the interrupted
    # epoch (donation-proof and replay-deterministic): after epoch 0's 2
    # batches, step == 2
    assert int(restored["model"].step) == 2
    # the emergency snapshot is marked mid-epoch: the interrupted epoch 1
    # REPLAYS from its start rather than being skipped half-trained
    assert start_epoch == 1
    ckpt.manager.close()


def test_handlers_restore():
    before = signal.getsignal(signal.SIGTERM)
    previous = install_preemption_handler()
    assert signal.getsignal(signal.SIGTERM) is not before
    restore_handlers(previous)
    assert signal.getsignal(signal.SIGTERM) is before
