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
    # donate=True is the REAL CLI configuration: the crash-time outer
    # state's buffers are deleted by donation, which is exactly why the
    # emergency path must save the epoch-start snapshot (a regression
    # here previously hid behind donate=False)
    step = make_train_step(ignore_index=None, donate=True)

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


def test_emergency_replay_reproduces_uninterrupted_run_with_ema(tmp_path,
                                                                key, rng):
    """Crash mid-epoch with EMA enabled, resume, finish: the final model
    AND EMA trees must equal the uninterrupted run bit for bit -- the
    emergency snapshot must be the EPOCH-START pair (a mid-epoch EMA
    would double-apply the replayed steps' updates)."""
    x1 = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    y1 = jnp.asarray(rng.integers(0, 5, size=(2, 8, 12)), jnp.int32)
    x2 = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    y2 = jnp.asarray(rng.integers(0, 5, size=(2, 8, 12)), jnp.int32)

    def make_state():
        return create_train_state(_Tiny(), jax.random.key(3), x1,
                                  make_optimizer("Adam", 1e-3))

    def batches(crash_at):
        def make(epoch):
            def gen():
                yield x1, y1
                if epoch == crash_at:
                    raise RuntimeError("preempted")
                yield x2, y2
            return gen()
        return make

    def final_items(tag, crash):
        ckpt = ModelCheckpoint(save_dir=str(tmp_path / tag), save_name="m",
                               save_best=False, save_freq=1)
        state = make_state()
        step = make_train_step(ignore_index=None, donate=True)
        if crash:
            with pytest.raises(RuntimeError, match="preempted"):
                supervised_fit(state, step, batches(1),
                               lambda e: iter([(x1, y1)]), epochs=3,
                               num_classes=5, checkpoint=ckpt,
                               do_validation=0, ema_decay=0.9)
            # resume exactly as the CLI does
            templates = {"model": make_state(),
                         "ema": {"params": make_state().params}}
            restored, start_epoch = ckpt.resume(templates)
            assert start_epoch == 1  # replay the interrupted epoch
            step = make_train_step(ignore_index=None, donate=True)
            supervised_fit(restored["model"], step, batches(None),
                           lambda e: iter([(x1, y1)]), epochs=3,
                           num_classes=5, checkpoint=ckpt, do_validation=0,
                           ema_decay=0.9, start_epoch=start_epoch,
                           ema_params=restored["ema"]["params"])
        else:
            supervised_fit(state, step, batches(None),
                           lambda e: iter([(x1, y1)]), epochs=3,
                           num_classes=5, checkpoint=ckpt, do_validation=0,
                           ema_decay=0.9)
        mgr = ckpt.manager or ckpt.attach(lambda: {}).manager
        out = mgr.restore({"model": make_state(),
                           "ema": {"params": make_state().params}}, step=2)
        mgr.close()
        return out

    ref = final_items("uninterrupted", crash=False)
    res = final_items("resumed", crash=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref["model"].params),
                    jax.tree_util.tree_leaves(res["model"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ref["ema"]["params"]),
                    jax.tree_util.tree_leaves(res["ema"]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
