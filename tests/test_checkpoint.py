"""Orbax checkpoint round trip + best-k retention + early stopping
(implements the config.yaml:128-139 schema the reference only declared)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtsds_tpu.callbacks.checkpoint import CheckpointManager, EarlyStopping, ModelCheckpoint
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(4)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return x


def _state(key, lr=0.1):
    return create_train_state(Tiny(), key, jnp.zeros((2, 3)),
                              make_optimizer("Adam", lr))


def test_checkpoint_round_trip(tmp_path, key):
    state = _state(key)
    # advance so opt_state/step are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads=grads)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, {"model": state}, monitor=0.5)

    template = _state(jax.random.key(99))  # different init
    restored = mgr.restore({"model": template})["model"]
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_best_tracking(tmp_path, key):
    state = _state(key)
    cb = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                         save_best=True, monitor="validation_mIoU",
                         mode="max")
    cb.attach(lambda: {"model": state})
    cb._epoch = 0
    cb.on_validation_end({"validation_mIoU": 0.3})
    cb._epoch = 1
    cb.on_validation_end({"validation_mIoU": 0.2})  # worse: not saved
    cb._epoch = 2
    cb.on_validation_end({"validation_mIoU": 0.4})  # better: saved
    assert cb.best == 0.4
    assert cb.best_step == 2
    assert cb.manager.best_step() == 2
    cb.on_train_end()


def test_early_stopping_patience():
    es = EarlyStopping(monitor="validation_mIoU", mode="max", patience=2)
    for v in (0.3, 0.4):
        es.on_validation_end({"validation_mIoU": v})
    assert not es.should_stop
    es.on_validation_end({"validation_mIoU": 0.39})
    es.on_validation_end({"validation_mIoU": 0.38})
    assert es.should_stop


def test_emergency_keeps_existing_same_step_checkpoint(tmp_path, key):
    """SIGTERM right after the post-epoch best save must NOT delete-and-
    rewrite the existing step: the rewrite races the kill (risking the
    only copy of the epoch) and would destroy the stored monitor metric
    that best_step()/--validate_only rely on."""
    import os

    state = _state(key)
    cb = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                         save_best=True, monitor="validation_mIoU")
    cb.attach(lambda: {"model": state})
    cb.on_epoch_end(0)
    cb.on_validation_end({"validation_mIoU": 0.42})
    assert cb.save_emergency()  # still reports a valid checkpoint exists
    assert not os.path.exists(cb._emergency_marker)  # post-epoch, no replay
    assert cb.manager.all_steps() == [0]
    assert cb.manager.best_step() == 0  # monitor metric survived intact
    metrics = cb.manager.manager.metrics(0)
    assert float(metrics["monitor"]) == 0.42
    cb.on_train_end()


def test_item_tolerant_restore(tmp_path, key):
    """restore() only pulls the items present in BOTH template and
    checkpoint: a run that later enables an optional item (e.g. ema)
    resumes an older checkpoint instead of discarding it; a fully
    mismatched template still skips (returns the identical states)."""
    state = _state(key)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, {"model": state}, monitor=0.1)

    template = _state(jax.random.key(7))
    ema_tpl = {"params": jax.tree_util.tree_map(jnp.zeros_like,
                                                template.params)}
    states = {"model": template, "ema": ema_tpl}
    restored = mgr.restore(states)
    assert restored is not states
    # model restored from disk...
    for a, b in zip(jax.tree_util.tree_leaves(restored["model"].params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # ...while the absent ema item kept its template identity
    assert restored["ema"] is ema_tpl

    # round trip WITH the ema item
    mgr.save(1, {"model": state, "ema": {"params": state.params}})
    restored2 = mgr.restore({"model": template, "ema": ema_tpl}, step=1)
    for a, b in zip(jax.tree_util.tree_leaves(restored2["ema"]["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # zero overlap: skip signal preserved
    wrong = {"generator": template}
    assert mgr.restore(wrong, step=0) is wrong
    mgr.close()
