"""Epoch-aware deterministic resume.

Three layers: the loaders' epoch-keyed shuffles (pass N's order is a pure
function of (seed, N), so set_epoch fast-forwards after a restore), the
ModelCheckpoint.resume helper (restored states + start_epoch + best-metric
watermark), and supervised_fit's start_epoch skipping completed epochs.
The reference can't resume at all (SURVEY §5.4: no optimizer state, epoch
counter or RNG is ever saved).
"""

import numpy as np
import pytest

from rtsds_tpu.data.pipeline import DataLoader
from rtsds_tpu.data.synthetic import SyntheticSegDataset


def _orders(loader, passes):
    """Consume `passes` full epochs, returning each pass's first batch."""
    out = []
    for _ in range(passes):
        out.append(next(iter(loader))[0].copy())
    return out


def test_loader_epoch_keyed_shuffle():
    ds = SyntheticSegDataset(12, (8, 8), seed=0)
    a = DataLoader(ds, batch_size=12, shuffle=True, num_workers=1, seed=5)
    first = [next(iter(a))[0].copy() for _ in range(3)]  # passes 0,1,2
    # epochs draw different permutations
    assert not np.array_equal(first[0], first[1])
    # a fresh loader fast-forwarded to pass 2 reproduces pass 2 exactly
    b = DataLoader(ds, batch_size=12, shuffle=True, num_workers=1, seed=5)
    b.set_epoch(2)
    np.testing.assert_array_equal(next(iter(b))[0], first[2])
    # and a different seed gives a different pass-2 order
    c = DataLoader(ds, batch_size=12, shuffle=True, num_workers=1, seed=6)
    c.set_epoch(2)
    assert not np.array_equal(next(iter(c))[0], first[2])


def test_multihost_loader_epoch_keyed():
    from rtsds_tpu.data.multihost import MultiHostDataLoader

    ds = SyntheticSegDataset(16, (8, 8), seed=0)
    host0 = MultiHostDataLoader(ds, 8, shuffle=True, seed=3, num_workers=1,
                                process_index=0, process_count=2)
    passes = [next(iter(host0))[0].copy() for _ in range(2)]
    resumed = MultiHostDataLoader(ds, 8, shuffle=True, seed=3, num_workers=1,
                                  process_index=0, process_count=2)
    resumed.set_epoch(1)
    np.testing.assert_array_equal(next(iter(resumed))[0], passes[1])


def test_loader_skip_batches_fast_forward():
    """set_epoch + skip_batches reproduce an infinite stream mid-pass --
    the DA loop's resume discipline (consumed = start_epoch*iterations)."""
    ds = SyntheticSegDataset(8, (8, 8), seed=0)
    full = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1, seed=1,
                      infinite=True)
    it = iter(full)
    consumed = [next(it)[0].copy() for _ in range(7)]

    resumed = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                         seed=1, infinite=True)
    per_pass = len(resumed)  # 4 batches per pass
    resumed.set_epoch(5 // per_pass)
    resumed.skip_batches(5 % per_pass)
    it2 = iter(resumed)
    np.testing.assert_array_equal(next(it2)[0], consumed[5])
    np.testing.assert_array_equal(next(it2)[0], consumed[6])


def test_checkpoint_resume_helper(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtsds_tpu.callbacks.checkpoint import ModelCheckpoint
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(3)(x)

    x = jnp.ones((2, 4))
    state = create_train_state(Tiny(), jax.random.key(0), x,
                               make_optimizer("SGD", 1e-2, momentum=0.9))

    ckpt = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                           save_best=True, monitor="validation_mIoU")
    ckpt.attach(lambda: {"model": state.replace(step=jnp.int32(7))})
    ckpt._epoch = 0
    ckpt.on_validation_end({"validation_mIoU": 0.40})
    ckpt._epoch = 1
    ckpt.on_validation_end({"validation_mIoU": 0.55})
    ckpt._epoch = 2
    ckpt.on_validation_end({"validation_mIoU": 0.50})  # worse: not saved
    ckpt.manager.close()

    fresh = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                            save_best=True, monitor="validation_mIoU")
    restored, start_epoch = fresh.resume({"model": state})
    assert start_epoch == 2  # latest saved epoch 1 -> resume at 2
    assert int(restored["model"].step) == 7
    assert fresh.best == pytest.approx(0.55)
    assert fresh.best_step == 1
    # a worse post-resume validation must NOT overwrite best
    fresh._epoch = 2
    fresh._get_states = lambda: {"model": state}
    fresh.on_validation_end({"validation_mIoU": 0.45})
    assert fresh.best == pytest.approx(0.55)
    fresh.manager.close()


def test_replayed_epoch_save_overwrites_emergency_snapshot(tmp_path):
    """After a mid-epoch emergency save at step E, the replayed epoch's
    real save at the SAME step must overwrite the stale snapshot (orbax
    silently no-ops same-step saves unless forced)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtsds_tpu.callbacks.checkpoint import ModelCheckpoint
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(3)(x)

    x = jnp.ones((2, 4))
    state = create_train_state(Tiny(), jax.random.key(0), x,
                               make_optimizer("SGD", 1e-2, momentum=0.0))
    stale = state.replace(step=jnp.int32(5))
    fresh = state.replace(
        step=jnp.int32(9),
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params))

    ckpt = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                           save_best=True, monitor="validation_mIoU")
    live = {"s": stale}
    ckpt.attach(lambda: {"model": live["s"]})
    ckpt._epoch = 1
    assert ckpt.save_emergency()  # mid-epoch snapshot at step 1

    # replayed epoch 1 completes with better weights and validates
    live["s"] = fresh
    ckpt.on_validation_end({"validation_mIoU": 0.5})
    restored = ckpt.manager.restore({"model": state}, step=1)["model"]
    assert int(restored.step) == 9  # the NEW save, not the stale snapshot
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(fresh.params)[0]))
    ckpt.manager.close()


def test_validate_only_rejects_mismatched_checkpoint(tmp_path):
    """--validate_only must fail loudly, not report random-init mIoU,
    when the stored items don't match the run's model."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from flax import linen as nn

    from rtsds_tpu.callbacks.checkpoint import ModelCheckpoint
    from rtsds_tpu.cli import _run_validation_only
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(3)(x)

    x = jnp.ones((2, 4))
    state = create_train_state(Tiny(), jax.random.key(0), x,
                               make_optimizer("SGD", 1e-2, momentum=0.0))
    writer = ModelCheckpoint(save_dir=str(tmp_path), save_name="m",
                             save_best=False, save_freq=1)
    writer.attach(lambda: {"model": state})
    writer.on_epoch_end(0)
    writer.manager.close()

    reader = ModelCheckpoint(save_dir=str(tmp_path), save_name="m")
    with _pytest.raises(SystemExit, match="does not match"):
        _run_validation_only({"generator": state, "discriminator": state},
                             "generator", reader, lambda e: iter([]), 3,
                             None)
    reader.manager.close()


def test_resume_on_empty_dir(tmp_path):
    from rtsds_tpu.callbacks.checkpoint import ModelCheckpoint

    ckpt = ModelCheckpoint(save_dir=str(tmp_path), save_name="nothing")
    states = {"model": {"w": np.ones(3)}}
    restored, start_epoch = ckpt.resume(states)
    assert start_epoch == 0
    assert restored is states


def test_supervised_fit_start_epoch_skips():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtsds_tpu.train.loop import supervised_fit
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from rtsds_tpu.train.supervised import make_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            logits = nn.Conv(5, (1, 1))(x)
            return (logits, None, None) if train else logits

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(2, 8, 8)), jnp.int32)
    state = create_train_state(Tiny(), jax.random.key(0), x,
                               make_optimizer("SGD", 1e-2, momentum=0.0))
    step = make_train_step(ignore_index=None, donate=False)

    seen = []

    def train_batches(epoch):
        seen.append(epoch)
        return iter([(x, y)])

    state, history = supervised_fit(
        state, step, train_batches, lambda e: iter([(x, y)]), epochs=4,
        num_classes=5, do_validation=0, start_epoch=2)
    assert seen == [2, 3]
    assert int(state.step) == 2  # two steps, not four
