"""Predictor.from_checkpoint: the train -> save -> serve loop."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.callbacks.checkpoint import CheckpointManager
from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.serve import Predictor
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state


def test_predictor_restores_trained_weights(tmp_path, key, rng):
    model = BiSeNet(num_classes=19, context_path="resnet18")
    state = create_train_state(model, key, jnp.zeros((1, 32, 64, 3)),
                               make_optimizer("Adam", 1e-4))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, {"model": state}, monitor=0.42)
    mgr.close()

    p = Predictor.from_checkpoint(str(tmp_path / "ckpt"),
                                  model_name="bisenet",
                                  image_size=(32, 64), batch_size=1,
                                  dtype=None)
    # restored params == saved params
    for a, b in zip(jax.tree_util.tree_leaves(p.variables["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    frame = rng.integers(0, 255, size=(32, 64, 3)).astype(np.uint8)
    mask = p.predict(frame)
    assert mask.shape == (32, 64)


def test_predictor_prefers_ema_item(tmp_path, key):
    """A checkpoint written by an EMA-enabled run carries the weights the
    reported mIoU was computed on in its 'ema' item -- serving must use
    those by default (use_ema=False opts back into the raw params)."""
    model = BiSeNet(num_classes=19, context_path="resnet18")
    state = create_train_state(model, key, jnp.zeros((1, 32, 64, 3)),
                               make_optimizer("Adam", 1e-4))
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, {"model": state, "ema": {"params": ema}}, monitor=0.5)
    mgr.close()

    p = Predictor.from_checkpoint(str(tmp_path / "ckpt"),
                                  model_name="bisenet",
                                  image_size=(32, 64), batch_size=1,
                                  dtype=None)
    for a, b in zip(jax.tree_util.tree_leaves(p.variables["params"]),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    raw = Predictor.from_checkpoint(str(tmp_path / "ckpt"), use_ema=False,
                                    model_name="bisenet",
                                    image_size=(32, 64), batch_size=1,
                                    dtype=None)
    for a, b in zip(jax.tree_util.tree_leaves(raw.variables["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
