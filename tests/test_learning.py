"""Learning sanity: a small model trained through our real step/eval path
must actually learn the synthetic segmentation task (loss falls, mIoU
rises well above chance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rtsds_tpu.data.synthetic import SyntheticSegDataset
from rtsds_tpu.eval.validate import make_eval_step, validate
from rtsds_tpu.ops.preprocess import make_transform
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step


class SmallSeg(nn.Module):
    """2-level conv net, enough capacity for the color->class mapping."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1))(x)
        if train:
            return logits, None, None
        return logits


@pytest.mark.slow
def test_model_learns_synthetic_segmentation(key):
    ds = SyntheticSegDataset(8, (32, 64), num_classes=19, seed=0)
    # correct_preprocessing: the reference's no-/255 normalize quirk
    # produces inputs in the hundreds, which stalls a tiny-net sanity run
    transform = jax.jit(make_transform((32, 64), num_classes=19,
                                       antialias=False,
                                       correct_preprocessing=True))
    batches = []
    for i in range(0, 8, 4):
        imgs = np.stack([ds[j][0] for j in range(i, i + 4)])
        lbls = np.stack([ds[j][1] for j in range(i, i + 4)])
        batches.append(transform(jnp.asarray(imgs), jnp.asarray(lbls)))

    state = create_train_state(SmallSeg(), key, batches[0][0],
                               make_optimizer("Adam", 1e-2))
    step = make_train_step(ignore_index=19, donate=False)
    eval_step = make_eval_step(state.apply_fn, 19)

    miou_before, _ = validate(state, iter(batches), 19, eval_step=eval_step)
    losses = []
    for epoch in range(150):
        for images, labels in batches:
            state, metrics = step(state, images, labels)
        losses.append(float(metrics["train_loss"]))
    miou_after, _ = validate(state, iter(batches), 19, eval_step=eval_step)

    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert miou_after > max(0.25, miou_before + 0.15), (miou_before, miou_after)
