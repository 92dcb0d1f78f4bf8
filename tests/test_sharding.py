"""Data-parallel sharding on the virtual 8-device CPU mesh: the sharded
step must produce the same result as single-device (XLA inserts the psum;
SURVEY.md §2.3)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtsds_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step


class NoBNSeg(nn.Module):
    """BN-free stand-in: per-replica batch stats differ from global ones,
    so exact single-vs-multi-device equality needs a BN-free model (with BN
    the sharded run is sync-BN -- tested separately for finiteness)."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1))(x)
        if train:
            return logits, None, None
        return logits


def test_mesh_adapts_to_batch():
    mesh = make_mesh(batch_size=4)
    assert 4 % mesh.devices.size == 0
    mesh8 = make_mesh(batch_size=8)
    assert mesh8.devices.size == 8


def test_sharded_step_matches_single_device(rng, key):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    images = rng.normal(size=(8, 8, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 19, size=(8, 8, 16))

    def run(shard: bool):
        model = NoBNSeg()
        tx = make_optimizer("SGD", 0.1, momentum=0.9)
        state = create_train_state(model, key, jnp.zeros((8, 8, 16, 3)), tx)
        step = make_train_step(ignore_index=19, donate=False)
        im, lb = jnp.asarray(images), jnp.asarray(labels)
        if shard:
            mesh = make_mesh()
            repl = replicated_sharding(mesh)
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
                state)
            im, lb = shard_batch((im, lb), mesh)
            assert len(im.sharding.device_set) == 8
        for _ in range(3):
            state, metrics = step(state, im, lb)
        return state, metrics

    state_1, metrics_1 = run(shard=False)
    state_8, metrics_8 = run(shard=True)
    np.testing.assert_allclose(float(metrics_1["train_loss"]),
                               float(metrics_8["train_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 512, 19)


def test_make_mesh_multiprocess_rejects_indivisible_batch(monkeypatch):
    """In a multi-process job a non-dividing global batch must FAIL (not
    silently trim devices: trimming can idle an entire process, whose
    make_array_from_process_local_data then dies with an opaque error)."""
    import pytest

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="must divide"):
        make_mesh(batch_size=3)
    # divisible batches still work
    assert make_mesh(batch_size=8).devices.size == 8
