"""Hybrid (DCN x ICI) 2-D mesh: the fused DA step runs sharded over both
axes and produces the same losses as the flat 1-D data mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.parallel.mesh import (
    batch_sharding,
    hybrid_batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicated_sharding,
    shard_state,
)


def _setup(batch):
    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
    from rtsds_tpu.train.adversarial import make_adversarial_step
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state

    key = jax.random.key(0)
    src_hw, tgt_hw = (40, 72), (32, 64)
    gen_state = create_train_state(
        BiSeNet(num_classes=19, context_path="resnet18"), key,
        jnp.zeros((batch, *src_hw, 3)), make_optimizer("Adam", 1e-4))
    dis_state = create_train_state(
        TinyDomainDiscriminator(19), key,
        jnp.zeros((batch, *tgt_hw, 19)),
        make_optimizer("Adam", 1e-4, weight_decay=1e-4))
    step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                 variant="v1", donate=False)
    kx = jax.random.key(7)
    src = jax.random.normal(kx, (batch, *src_hw, 3))
    lbl = jax.random.randint(jax.random.key(8), (batch, *src_hw), 0, 20)
    tgt = jax.random.normal(jax.random.key(9), (batch, *tgt_hw, 3))
    return gen_state, dis_state, step, src, lbl, tgt


def test_hybrid_mesh_shape_and_errors():
    mesh = make_hybrid_mesh(2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "ici")
    with pytest.raises(ValueError, match="split"):
        make_hybrid_mesh(3)


@pytest.mark.slow
def test_da_step_on_hybrid_mesh_matches_flat():
    batch = 8
    gen_state, dis_state, step, src, lbl, tgt = _setup(batch)

    def run(mesh, data_sharding):
        repl = replicated_sharding(mesh)
        gs = shard_state(gen_state, mesh)
        ds = shard_state(dis_state, mesh)
        put = lambda a: jax.device_put(a, data_sharding)  # noqa: E731
        _, _, metrics = step(gs, ds, put(src), put(lbl), put(tgt))
        return {k: float(metrics[k]) for k in
                ("loss_gen_source", "loss_adversarial",
                 "loss_disc_source", "loss_disc_target")}

    flat = run(make_mesh(), batch_sharding(make_mesh()))
    hyb_mesh = make_hybrid_mesh(2)
    hybrid = run(hyb_mesh, hybrid_batch_sharding(hyb_mesh))
    for k in flat:
        assert np.isfinite(flat[k])
        np.testing.assert_allclose(hybrid[k], flat[k], rtol=1e-5,
                                   err_msg=k)


def test_upsampler_module(key, rng):
    """The reference's UpSampler helper (model.py:19-28), for completeness."""
    from rtsds_tpu.models.discriminator import UpSampler

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 19)).astype(np.float32))
    m = UpSampler(num_classes=19)
    v = m.init(key, x)
    y = m.apply(v, x)
    assert y.shape == (2, 64, 96, 19)
