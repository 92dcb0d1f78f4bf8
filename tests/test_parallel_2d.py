"""Composed parallelism on 2-D meshes: DP x spatial for the fused DA step,
DP x FSDP (parameter sharding) for the supervised step.  Both must match
the flat 1-D data-parallel numerics — XLA's SPMD partitioner inserts the
extra collectives (conv halo exchange over ``spatial``; param all-gather /
grad reduce-scatter over ``model``) without changing results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from rtsds_tpu.parallel.mesh import (
    batch_sharding,
    dp_spatial_sharding,
    fsdp_shard_state,
    make_mesh,
    make_mesh_2d,
    shard_state,
)


def _da_setup(batch):
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
    src = jax.random.normal(jax.random.key(7), (batch, *src_hw, 3))
    lbl = jax.random.randint(jax.random.key(8), (batch, *src_hw), 0, 20)
    tgt = jax.random.normal(jax.random.key(9), (batch, *tgt_hw, 3))
    return gen_state, dis_state, step, src, lbl, tgt


def test_mesh_2d_shape_and_errors():
    mesh = make_mesh_2d((4, 2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "spatial")
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d((4, 4))


@pytest.mark.slow
def test_da_step_on_dp_spatial_mesh_matches_flat():
    batch = 8
    gen_state, dis_state, step, src, lbl, tgt = _da_setup(batch)

    def run(mesh, data_sharding):
        gs = shard_state(gen_state, mesh)
        ds = shard_state(dis_state, mesh)
        put = lambda a: jax.device_put(a, data_sharding)  # noqa: E731
        _, _, metrics = step(gs, ds, put(src), put(lbl), put(tgt))
        return {k: float(metrics[k]) for k in
                ("loss_gen_source", "loss_adversarial",
                 "loss_disc_source", "loss_disc_target")}

    flat = run(make_mesh(), batch_sharding(make_mesh()))
    mesh2d = make_mesh_2d((4, 2))  # 4-way batch x 2-way height bands
    composed = run(mesh2d, dp_spatial_sharding(mesh2d))
    for k in flat:
        assert np.isfinite(flat[k])
        np.testing.assert_allclose(composed[k], flat[k], rtol=2e-5,
                                   err_msg=k)


def test_make_mesh_from_config_and_input_sharding():
    from rtsds_tpu.parallel.mesh import input_sharding, make_mesh_from_config

    # pure-data spec keeps the 1-D trimming behavior
    mesh = make_mesh_from_config({"data": -1}, batch_size=8)
    assert mesh.axis_names == ("data",) and mesh.devices.size == 8
    assert input_sharding(mesh).spec == P("data")

    mesh = make_mesh_from_config({"data": -1, "spatial": 2, "model": 2})
    assert mesh.axis_names == ("data", "spatial", "model")
    assert mesh.devices.shape == (2, 2, 2)  # data axis filled to 8/(2*2)
    assert input_sharding(mesh).spec == P("data", "spatial")

    mesh = make_mesh_from_config({"data": 4, "spatial": 2})
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.devices.shape == (4, 2)

    with pytest.raises(ValueError, match="devices"):
        make_mesh_from_config({"data": 8, "model": 2})
    with pytest.raises(ValueError, match="at least"):
        make_mesh_from_config({"data": -1, "spatial": 16})
    # surplus chips never idle silently; undivisible batches fail loudly
    with pytest.warns(UserWarning, match="idle"):
        make_mesh_from_config({"data": 2, "spatial": 2})
    with pytest.raises(ValueError, match="divide"):
        make_mesh_from_config({"data": -1, "spatial": 2}, batch_size=3)


def test_fsdp_shard_state_rules():
    mesh = make_mesh_2d((4, 2), axis_names=("data", "model"))
    tree = {
        "kernel": jnp.zeros((3, 3, 64, 64)),      # large, out-dim divisible
        "odd": jnp.zeros((3, 3, 63, 259)),        # large, only dim 2 divisible... no dim divides 2? 63,259,3 -> none
        "bias": jnp.zeros((64,)),                 # small -> replicated
    }
    sharded = fsdp_shard_state(tree, mesh, axis="model", min_size=1000)
    assert sharded["kernel"].sharding.spec == P(None, None, None, "model")
    # no dimension of (3,3,63,259) divides 2 -> replicated fallback
    assert sharded["odd"].sharding.spec in (P(), P(None, None, None, None))
    assert sharded["bias"].sharding.spec in (P(), P(None,))


@pytest.mark.slow
def test_fsdp_supervised_step_matches_replicated():
    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from rtsds_tpu.train.supervised import make_train_step

    batch, hw = 8, (32, 64)
    key = jax.random.key(0)
    # SGD, not Adam: Adam's update is ~±lr for any near-zero gradient, so
    # float reduction-order noise on tiny grads flips update signs and the
    # post-step param comparison becomes meaningless.  SGD's update is
    # linear in the gradient, making the comparison a real numerics gate.
    state = create_train_state(
        BiSeNet(num_classes=19, context_path="resnet18"), key,
        jnp.zeros((batch, *hw, 3)),
        make_optimizer("SGD", 1e-2, momentum=0.9))
    step = make_train_step(donate=False)
    imgs = jax.random.normal(jax.random.key(5), (batch, *hw, 3))
    lbls = jax.random.randint(jax.random.key(6), (batch, *hw), 0, 20)

    # flat 1-D data-parallel reference
    mesh1 = make_mesh()
    s1 = shard_state(state, mesh1)
    st1, m1 = step(s1, jax.device_put(imgs, batch_sharding(mesh1)),
                   jax.device_put(lbls, batch_sharding(mesh1)))

    # 4-way data x 2-way parameter (FSDP) sharding
    mesh2 = make_mesh_2d((4, 2), axis_names=("data", "model"))
    s2 = fsdp_shard_state(state, mesh2, axis="model")
    # at least one kernel must actually be sharded over 'model'
    flat_params = jax.tree_util.tree_leaves(s2.params)
    assert any(
        "model" in tuple(p.sharding.spec)
        for p in flat_params if hasattr(p, "sharding")), \
        "no parameter got FSDP-sharded"
    data2 = NamedSharding(mesh2, P("data"))
    st2, m2 = step(s2, jax.device_put(imgs, data2),
                   jax.device_put(lbls, data2))

    np.testing.assert_allclose(float(m2["train_loss"]),
                               float(m1["train_loss"]), rtol=2e-5)
    assert int(m2["correct"]) == int(m1["correct"])
    # one optimizer step under both shardings produces the same params
    p1 = jax.tree_util.tree_leaves(st1.params)
    p2 = jax.tree_util.tree_leaves(st2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
