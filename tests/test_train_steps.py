"""Train-step semantics: optimizer parity vs torch, supervised convergence,
and GAN-step gradient isolation (the stop-gradient replacement for the
reference's freeze/detach dance, train.py:192-193,238-243)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
from rtsds_tpu.train.adversarial import make_adversarial_step
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step
from rtsds_tpu.utils.schedules import poly_lr_schedule


class TinySeg(nn.Module):
    """Minimal stand-in generator: conv + BN -> per-pixel logits."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1))(x)
        if train:
            return logits, None, None
        return logits


def _tiny_state(key, lr=0.05, num_classes=19):
    model = TinySeg(num_classes=num_classes)
    tx = make_optimizer("Adam", lr)
    return create_train_state(model, key, jnp.zeros((2, 8, 8, 3)), tx)


def test_adam_matches_torch_trajectory(rng):
    torch = pytest.importorskip("torch")
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g_seq = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    for wd in (0.0, 0.01):
        tx = make_optimizer("Adam", 0.1, weight_decay=wd)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)
        t_w = torch.nn.Parameter(torch.tensor(w0.copy()))
        t_opt = torch.optim.Adam([t_w], lr=0.1, weight_decay=wd)
        for g in g_seq:
            import optax
            updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
            params = optax.apply_updates(params, updates)
            t_opt.zero_grad()
            t_w.grad = torch.tensor(g.copy())
            t_opt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   t_w.detach().numpy(), rtol=2e-5, atol=1e-6)


def test_sgd_matches_torch_trajectory(rng):
    torch = pytest.importorskip("torch")
    w0 = rng.normal(size=(4,)).astype(np.float32)
    g_seq = [rng.normal(size=(4,)).astype(np.float32) for _ in range(5)]
    import optax

    tx = make_optimizer("SGD", 0.1, momentum=0.9)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    t_w = torch.nn.Parameter(torch.tensor(w0.copy()))
    t_opt = torch.optim.SGD([t_w], lr=0.1, momentum=0.9)
    for g in g_seq:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, updates)
        t_opt.zero_grad()
        t_w.grad = torch.tensor(g.copy())
        t_opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), t_w.detach().numpy(),
                               rtol=2e-5, atol=1e-6)


def test_scheduled_lr_is_applied(key):
    sched = poly_lr_schedule(1.0, max_iter=10, power=1.0)
    tx = make_optimizer("SGD", sched, momentum=0.0)
    params = {"w": jnp.ones(())}
    opt_state = tx.init(params)
    import optax

    # step 0: lr = 1.0 -> update = -1 * g
    updates, opt_state = tx.update({"w": jnp.asarray(2.0)}, opt_state, params)
    np.testing.assert_allclose(float(updates["w"]), -2.0, rtol=1e-6)
    # step 1: lr = 1 - 1/10 = 0.9
    updates, _ = tx.update({"w": jnp.asarray(2.0)}, opt_state, params)
    np.testing.assert_allclose(float(updates["w"]), -1.8, rtol=1e-6)


def test_supervised_step_learns(key, rng):
    state = _tiny_state(key)
    step = make_train_step(ignore_index=19, donate=False)
    images = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 8, 8)))
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert 0 <= float(metrics["correct"]) <= float(metrics["total"])


def test_supervised_step_updates_batch_stats(key, rng):
    state = _tiny_state(key)
    step = make_train_step(donate=False)
    images = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 19, size=(2, 8, 8)))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    state, _ = step(state, images, labels)
    after = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def _da_setup(key, lambda_=0.1, variant="v1"):
    kg, kd = jax.random.split(key)
    gen_state = _tiny_state(kg)
    dis = TinyDomainDiscriminator(num_classes=19)
    dis_tx = make_optimizer("Adam", 0.05, weight_decay=1e-4)
    dis_state = create_train_state(dis, kd, jnp.zeros((2, 8, 8, 19)), dis_tx)
    step = make_adversarial_step(lambda_=lambda_, iterations=4, epochs=2,
                                 variant=variant, donate=False)
    return gen_state, dis_state, step


def _da_batch(rng, src_hw=(8, 8), tgt_hw=(8, 8)):
    src = jnp.asarray(rng.normal(size=(2, *src_hw, 3)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, 19, size=(2, *src_hw)))
    tgt = jnp.asarray(rng.normal(size=(2, *tgt_hw, 3)).astype(np.float32))
    return src, lbl, tgt


def test_adversarial_v1_step_runs_and_updates_both(key, rng):
    gen_state, dis_state, step = _da_setup(key)
    src, lbl, tgt = _da_batch(rng)
    g0 = jax.tree_util.tree_leaves(gen_state.params)
    d0 = jax.tree_util.tree_leaves(dis_state.params)
    gen_state, dis_state, metrics = step(gen_state, dis_state, src, lbl, tgt)
    g1 = jax.tree_util.tree_leaves(gen_state.params)
    d1 = jax.tree_util.tree_leaves(dis_state.params)
    assert any(not np.allclose(a, b) for a, b in zip(g0, g1))
    assert any(not np.allclose(a, b) for a, b in zip(d0, d1))
    for k in ("loss_gen_source", "loss_adversarial", "loss_disc_source",
              "loss_disc_target"):
        assert np.isfinite(float(metrics[k])), k


def test_adversarial_v1_different_spatial_sizes(key, rng):
    # source 720x1280-style vs target 512x1024-style shape mismatch
    gen_state, dis_state, step = _da_setup(key)
    src, lbl, tgt = _da_batch(rng, src_hw=(16, 24), tgt_hw=(8, 16))
    gen_state, dis_state, metrics = step(gen_state, dis_state, src, lbl, tgt)
    assert np.isfinite(float(metrics["loss_adversarial"]))


def test_gan_gradient_isolation_lambda_zero(key, rng):
    """With lambda=0 the G update must not depend on D at all; with
    lambda>0 it must.  This is the no-leak property the reference enforces
    with requires_grad toggling (train.py:192-193)."""
    src, lbl, tgt = _da_batch(rng)

    def g_after_one_step(lambda_, d_seed):
        gen_state, dis_state, step = _da_setup(jax.random.key(0), lambda_)
        # re-init D params with a different seed
        d_params = dis_state.apply_fn
        dis = TinyDomainDiscriminator(num_classes=19)
        new_vars = dis.init(jax.random.key(d_seed), jnp.zeros((2, 8, 8, 19)))
        dis_state = dis_state.replace(params=new_vars["params"],
                                      opt_state=dis_state.tx.init(new_vars["params"]))
        gen_state, dis_state, _ = step(gen_state, dis_state, src, lbl, tgt)
        return np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(gen_state.params)])

    # lambda = 0: G trajectory identical regardless of D init
    np.testing.assert_allclose(g_after_one_step(0.0, 1), g_after_one_step(0.0, 2))
    # lambda > 0: D's params influence G through the adversarial loss
    assert not np.allclose(g_after_one_step(0.5, 1), g_after_one_step(0.5, 2))


def test_dis_update_ignores_gen_gradient_path(key, rng):
    """The D update must see stop-gradient'd features: its gradients exist
    and are finite even though G's params require grads upstream."""
    gen_state, dis_state, step = _da_setup(key)
    src, lbl, tgt = _da_batch(rng)
    _, dis_after, metrics = step(gen_state, dis_state, src, lbl, tgt)
    # D moved in the direction of classifying src=1/tgt=0 -> both its
    # losses are finite positives
    assert float(metrics["loss_disc_source"]) > 0
    assert float(metrics["loss_disc_target"]) > 0


def test_adversarial_v2_step(key, rng):
    gen_state, dis_state, step = _da_setup(key, lambda_=0.1, variant="v2")
    src, lbl, tgt = _da_batch(rng, src_hw=(16, 24), tgt_hw=(8, 16))
    gen_state, dis_state, metrics = step(gen_state, dis_state, src, lbl, tgt)
    # epoch 0 -> lambda_adv = 10 * 0.1 = 1.0 (train.py:416)
    np.testing.assert_allclose(float(metrics["lambda_adv"]), 1.0, rtol=1e-6)
    for k in ("loss_gen_total", "loss_disc_total"):
        assert np.isfinite(float(metrics[k]))


def test_grad_clip_bounds_the_update():
    """optimizer.grad_clip caps the global gradient norm before the
    moment estimators; an exploding gradient produces a bounded SGD
    update, and small gradients pass through untouched."""
    import optax

    params = {"w": jnp.zeros((4,))}
    big = {"w": jnp.full((4,), 100.0)}
    tx = make_optimizer("SGD", 1.0, momentum=0.0, grad_clip=1.0)
    updates, _ = tx.update(big, tx.init(params), params)
    np.testing.assert_allclose(
        float(optax.global_norm(updates)), 1.0, rtol=1e-6)
    small = {"w": jnp.full((4,), 0.001)}
    updates, _ = tx.update(small, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -np.asarray(small["w"]), rtol=1e-6)
    # grad_clip=0 disables clipping entirely
    tx0 = make_optimizer("SGD", 1.0, momentum=0.0, grad_clip=0.0)
    updates, _ = tx0.update(big, tx0.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -np.asarray(big["w"]), rtol=1e-6)


def test_grad_clip_from_config():
    """optimizer.grad_clip reaches the transformation through
    optimizer_from_config (the factory path)."""
    import optax

    from rtsds_tpu.train.optim import optimizer_from_config

    tx = optimizer_from_config(
        {"name": "SGD", "lr": 1.0, "momentum": 0.0, "grad_clip": 0.5},
        schedule=None)
    params = {"w": jnp.full((3,), 0.0)}
    updates, _ = tx.update({"w": jnp.full((3,), 10.0)}, tx.init(params),
                           params)
    np.testing.assert_allclose(float(optax.global_norm(updates)), 0.5,
                               rtol=1e-6)
