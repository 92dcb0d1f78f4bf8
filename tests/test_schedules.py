"""Poly LR schedule vs the reference closed form + gating (utils.py:33-48,
train.py:66-69)."""

import numpy as np

from rtsds_tpu.utils.schedules import (
    lambda_adv_schedule,
    poly_epoch_schedule,
    poly_lr_schedule,
)


def reference_lr(init_lr, steps, max_iter, power, d):
    """Simulate the reference loop: update lr only when iter % d == 0 and
    iter <= max_iter; otherwise hold."""
    lr = init_lr
    out = []
    for it in range(steps):
        if it % d == 0 and it <= max_iter:
            lr = init_lr * (1 - it / max_iter) ** power
        out.append(lr)
    return np.array(out)


def test_poly_matches_reference_gating():
    init_lr, max_iter, power = 1e-4, 100, 0.9
    for d in (1, 3, 7):
        sched = poly_lr_schedule(init_lr, max_iter, power, lr_decay_iter=d)
        ours = np.array([float(sched(s)) for s in range(130)])
        ref = reference_lr(init_lr, 130, max_iter, power, d)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_poly_decays_to_zero_at_max_iter():
    sched = poly_lr_schedule(0.01, 50, 0.9)
    np.testing.assert_allclose(float(sched(0)), 0.01, rtol=1e-6)
    assert float(sched(50)) == 0.0
    assert float(sched(49)) > 0.0


def test_epoch_schedule():
    sched = poly_epoch_schedule(0.01, epochs=10, power=0.05, iterations_per_epoch=5)
    # steps 0..4 are epoch 0, steps 5..9 epoch 1
    assert float(sched(0)) == float(sched(4))
    e1 = 0.01 * (1 - 1 / 10) ** 0.05
    np.testing.assert_allclose(float(sched(5)), e1, rtol=1e-5)


def test_lambda_adv_schedule():
    lam = lambda_adv_schedule(0.1, iterations_per_epoch=10)
    np.testing.assert_allclose(float(lam(0)), 1.0, rtol=1e-6)  # 10 * 0.1
    # epoch 900: 1.0 - 0.9 = 0.1 -> floor reached
    np.testing.assert_allclose(float(lam(9000)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(lam(20000)), 0.1, rtol=1e-6)  # clamped


def test_with_warmup_ramp():
    """Linear warmup scales any base schedule: lr/w at step 0, half at
    step w/2-1, full at step w-1 and beyond; warmup_iters=0 is a no-op."""
    import numpy as np

    from rtsds_tpu.utils.schedules import with_warmup

    base = lambda step: 0.1  # constant base isolates the ramp
    sched = with_warmup(base, 10)
    np.testing.assert_allclose(float(sched(0)), 0.1 * 1 / 10)
    np.testing.assert_allclose(float(sched(4)), 0.1 * 5 / 10)
    np.testing.assert_allclose(float(sched(9)), 0.1)
    np.testing.assert_allclose(float(sched(100)), 0.1)
    assert with_warmup(base, 0) is base


def test_warmup_reaches_factory_schedules():
    """training.*.warmup_iters shrinks the first update through the real
    config -> factory -> optimizer path (both supervised and DA)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtsds_tpu.config import default_config
    from rtsds_tpu.train.factory import build_adversarial, build_supervised

    def first_update_norm(bundle, example):
        state = bundle.init_state(jax.random.key(0), example)
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        new = state.apply_gradients(grads=grads)
        return float(sum(
            float(jnp.abs(a - b).sum()) for a, b in
            zip(jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(new.params))))

    x = jnp.zeros((1, 16, 32, 3))
    cfg = default_config()
    warm = cfg.replace(training={"segmentation": {"warmup_iters": 100},
                                 "domain_adaptation": {"warmup_iters": 100}})
    plain_b = build_supervised(cfg, "bisenet", steps_per_epoch=10)
    warm_b = build_supervised(warm, "bisenet", steps_per_epoch=10)
    n_plain = first_update_norm(plain_b, x)
    n_warm = first_update_norm(warm_b, x)
    assert n_warm < n_plain * 0.05, (n_plain, n_warm)

    gen_plain, dis_plain = build_adversarial(cfg)
    gen_warm, dis_warm = build_adversarial(warm)
    assert (first_update_norm(gen_warm, x)
            < first_update_norm(gen_plain, x) * 0.05)
    dx = jnp.zeros((1, 16, 32, 19))
    assert (first_update_norm(dis_warm, dx)
            < first_update_norm(dis_plain, dx) * 0.05)
