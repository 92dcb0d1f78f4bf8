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
