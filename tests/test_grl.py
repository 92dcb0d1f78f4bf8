"""DANN-style gradient-reversal DA step (``discriminator.grl`` config,
wiring the reference's ``GradientReversalFunction``, ``model.py:9-17``,
into a config-reachable training mode).

Semantics under test:
  * ONE fused backward produces BOTH updates;
  * the discriminator update is bit-identical to the v1 step's (the
    reversal sits at D's INPUT, so D's own parameter grads are normal);
  * the generator receives ``grad(seg) - lambda*alpha*grad(domain)``
    (the reversed domain gradient) — verified against a manually split
    computation;
  * alpha gates the domain signal into G (alpha -> 0 limit == seg-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
from rtsds_tpu.ops.losses import bce_with_logits, segmentation_loss
from rtsds_tpu.train.adversarial import _apply_gen, make_adversarial_step
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from test_train_steps import TinySeg, _da_batch

LR = 0.05
ITERS = 4


def _sgd_states(key, num_classes=19):
    """SGD momentum=0 everywhere: param delta == -lr * grad exactly."""
    kg, kd = jax.random.split(key)
    gen = TinySeg(num_classes=num_classes)
    gen_tx = make_optimizer("SGD", LR, momentum=0.0)
    gen_state = create_train_state(gen, kg, jnp.zeros((2, 8, 8, 3)), gen_tx)
    dis = TinyDomainDiscriminator(num_classes=num_classes)
    dis_tx = make_optimizer("SGD", LR, momentum=0.0)
    dis_state = create_train_state(dis, kd, jnp.zeros((2, 8, 8, 19)), dis_tx)
    return gen_state, dis_state


def _grl_step(lambda_=0.2, alpha=0.5, **kw):
    return make_adversarial_step(lambda_=lambda_, iterations=ITERS, epochs=2,
                                 variant="v1", donate=False,
                                 grl_alpha=alpha, **kw)


def test_grl_step_runs_and_updates_both(key, rng):
    gen_state, dis_state, = _sgd_states(key)
    src, lbl, tgt = _da_batch(rng)
    step = _grl_step()
    g0 = jax.tree_util.tree_leaves(gen_state.params)
    d0 = jax.tree_util.tree_leaves(dis_state.params)
    gen_state, dis_state, metrics = step(gen_state, dis_state, src, lbl, tgt)
    assert any(not np.allclose(a, b) for a, b in
               zip(g0, jax.tree_util.tree_leaves(gen_state.params)))
    assert any(not np.allclose(a, b) for a, b in
               zip(d0, jax.tree_util.tree_leaves(dis_state.params)))
    for k in ("loss_gen_source", "loss_adversarial", "loss_disc_source",
              "loss_disc_target", "correct", "total"):
        assert np.isfinite(float(metrics[k])), k


def test_grl_discriminator_update_equals_v1(key, rng):
    """GRL's joint backward must give D exactly v1's update: same
    pre-update features, same unweighted BCE, reversal only at the input."""
    src, lbl, tgt = _da_batch(rng)

    gen_a, dis_a = _sgd_states(key)
    v1 = make_adversarial_step(lambda_=0.2, iterations=ITERS, epochs=2,
                               variant="v1", donate=False)
    _, dis_a, _ = v1(gen_a, dis_a, src, lbl, tgt)

    gen_b, dis_b = _sgd_states(key)
    _, dis_b, _ = _grl_step(lambda_=0.2, alpha=0.7)(gen_b, dis_b, src, lbl,
                                                    tgt)

    for a, b in zip(jax.tree_util.tree_leaves(dis_a.params),
                    jax.tree_util.tree_leaves(dis_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_grl_generator_gradient_is_reversed_domain_grad(key, rng):
    """gen delta == -lr * (grad(seg) - lambda*alpha*grad(domain)),
    computed by manually splitting the joint loss (no reversal anywhere
    in the manual path)."""
    src, lbl, tgt = _da_batch(rng)
    lambda_, alpha = 0.2, 0.5
    gen_state, dis_state = _sgd_states(key)
    inv_iters = 1.0 / ITERS

    def seg_fn(gp):
        out, _ = _apply_gen(gen_state, gp, gen_state.batch_stats, src)
        return segmentation_loss(out, lbl, 19) * inv_iters

    def dom_fn(gp):
        src_out, bs1 = _apply_gen(gen_state, gp, gen_state.batch_stats, src)
        tgt_out, _ = _apply_gen(gen_state, gp, bs1, tgt)
        d_src = dis_state.apply_fn({"params": dis_state.params},
                                   jax.nn.softmax(src_out[0], axis=-1))
        d_tgt = dis_state.apply_fn({"params": dis_state.params},
                                   jax.nn.softmax(tgt_out[0], axis=-1))
        return (bce_with_logits(d_src, 1.0)
                + bce_with_logits(d_tgt, 0.0)) * inv_iters

    g_seg = jax.grad(seg_fn)(gen_state.params)
    g_dom = jax.grad(dom_fn)(gen_state.params)
    expected = jax.tree_util.tree_map(
        lambda p, gs, gd: p - LR * (gs - lambda_ * alpha * gd),
        gen_state.params, g_seg, g_dom)

    new_gen, _, _ = _grl_step(lambda_=lambda_, alpha=alpha)(
        gen_state, dis_state, src, lbl, tgt)
    for e, a in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(new_gen.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)


def test_grl_alpha_gates_the_domain_signal(key, rng):
    """The knob changes the update: different alphas move G differently,
    and a vanishing alpha converges to the seg-only update."""
    src, lbl, tgt = _da_batch(rng)

    def gen_after(alpha):
        gen_state, dis_state = _sgd_states(key)
        new_gen, _, _ = _grl_step(lambda_=0.5, alpha=alpha)(
            gen_state, dis_state, src, lbl, tgt)
        return np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(new_gen.params)])

    g_half = gen_after(0.5)
    g_two = gen_after(2.0)
    assert not np.allclose(g_half, g_two)

    # seg-only reference: lambda=0 in the plain v1 step kills the
    # adversarial term entirely
    gen_state, dis_state = _sgd_states(key)
    v1_seg_only = make_adversarial_step(lambda_=0.0, iterations=ITERS,
                                        epochs=2, variant="v1", donate=False)
    seg_gen, _, _ = v1_seg_only(gen_state, dis_state, src, lbl, tgt)
    seg_flat = np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(seg_gen.params)])
    np.testing.assert_allclose(gen_after(1e-12), seg_flat,
                               rtol=1e-5, atol=1e-7)


def test_grl_rejects_v2():
    with pytest.raises(ValueError, match="v1"):
        make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                              variant="v2", grl_alpha=0.5, donate=False)


@pytest.mark.slow
def test_cli_grl(tmp_path, monkeypatch):
    """discriminator.grl {enabled, alpha} reaches the fused step from the
    real CLI."""
    from rtsds_tpu import cli
    from test_e2e_features import _assert_trained, _config, _recording

    cfg = _config(tmp_path, {
        "model.adversarial_model.discriminator.grl":
            {"enabled": True, "alpha": 0.3}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    _assert_trained(recorder)
    assert "loss_adversarial" in recorder.batch_logs[-1]


@pytest.mark.slow
def test_cli_grl_rejects_self_training(tmp_path, monkeypatch):
    from rtsds_tpu import cli
    from test_e2e_features import _config

    cfg = _config(tmp_path, {
        "model.adversarial_model.discriminator.grl":
            {"enabled": True, "alpha": 0.3},
        "training.domain_adaptation.ema": {"enabled": True, "decay": 0.99},
        "training.domain_adaptation.self_training": {"enabled": True}})
    with pytest.raises(SystemExit, match="grl"):
        cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
