"""DACS ClassMix: mask math, fused-step composition, determinism, and
CLI reachability (``training.domain_adaptation.self_training.classmix``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsds_tpu.train.self_training import (
    classmix_masks,
    make_self_training_step,
)
from test_self_training import _st_config, _st_setup
from test_train_steps import _da_batch


def test_classmix_masks_selects_exact_half():
    # one sample, 4 classes present (0..3), class 9 absent everywhere
    labels = jnp.array([[[0, 1], [2, 3]]])  # (1, 2, 2)
    mask = classmix_masks(labels, jax.random.key(0), num_classes=10)
    assert mask.shape == (1, 2, 2)
    # ceil(4/2) = 2 of the 4 pixels (each pixel is its own class here)
    assert int(mask.sum()) == 2


def test_classmix_masks_ignore_label_never_selected():
    # ignore pixels (19) must never be source-selected
    labels = jnp.full((2, 4, 4), 19)
    mask = classmix_masks(labels, jax.random.key(1), num_classes=19)
    assert not bool(mask.any())
    # single present class: ceil(1/2)=1 -> the whole image is selected
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    mask = classmix_masks(labels, jax.random.key(2), num_classes=19)
    assert bool(mask.all())


def test_classmix_masks_pixels_follow_classes(rng):
    labels = jnp.asarray(rng.integers(0, 5, size=(3, 8, 8)))
    mask = np.asarray(classmix_masks(labels, jax.random.key(3),
                                     num_classes=5))
    lab = np.asarray(labels)
    for n in range(3):
        present = np.unique(lab[n])
        selected = np.unique(lab[n][mask[n]])
        unselected = np.unique(lab[n][~mask[n]])
        # a class is wholly in or wholly out
        assert set(selected) & set(unselected) == set()
        assert len(selected) == (len(present) + 1) // 2


def test_classmix_step_runs_and_reports(key, rng):
    src, lbl, tgt = _da_batch(rng, src_hw=(16, 24), tgt_hw=(8, 16))
    gen_state, dis_state, ema, _ = _st_setup(key)
    step = make_self_training_step(lambda_=0.1, iterations=4, threshold=0.0,
                                   donate=False, classmix=True)
    gen_state, dis_state, ema, metrics = step(gen_state, dis_state, ema,
                                              src, lbl, tgt)
    for k in ("loss_gen_source", "loss_adversarial", "loss_pseudo",
              "mix_coverage", "loss_disc_source", "loss_disc_target"):
        assert np.isfinite(float(metrics[k])), k
    assert 0.0 < float(metrics["mix_coverage"]) < 1.0
    assert float(metrics["loss_pseudo"]) > 0


def test_classmix_mix_is_deterministic_in_step(key, rng):
    """Same step counter -> same mask: two runs from identical states
    give bit-identical updates (deterministic-resume contract)."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, _ = _st_setup(key)
    step = make_self_training_step(lambda_=0.1, iterations=4, threshold=0.0,
                                   donate=False, classmix=True)
    g1, _, _, m1 = step(gen_state, dis_state, ema, src, lbl, tgt)
    g2, _, _, m2 = step(gen_state, dis_state, ema, src, lbl, tgt)
    for a, b in zip(jax.tree_util.tree_leaves(g1.params),
                    jax.tree_util.tree_leaves(g2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(float(m1["mix_coverage"]),
                                  float(m2["mix_coverage"]))


def test_classmix_seed_changes_mix(key, rng):
    """Different classmix_seed -> different mixed batch -> different
    update (the seed actually reaches the RNG)."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, _ = _st_setup(key)
    s1 = make_self_training_step(lambda_=0.1, iterations=4, threshold=0.0,
                                 donate=False, classmix=True,
                                 classmix_seed=0)
    s2 = make_self_training_step(lambda_=0.1, iterations=4, threshold=0.0,
                                 donate=False, classmix=True,
                                 classmix_seed=123)
    g1, _, _, _ = s1(gen_state, dis_state, ema, src, lbl, tgt)
    g2, _, _, _ = s2(gen_state, dis_state, ema, src, lbl, tgt)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g1.params),
                   jax.tree_util.tree_leaves(g2.params)))


def test_classmix_labels_and_images_mix_correctly(key, rng):
    """White-box: rebuild the mixed batch exactly as the step does and
    check source pixels carry source labels, target pixels the teacher's
    pseudo-labels."""
    from rtsds_tpu.ops.resize import resize_bilinear, resize_labels_nearest
    from rtsds_tpu.train.self_training import pseudo_labels

    src, lbl, tgt = _da_batch(rng, src_hw=(16, 24), tgt_hw=(8, 16))
    gen_state, _, ema, _ = _st_setup(key)
    variables = {"params": ema}
    if gen_state.batch_stats is not None:
        variables["batch_stats"] = gen_state.batch_stats
    t_out = gen_state.apply_fn(variables, tgt, train=False)
    if isinstance(t_out, (tuple, list)):
        t_out = t_out[0]
    pl, _ = pseudo_labels(t_out, 0.0, 19)

    src_small = resize_bilinear(src, (8, 16))
    lbl_small = resize_labels_nearest(lbl, (8, 16))
    mix_key = jax.random.fold_in(jax.random.key(42), gen_state.step)
    mask = classmix_masks(lbl_small, mix_key, t_out.shape[-1])
    mix_lbl = np.where(np.asarray(mask), np.asarray(lbl_small),
                       np.asarray(pl))
    m = np.asarray(mask)
    assert np.array_equal(mix_lbl[m], np.asarray(lbl_small)[m])
    assert np.array_equal(mix_lbl[~m], np.asarray(pl)[~m])


def test_composed_step_on_8_device_mesh(key, rng):
    """The fully-composed step (adversarial + pseudo-label + ClassMix +
    FDA + MinEnt) jits and executes with batch-sharded inputs on the
    8-virtual-device mesh; per-batch metrics match single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtsds_tpu.parallel.mesh import make_mesh

    src, lbl, tgt = _da_batch(rng, src_hw=(8, 8), tgt_hw=(8, 8))
    src = jnp.tile(src, (4, 1, 1, 1))
    lbl = jnp.tile(lbl, (4, 1, 1))
    tgt = jnp.tile(tgt, (4, 1, 1, 1))
    gen_state, dis_state, ema, _ = _st_setup(key)
    step = make_self_training_step(lambda_=0.1, iterations=4, threshold=0.5,
                                   donate=False, classmix=True,
                                   lambda_ent=0.01, fda_beta=0.2)
    _, _, _, m_flat = step(gen_state, dis_state, ema, src, lbl, tgt)

    mesh = make_mesh(batch_size=8)
    sh = NamedSharding(mesh, P("data"))
    _, _, _, m_mesh = step(gen_state, dis_state, ema,
                           jax.device_put(src, sh), jax.device_put(lbl, sh),
                           jax.device_put(tgt, sh))
    for k in ("loss_gen_source", "loss_pseudo", "loss_entropy",
              "pl_coverage", "mix_coverage"):
        np.testing.assert_allclose(float(m_flat[k]), float(m_mesh[k]),
                                   rtol=5e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# CLI reachability


@pytest.mark.slow
def test_cli_classmix_da(tmp_path, monkeypatch):
    """classmix.enabled drives the DACS step through the real CLI:
    mix_coverage appears in the batch logs."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    cfg = _st_config(tmp_path, {
        "training.domain_adaptation.self_training.classmix": {
            "enabled": True}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    last = recorder.batch_logs[-1]
    assert "mix_coverage" in last and "loss_pseudo" in last
    assert 0.0 <= last["mix_coverage"] <= 1.0
