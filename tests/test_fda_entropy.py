"""FDA source restyling (ops/fda.py) and MinEnt entropy minimization:
unit math, fused-step composition/isolation, mesh execution, and CLI
reachability (``training.domain_adaptation.{fda,entropy_min}``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from rtsds_tpu.ops.fda import fda_source_to_target, low_freq_mask
from rtsds_tpu.ops.losses import entropy_loss
from rtsds_tpu.train.adversarial import make_adversarial_step
from test_train_steps import _da_batch, _da_setup

# ---------------------------------------------------------------------------
# FDA math


def test_low_freq_mask_corners_and_symmetry():
    m = low_freq_mask(16, 32, beta=0.125)  # b = floor(16 * 0.125) = 2
    assert m.shape == (16, 32)
    # |freq| < 2 in both axes: rows {0,1,15} x cols {0,1,31}
    assert m.sum() == 3 * 3
    assert m[0, 0] == 1 and m[1, 31] == 1 and m[15, 0] == 1 and m[15, 31] == 1
    assert m[2, 0] == 0 and m[0, 2] == 0 and m[14, 0] == 0 and m[8, 16] == 0
    # closed under frequency negation (i, j) -> (-i mod H, -j mod W): the
    # spliced spectrum of a real image stays Hermitian, so ifft2().real
    # loses nothing
    neg = np.roll(np.roll(m[::-1, ::-1], 1, axis=0), 1, axis=1)
    np.testing.assert_array_equal(m, neg)
    # beta=0 selects nothing
    assert low_freq_mask(16, 32, 0.0).sum() == 0


def test_fda_beta_zero_is_identity(rng):
    src = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    out = fda_source_to_target(src, tgt, beta=0.0)
    assert out is src


def test_fda_swaps_low_frequency_amplitude(rng):
    src = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    beta = 0.25  # b = 4
    out = fda_source_to_target(src, tgt, beta=beta)
    assert out.shape == src.shape and out.dtype == src.dtype

    f_out = np.fft.fft2(np.asarray(out, np.float64), axes=(1, 2))
    f_src = np.fft.fft2(np.asarray(src, np.float64), axes=(1, 2))
    f_tgt = np.fft.fft2(np.asarray(tgt, np.float64), axes=(1, 2))
    mask = low_freq_mask(16, 16, beta).astype(bool)
    # masked bins carry the TARGET amplitude, unmasked the source's; the
    # phase is the source's everywhere
    np.testing.assert_allclose(np.abs(f_out)[:, mask, :],
                               np.abs(f_tgt)[:, mask, :], rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.abs(f_out)[:, ~mask, :],
                               np.abs(f_src)[:, ~mask, :], rtol=1e-3,
                               atol=1e-3)
    ang = (np.angle(f_out) - np.angle(f_src)) % (2 * np.pi)
    significant = np.abs(f_out) > 1e-3  # phase is meaningless at ~zero amp
    assert np.all(np.minimum(ang, 2 * np.pi - ang)[significant] < 1e-2)


def test_fda_self_transfer_is_near_identity(rng):
    """Swapping a batch's amplitude with itself must reconstruct it."""
    src = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    out = fda_source_to_target(src, src, beta=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-4)


def test_fda_resizes_and_tiles_target(rng):
    """Different target resolution AND batch size (720x1280-src vs
    512x1024-tgt in the reference config; loaders may batch unevenly)."""
    src = jnp.asarray(rng.normal(size=(4, 16, 24, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    out = fda_source_to_target(src, tgt, beta=0.1)
    assert out.shape == src.shape
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# entropy loss


def test_entropy_loss_normalized_bounds():
    # uniform logits -> maximum entropy -> exactly 1 after normalization
    uniform = jnp.zeros((2, 4, 4, 19))
    np.testing.assert_allclose(float(entropy_loss(uniform)), 1.0, rtol=1e-6)
    # near-one-hot -> near zero
    peaked = jnp.zeros((2, 4, 4, 19)).at[..., 3].set(50.0)
    assert float(entropy_loss(peaked)) < 1e-6


def test_entropy_loss_matches_manual_formula(rng):
    logits = jnp.asarray(rng.normal(size=(2, 3, 3, 7)).astype(np.float32))
    p = np.asarray(jax.nn.softmax(logits, axis=-1), np.float64)
    manual = float(np.mean(-np.sum(p * np.log(p), axis=-1)) / np.log(7))
    np.testing.assert_allclose(float(entropy_loss(logits)), manual,
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# fused-step composition


def test_v1_entropy_changes_g_but_not_d(key, rng):
    """MinEnt reshapes only the generator's update: D trains on the
    PRE-update generator's softmax maps, so its update is bit-identical
    with and without the entropy term."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, plain = _da_setup(key)
    ent_step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                     variant="v1", donate=False,
                                     lambda_ent=0.01)
    g1, d1, m1 = ent_step(gen_state, dis_state, src, lbl, tgt)
    g2, d2, m2 = plain(gen_state, dis_state, src, lbl, tgt)
    assert "loss_entropy" in m1 and "loss_entropy" not in m2
    assert 0.0 < float(m1["loss_entropy"]) < 0.01 / 4  # lambda/iterations
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g1.params),
                   jax.tree_util.tree_leaves(g2.params)))
    for a, b in zip(jax.tree_util.tree_leaves(d1.params),
                    jax.tree_util.tree_leaves(d2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v2_entropy_runs_and_reports(key, rng):
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, _ = _da_setup(key, variant="v2")
    step = make_adversarial_step(lambda_=0.001, iterations=4, epochs=2,
                                 variant="v2", donate=False, lambda_ent=0.01)
    _, _, metrics = step(gen_state, dis_state, src, lbl, tgt)
    assert np.isfinite(float(metrics["loss_entropy"]))
    assert float(metrics["loss_entropy"]) > 0


def test_v1_fda_step_runs_with_mixed_shapes(key, rng):
    src, lbl, tgt = _da_batch(rng, src_hw=(16, 24), tgt_hw=(8, 16))
    gen_state, dis_state, _ = _da_setup(key)
    step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                 variant="v1", donate=False, fda_beta=0.1)
    g1, d1, metrics = step(gen_state, dis_state, src, lbl, tgt)
    for k in ("loss_gen_source", "loss_adversarial", "loss_disc_source",
              "loss_disc_target"):
        assert np.isfinite(float(metrics[k])), k


def test_v1_fda_restyling_changes_the_update(key, rng):
    """The restyled source batch must actually reach the generator: the
    G update differs from the plain step's on the same inputs."""
    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, plain = _da_setup(key)
    fda_step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                     variant="v1", donate=False,
                                     fda_beta=0.25)
    g1, _, _ = fda_step(gen_state, dis_state, src, lbl, tgt)
    g2, _, _ = plain(gen_state, dis_state, src, lbl, tgt)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(g1.params),
                   jax.tree_util.tree_leaves(g2.params)))


def test_self_training_composes_all_four(key, rng):
    """adversarial + pseudo-label + MinEnt + FDA in one program."""
    from rtsds_tpu.train.self_training import make_self_training_step
    from test_self_training import _st_setup

    src, lbl, tgt = _da_batch(rng)
    gen_state, dis_state, ema, _ = _st_setup(key)
    step = make_self_training_step(
        lambda_=0.1, iterations=4, threshold=0.0, donate=False,
        lambda_ent=0.01, fda_beta=0.2)
    gen_state, dis_state, ema, metrics = step(gen_state, dis_state, ema,
                                              src, lbl, tgt)
    for k in ("loss_gen_source", "loss_adversarial", "loss_pseudo",
              "loss_entropy", "loss_disc_source", "loss_disc_target"):
        assert np.isfinite(float(metrics[k])), k
    np.testing.assert_allclose(float(metrics["pl_coverage"]), 1.0)


def test_fda_entropy_step_on_8_device_mesh(key, rng):
    """The composed step jits and executes with batch-sharded inputs on
    the 8-virtual-device mesh, matching the single-device numerics.
    SGD states: Adam's sign-like first update amplifies float-reduction
    noise across shardings to +-lr (documented pitfall)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
    from rtsds_tpu.parallel.mesh import make_mesh
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from test_train_steps import TinySeg

    src, lbl, tgt = _da_batch(rng, src_hw=(8, 8), tgt_hw=(8, 8))
    # batch 8 so it shards 8 ways
    src = jnp.tile(src, (4, 1, 1, 1))
    lbl = jnp.tile(lbl, (4, 1, 1))
    tgt = jnp.tile(tgt, (4, 1, 1, 1))
    kg, kd = jax.random.split(key)
    gen_state = create_train_state(TinySeg(), kg, jnp.zeros((2, 8, 8, 3)),
                                   make_optimizer("SGD", 0.05, momentum=0.9))
    dis_state = create_train_state(
        TinyDomainDiscriminator(num_classes=19), kd,
        jnp.zeros((2, 8, 8, 19)),
        make_optimizer("SGD", 0.05, momentum=0.9))
    step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                 variant="v1", donate=False,
                                 lambda_ent=0.01, fda_beta=0.25)
    g_flat, d_flat, m_flat = step(gen_state, dis_state, src, lbl, tgt)

    mesh = make_mesh(batch_size=8)
    sh = NamedSharding(mesh, P("data"))
    src_s = jax.device_put(src, sh)
    lbl_s = jax.device_put(lbl, sh)
    tgt_s = jax.device_put(tgt, sh)
    g_mesh, d_mesh, m_mesh = step(gen_state, dis_state, src_s, lbl_s, tgt_s)
    for a, b in zip(jax.tree_util.tree_leaves(g_flat.params),
                    jax.tree_util.tree_leaves(g_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m_flat["loss_entropy"]),
                               float(m_mesh["loss_entropy"]), rtol=1e-5)


# ---------------------------------------------------------------------------
# CLI reachability


def _da_config(tmp_path, extra=None):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "domain_adaptation": {
                "epochs": 1, "iterations": 2, "do_validation": 1,
            },
        },
        "callbacks": {},
    }
    if extra:
        for k, v in extra.items():
            node = cfg
            *parents, leaf = k.split(".")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = v
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.mark.slow
def test_cli_entropy_min_da(tmp_path, monkeypatch):
    """entropy_min.enabled reaches the fused step through the real CLI:
    loss_entropy appears in the batch logs."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    cfg = _da_config(tmp_path, {
        "training.domain_adaptation.entropy_min": {
            "enabled": True, "lambda": 0.01}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    last = recorder.batch_logs[-1]
    assert "loss_entropy" in last
    assert 0.0 <= last["loss_entropy"] <= 0.01


@pytest.mark.slow
def test_cli_fda_da(tmp_path, monkeypatch):
    """fda.enabled restyles source batches inside the fused step through
    the real CLI; the run trains and validates green."""
    from test_e2e_features import _recording

    from rtsds_tpu import cli

    cfg = _da_config(tmp_path, {
        "training.domain_adaptation.fda": {"enabled": True, "beta": 0.05}})
    recorder = _recording(monkeypatch)
    cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    assert recorder.train_ended
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0


def test_fda_closes_channel_statistics_gap(rng):
    """Effectiveness, deterministically: a synthetic color-cast domain
    gap (constant channel offset) lives entirely in the DC bin, so FDA
    must collapse the channel-mean gap to ~zero while barely touching
    the high-frequency content."""
    base = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    tgt = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    src = jnp.asarray(base + np.array([2.0, -1.5, 3.0], np.float32))

    gap_before = float(jnp.abs(src.mean((0, 1, 2)) -
                               tgt.mean((0, 1, 2))).max())
    out = fda_source_to_target(src, tgt, beta=0.05)
    gap_after = float(jnp.abs(out.mean((0, 1, 2)) -
                              tgt.mean((0, 1, 2))).max())
    assert gap_before > 1.4          # the synthetic cast is large
    assert gap_after < 0.2           # DC swapped -> means aligned
    # semantics preserved: high-frequency (phase/amplitude) content of
    # the source survives -- per-image correlation with the zero-mean
    # source stays high
    s = np.asarray(src) - np.asarray(src).mean((1, 2), keepdims=True)
    o = np.asarray(out) - np.asarray(out).mean((1, 2), keepdims=True)
    corr = (s * o).sum() / np.sqrt((s * s).sum() * (o * o).sum())
    assert corr > 0.95


@pytest.mark.slow
def test_fda_learning_gate(key, rng):
    """Training gate: a student trained on FDA-restyled source
    generalizes to a color-shifted target domain that defeats the
    plain-source student.  Task: segment bright blobs; the target domain
    carries a large channel cast the source lacks."""
    import flax.linen as nn
    import optax

    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            return nn.Conv(2, (1, 1))(x)

    def make_batch(r, cast, n=8):
        # blocky blobs: label 1 where a low-frequency field is positive.
        # Both casts are POSITIVE (like real image intensities): the DC
        # swap transfers |amplitude| with the source's sign, so a
        # zero-mean source would inherit the target cast with a random
        # per-image sign (found empirically building this gate).
        coarse = r.normal(size=(n, 4, 4)).astype(np.float32)
        field = np.kron(coarse, np.ones((1, 4, 4), np.float32))
        lbl = field > 0.0
        img = np.repeat(field[..., None], 3, axis=-1)
        img = img + r.normal(size=img.shape).astype(np.float32) * 0.05
        return (jnp.asarray(img + np.asarray(cast, np.float32)),
                jnp.asarray(lbl.astype(np.int32)))

    src_imgs, src_lbls = make_batch(rng, cast=[1.0, 1.0, 1.0])
    tgt_imgs, tgt_lbls = make_batch(np.random.default_rng(7),
                                    cast=[4.0, 3.0, 5.0])

    def train_and_eval(images):
        state = create_train_state(Tiny(), key, jnp.zeros((1, 16, 16, 3)),
                                   make_optimizer("Adam", 0.02))

        @jax.jit
        def step(state, x, y):
            def loss_fn(p):
                logits = state.apply_fn({"params": p}, x, train=True)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            grads = jax.grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads)

        for _ in range(200):
            state = step(state, images, src_lbls)
        preds = jnp.argmax(state.apply_fn({"params": state.params},
                                          tgt_imgs), axis=-1)
        return float((preds == tgt_lbls).mean())

    acc_plain = train_and_eval(src_imgs)
    acc_fda = train_and_eval(fda_source_to_target(src_imgs, tgt_imgs,
                                                  beta=0.1))
    # the cast-blind student is near chance on the target; the
    # FDA-trained one transfers
    assert acc_fda > acc_plain + 0.1, (acc_plain, acc_fda)
    assert acc_fda > 0.7, acc_fda
