"""Pipelined DeepLab training (mesh: {pipe: N}, train/pipelined.py).

The contract: the GPipe-scheduled step IS gradient accumulation -- losses,
gradient updates, and BatchNorm running stats must match
``train/accumulate.py`` over the same microbatch split (f64: to machine
epsilon), and the mode must be reachable from the documented CLI surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import yaml

from rtsds_tpu.models.deeplabv2 import DeepLabV2
from rtsds_tpu.parallel.mesh import make_mesh, make_mesh_from_config
from rtsds_tpu.train.accumulate import (
    make_accumulating_train_step,
    split_microbatches,
)
from rtsds_tpu.train.pipelined import make_pipelined_train_step
from rtsds_tpu.train.state import create_train_state

# reduced depth: 8 homogeneous layer3 blocks -> 4 stages x 2 blocks
LAYERS = (1, 1, 9, 1)
SHAPE = (33, 65)


def _states(num_classes=5, lr=0.05, dtype=jnp.float32):
    model = DeepLabV2(num_classes=num_classes, layers=LAYERS)
    x0 = jnp.zeros((4, *SHAPE, 3), dtype)
    state = create_train_state(model, jax.random.key(0), x0, optax.sgd(lr))
    if dtype == jnp.float64:
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, state)
    return model, state


def _batch(rng, it=0, dtype=np.float32):
    imgs = jnp.asarray(rng.normal(size=(4, *SHAPE, 3)).astype(dtype))
    lbls = np.asarray(rng.integers(0, 5, size=(4, *SHAPE)), dtype=np.int32)
    lbls[0, :4, :4] = 19  # exercise ignore_index masking
    return imgs, jnp.asarray(lbls)


def _maxdiff(a, b):
    return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))


@pytest.mark.slow
def test_pipelined_equals_accumulate_f32():
    """Two full optimizer steps: loss/correct identical, params and BN
    running stats within f32 reassociation noise of the accumulate step."""
    rng = np.random.default_rng(0)
    model, state_a = _states()
    _, state_p = _states()
    mesh = make_mesh(jax.devices()[:4], axis_name="pipe")
    acc = make_accumulating_train_step(ignore_index=19, donate=False)
    pipe = make_pipelined_train_step(model, mesh, ignore_index=19,
                                     num_microbatches=4, donate=False)
    for it in range(2):
        imgs, lbls = _batch(rng, it)
        state_a, ma = acc(state_a, split_microbatches(imgs, 4),
                          split_microbatches(lbls, 4))
        state_p, mp = pipe(state_p, imgs, lbls)
        np.testing.assert_allclose(float(ma["train_loss"]),
                                   float(mp["train_loss"]), rtol=1e-5)
        assert int(ma["correct"]) == int(mp["correct"])
        assert int(ma["total"]) == int(mp["total"])
    assert _maxdiff(state_a.params, state_p.params) < 5e-3
    assert _maxdiff(state_a.batch_stats, state_p.batch_stats) < 1e-4
    assert int(state_p.step) == 2  # ONE optimizer update per step


@pytest.mark.slow
def test_pipelined_exact_gradients_f64():
    """f64: the pipelined update equals sequential per-microbatch
    gradients (accumulate semantics) to machine epsilon -- the schedule
    introduces no semantic deviation, only fp reassociation."""
    from rtsds_tpu.ops.losses import segmentation_loss

    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        model, state = _states(dtype=jnp.float64)
        mesh = make_mesh(jax.devices()[:4], axis_name="pipe")
        pipe = make_pipelined_train_step(model, mesh, ignore_index=19,
                                         num_microbatches=4, donate=False)
        imgs, lbls = _batch(rng, dtype=np.float64)

        def mb_loss(params, batch_stats, x, y):
            out, vs = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return segmentation_loss(out, y, 19), vs["batch_stats"]

        grad_fn = jax.jit(jax.value_and_grad(mb_loss, has_aux=True))
        bs = state.batch_stats
        gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        lsum = 0.0
        for i in range(4):
            (l, bs), g = grad_fn(state.params, bs, imgs[i:i + 1],
                                 lbls[i:i + 1])
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            lsum += float(l)
        ref_params = jax.tree_util.tree_map(
            lambda p, g: p - 0.05 * g / 4, state.params, gsum)

        new_state, mp = pipe(state, imgs, lbls)
        assert abs(lsum / 4 - float(mp["train_loss"])) < 1e-12
        assert _maxdiff(ref_params, new_state.params) < 1e-13
        assert _maxdiff(bs, new_state.batch_stats) < 1e-13


@pytest.mark.slow
def test_pipelined_more_microbatches_than_stages():
    """M=4 microbatches over P=2 stages (amortizing the bubble) keeps the
    same accumulate equality."""
    rng = np.random.default_rng(2)
    model, state_a = _states()
    _, state_p = _states()
    mesh = make_mesh(jax.devices()[:2], axis_name="pipe")
    acc = make_accumulating_train_step(ignore_index=19, donate=False)
    pipe = make_pipelined_train_step(model, mesh, ignore_index=19,
                                     num_microbatches=4, donate=False)
    imgs, lbls = _batch(rng)
    state_a, ma = acc(state_a, split_microbatches(imgs, 4),
                      split_microbatches(lbls, 4))
    state_p, mp = pipe(state_p, imgs, lbls)
    np.testing.assert_allclose(float(ma["train_loss"]),
                               float(mp["train_loss"]), rtol=1e-5)
    assert _maxdiff(state_a.params, state_p.params) < 5e-3


def test_pipe_mesh_from_config():
    mesh = make_mesh_from_config({"pipe": 4}, devices=jax.devices()[:4])
    assert mesh.axis_names == ("pipe",) and mesh.shape["pipe"] == 4
    with pytest.warns(UserWarning, match="will idle"):
        mesh = make_mesh_from_config({"pipe": 2})
    assert mesh.shape["pipe"] == 2
    with pytest.raises(ValueError, match="does not compose"):
        make_mesh_from_config({"pipe": 2, "data": 2})
    with pytest.raises(ValueError, match="does not compose"):
        make_mesh_from_config({"pipe": 2, "spatial": 2})
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh_from_config({"pipe": 16})
    # -1 fills all devices (data-axis convention), not a silent no-op
    mesh = make_mesh_from_config({"pipe": -1})
    assert mesh.axis_names == ("pipe",)
    assert mesh.shape["pipe"] == len(jax.devices())
    with pytest.raises(ValueError, match="positive stage count"):
        make_mesh_from_config({"pipe": -3})


def test_pipe_mesh_rejects_multihost(monkeypatch):
    """The schedule replicates inputs -- incompatible with per-process
    sharded loading, so multi-process runs are rejected up front."""
    import rtsds_tpu.parallel.mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process only"):
        make_mesh_from_config({"pipe": 2})


def test_pipe_microbatch_validation(tmp_path):
    model = DeepLabV2(num_classes=5, layers=LAYERS)
    mesh = make_mesh(jax.devices()[:4], axis_name="pipe")
    with pytest.raises(ValueError, match="must be >= 1"):
        make_pipelined_train_step(model, mesh, num_microbatches=0)
    cfg = _config(tmp_path, {"mesh": {"pipe": 2},
                             "training.segmentation.pipe_microbatches": 0})
    from rtsds_tpu import cli

    with pytest.raises(SystemExit, match="must be >= 1"):
        cli.main(["--config", cfg, "--synthetic", "--model", "deeplab"])


def test_pipe_mesh_inputs_replicated():
    from rtsds_tpu.parallel.mesh import input_sharding

    mesh = make_mesh_from_config({"pipe": 4}, devices=jax.devices()[:4])
    assert input_sharding(mesh).is_fully_replicated


def test_pipelined_step_validation():
    model = DeepLabV2(num_classes=5, layers=LAYERS)
    mesh = make_mesh(jax.devices()[:3], axis_name="pipe")
    with pytest.raises(ValueError, match="valid pipe sizes"):
        make_pipelined_train_step(model, mesh)
    from rtsds_tpu.models.bisenet import BiSeNet

    mesh4 = make_mesh(jax.devices()[:4], axis_name="pipe")
    with pytest.raises(ValueError, match="DeepLabV2 only"):
        make_pipelined_train_step(
            BiSeNet(num_classes=5, context_path="resnet18"), mesh4)


def _config(tmp_path, extra):
    cfg = {
        "data": {
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "segmentation": {"epochs": 1, "do_validation": 1},
            "domain_adaptation": {"epochs": 1, "iterations": 2,
                                  "do_validation": 1},
        },
        "callbacks": {
            "model_checkpoint": {
                "save_dir": str(tmp_path / "ckpt"), "save_name": "model",
                "save_best": True, "monitor": "validation_mIoU",
                "mode": "max", "save_freq": 1},
        },
    }
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
def test_cli_pipelined_deeplab(tmp_path, monkeypatch):
    """mesh: {pipe: 2} trains the full DeepLab-R101 (22 homogeneous
    layer3 blocks -> 2 stages x 11) end-to-end through the real CLI."""
    from test_e2e import RecorderCallback

    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"mesh": {"pipe": 2}})
    recorder = RecorderCallback()
    orig = cli.build_callbacks

    def patched(config, use_wandb, *a, **k):
        callbacks, checkpoint = orig(config, use_wandb, *a, **k)
        return [*callbacks, recorder], checkpoint

    monkeypatch.setattr(cli, "build_callbacks", patched)
    cli.main(["--config", cfg, "--synthetic", "--model", "deeplab"])
    assert recorder.train_ended
    assert recorder.batch_logs and recorder.val_logs
    assert all(np.isfinite(list(logs.values())).all()
               for logs in recorder.batch_logs)
    miou = recorder.val_logs[-1][0]["validation_mIoU"]
    assert 0.0 <= miou <= 1.0


def test_cli_pipe_rejections(tmp_path):
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"mesh": {"pipe": 2}})
    with pytest.raises(SystemExit, match="deeplab required"):
        cli.main(["--config", cfg, "--synthetic", "--model", "bisenet"])
    with pytest.raises(SystemExit, match="supervised DeepLab"):
        cli.main(["--config", cfg, "--synthetic", "--domain_adaptation"])
    cfg = _config(tmp_path, {"mesh": {"pipe": 2},
                             "training.segmentation.accumulate_steps": 2})
    with pytest.raises(SystemExit, match="already microbatches"):
        cli.main(["--config", cfg, "--synthetic", "--model", "deeplab"])
    # 22 homogeneous blocks do not split over 4 stages
    cfg = _config(tmp_path, {"mesh": {"pipe": 4}, "data": {
        "cityscapes": {"image_size": "32, 64", "batch_size": 4,
                       "num_workers": 2},
        "gta5_modified": {"image_size": "40, 72", "batch_size": 4,
                          "num_workers": 2}}})
    with pytest.raises(SystemExit, match="valid pipe sizes"):
        cli.main(["--config", cfg, "--synthetic", "--model", "deeplab"])


def test_cli_pipe_rejects_bn_eval(tmp_path):
    """mesh.pipe threads per-microbatch batch-stats BN through the
    schedule; fully-frozen BN (model.deeplab.bn_eval) would silently
    diverge from the same config on a non-pipe mesh, so it is rejected
    up front."""
    from rtsds_tpu import cli

    cfg = _config(tmp_path, {"mesh": {"pipe": 2},
                             "model": {"deeplab": {"bn_eval": True}}})
    with pytest.raises(SystemExit, match="bn_eval"):
        cli.main(["--config", cfg, "--synthetic", "--model", "deeplab"])
