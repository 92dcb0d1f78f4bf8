"""Model/optimizer/criterion factory from config.

Capability parity with ``model_loader`` / ``optimzer_loss_loader``
(``main.py:110-231``): builds (model, optimizer, hyperparams) for the
supervised path (deeplab or bisenet) and (generator, discriminator) pairs
for the adversarial path, each with its own optimizer, criterion and poly-LR
schedule.  Unlike the reference, the LR schedule is baked into the optimizer
so the whole update runs inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.models.deeplabv2 import DeepLabV2, frozen_bn_mask
from rtsds_tpu.models.discriminator import DomainDiscriminator, TinyDomainDiscriminator
from rtsds_tpu.models.pretrained import (
    load_backbone_pretrained,
    load_deeplab_pretrained,
)
from rtsds_tpu.ops.losses import make_criterion
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import TrainState, create_train_state
from rtsds_tpu.utils.schedules import poly_epoch_schedule, \
    poly_lr_schedule, with_warmup


@dataclasses.dataclass
class ModelBundle:
    """A model plus everything needed to train it."""

    model: Any
    tx: Any
    criterion: Callable
    hparams: dict
    pretrained: dict | None = None
    pretrained_submodule: str | None = None

    def init_state(self, key, example_input, train: bool = True) -> TrainState:
        return create_train_state(
            self.model, key, example_input, self.tx, train=train,
            pretrained=self.pretrained,
            pretrained_submodule=self.pretrained_submodule)


def _dtype_from_config(config):
    name = str(config.get("precision", {}).get("compute_dtype", "float32"))
    return {"float32": None, "bfloat16": jnp.bfloat16}.get(name, None)


def _make_bisenet(cfg, dtype):
    """model.bisenet section -> (model, pretrained, submodule)."""
    model = BiSeNet(num_classes=cfg["num_classes"],
                    context_path=cfg["backbone"], dtype=dtype,
                    remat=bool(cfg.get("remat", False)))
    pretrained, sub = None, None
    path = cfg.get("pretrain_model_path", "") or ""
    if cfg.get("pretrained", False) and path:
        pretrained = load_backbone_pretrained(path)
        sub = "context_path"
    return model, pretrained, sub


def _make_deeplab(cfg, dtype):
    """model.deeplab section -> (model, pretrained).  Shared by the
    supervised path and the DA-generator path so every deeplab knob
    (bn_eval, remat, the pretrain key-spelling tolerance) exists once."""
    model = DeepLabV2(num_classes=cfg["num_classes"], dtype=dtype,
                      bn_eval=bool(cfg.get("bn_eval", False)),
                      remat=bool(cfg.get("remat", False)))
    pretrained = None
    # tolerate both the reference's mismatched key spellings
    # (config.yaml:36-37 'pretrained/pretrained_path' vs main.py:206
    # 'pretrain/pretrain_model_path' -- a catalogued bug)
    want = cfg.get("pretrain", cfg.get("pretrained", False))
    path = cfg.get("pretrain_model_path",
                   cfg.get("pretrained_path", "")) or ""
    if want and path:
        pretrained = load_deeplab_pretrained(path)
    return model, pretrained


def _build_segmentor(config, model_name: str, max_iter: int,
                     lr_decay_iter: int, dtype=None,
                     warmup_iters: int = 0):
    model_cfg = config.model
    if model_name == "bisenet":
        cfg = model_cfg.get("bisenet")
        model, pretrained, sub = _make_bisenet(cfg, dtype)
        frozen = None
    elif model_name == "deeplab":
        cfg = model_cfg.get("deeplab")
        model, pretrained = _make_deeplab(cfg, dtype)
        sub = None
        frozen = "deeplab"
    else:
        raise ValueError("Invalid model name. Please select deeplab or bisenet")

    init_lr = float(cfg["optimizer"]["lr"])
    power = float(cfg.get("power_lr_factor", 0.9))
    schedule = with_warmup(
        poly_lr_schedule(init_lr, max_iter, power, lr_decay_iter),
        warmup_iters)

    frozen_mask_fn = None
    if frozen == "deeplab":
        frozen_mask_fn = frozen_bn_mask

    tx = _make_tx(cfg["optimizer"], schedule, frozen_mask_fn, model, dtype)
    criterion = make_criterion(cfg["criterion"])
    hparams = {"init_lr": init_lr, "power": power}
    return ModelBundle(model, tx, criterion, hparams, pretrained, sub)


def _make_tx(opt_cfg, schedule, frozen_mask_fn, model, dtype):
    frozen_mask = None
    if frozen_mask_fn is not None:
        # materialize the mask lazily at state init via optax.masked's
        # callable-mask support
        frozen_mask = frozen_mask_fn
    # discriminative LR (the reference's 1x/10x split, deeplabv2.py:171-173
    # and build_bisenet.py:121-128 `mul_lr` -- both defined there but never
    # consumed; wired for real here): optimizer.head_lr_mult scales the
    # non-backbone head params' LR, 0/absent = uniform LR
    lr_multipliers = None
    head_mult = float(opt_cfg.get("head_lr_mult", 0.0) or 0.0)
    if head_mult and head_mult != 1.0:
        if isinstance(model, DeepLabV2):
            from rtsds_tpu.models.deeplabv2 import lr_multiplier_mask

            lr_multipliers = lambda p: lr_multiplier_mask(p, head_mult)  # noqa: E731
        elif isinstance(model, BiSeNet):
            from rtsds_tpu.models.bisenet import head_lr_multiplier_mask

            lr_multipliers = lambda p: head_lr_multiplier_mask(p, head_mult)  # noqa: E731
        else:
            raise ValueError(
                f"head_lr_mult is defined for segmentor optimizers only "
                f"(deeplab's ASPP head, bisenet's non-backbone modules), "
                f"not {type(model).__name__}")
    return make_optimizer(
        opt_cfg["name"],
        learning_rate=schedule,
        weight_decay=float(opt_cfg.get("weight_decay", 0.0) or 0.0),
        momentum=float(opt_cfg.get("momentum", 0.9) or 0.9),
        frozen_mask=frozen_mask,
        lr_multipliers=lr_multipliers,
        grad_clip=float(opt_cfg.get("grad_clip", 0.0) or 0.0),
    )


def build_supervised(config, model_name: str, steps_per_epoch: int):
    """Supervised path (``main.py:204-231``): one ModelBundle.

    ``max_iter = epochs * steps_per_epoch`` as in ``main.py:347``.
    """
    tcfg = config.training.get("segmentation")
    max_iter = int(tcfg["epochs"]) * int(steps_per_epoch)
    return _build_segmentor(config, model_name, max_iter,
                            int(tcfg["lr_decay_iter"]),
                            dtype=_dtype_from_config(config),
                            warmup_iters=int(tcfg.get("warmup_iters", 0)))


def build_adversarial(config):
    """DA path (``main.py:169-202``): (generator, discriminator) bundles.

    Generator LR: poly over ``epochs * iterations`` total steps, gated by
    ``lr_decay_iter`` (``train.py:178-181``).  Discriminator LR is
    variant-dependent: v1 decays once per *epoch* with ``max_iter =
    epochs`` (``train.py:167``); v2 decays per iteration over ``epochs *
    iterations`` like the generator (``train.py:386-388``; the reference
    there also decays the generator with ``dis_power`` -- an uncatalogued
    copy-paste slip we build to intent with ``gen_power``).
    """
    adv_cfg = config.model.get("adversarial_model")
    tcfg = config.training.get("domain_adaptation")
    epochs = int(tcfg["epochs"])
    iterations = int(tcfg["iterations"])
    lr_decay_iter = int(tcfg["lr_decay_iter"])
    dtype = _dtype_from_config(config)

    gen_cfg = adv_cfg.get("generator")
    gen_frozen_fn = None
    if gen_cfg["name"] == "bisenet":
        generator, gen_pre, gen_sub = _make_bisenet(
            config.model["bisenet"], dtype)
    elif gen_cfg["name"] == "deeplab":
        # ours: the reference restricts DA to bisenet generators
        # (main.py:172) though the AdaptSegNet recipe it implements was
        # defined on DeepLab; the fused steps are model-generic (they
        # consume the (main, aux1, aux2) train tuple, and DeepLab
        # returns (x, None, None)), so we open the knob.  Frozen-BN
        # semantics carry over from the supervised path.
        generator, gen_pre = _make_deeplab(config.model["deeplab"], dtype)
        gen_sub = None
        gen_frozen_fn = frozen_bn_mask
    else:
        raise ValueError(
            "Invalid generator name. Please select deeplab or bisenet "
            "(the reference allows bisenet only, main.py:172; deeplab "
            "is our extension)")
    warmup = int(tcfg.get("warmup_iters", 0))
    gen_lr = float(gen_cfg["optimizer"]["lr"])
    gen_power = float(gen_cfg["power_lr_factor"])
    gen_sched = with_warmup(
        poly_lr_schedule(gen_lr, epochs * iterations, gen_power,
                         lr_decay_iter), warmup)
    gen_tx = _make_tx(gen_cfg["optimizer"], gen_sched, gen_frozen_fn,
                      generator, dtype)
    gen_bundle = ModelBundle(
        generator, gen_tx, make_criterion(gen_cfg["criterion"]),
        {"gen_init_lr": gen_lr, "gen_power": gen_power}, gen_pre, gen_sub)

    dis_cfg = adv_cfg.get("discriminator")
    in_ch = int(dis_cfg.get("input_channels", 19))
    if dis_cfg["name"] == "tiny":
        discriminator = TinyDomainDiscriminator(num_classes=in_ch, dtype=dtype)
    elif dis_cfg["name"] in ("fc", "full", "domain"):
        discriminator = DomainDiscriminator(num_classes=in_ch, dtype=dtype)
    else:
        raise ValueError(f"unknown discriminator {dis_cfg['name']!r}")
    dis_lr = float(dis_cfg["optimizer"]["lr"])
    dis_power = float(dis_cfg["power_lr_factor"])
    if str(tcfg.get("variant", "v1")) == "v2":
        dis_decay = poly_lr_schedule(dis_lr, epochs * iterations, dis_power,
                                     lr_decay_iter)
    else:
        dis_decay = poly_epoch_schedule(dis_lr, epochs, dis_power, iterations)
    dis_sched = with_warmup(dis_decay, warmup)
    dis_tx = _make_tx(dis_cfg["optimizer"], dis_sched, None, discriminator,
                      dtype)
    dis_bundle = ModelBundle(
        discriminator, dis_tx, make_criterion(dis_cfg["criterion"]),
        {"dis_init_lr": dis_lr, "dis_power": dis_power})

    return gen_bundle, dis_bundle
