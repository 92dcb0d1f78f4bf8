"""CLI entry point, flag-compatible with the reference's ``main.py``.

Flags (``main.py:233-260``): ``--config`` (yaml path), ``--dataset``
(cityscapes|gta5), ``--augmented``, ``--domain_adaptation``, ``--model``
(bisenet|deeplab), ``--wandb``, ``--seed``.

Run: ``python main.py --config config.yaml [--domain_adaptation] ...``

Orchestration parity with ``main.py:272-374``: build datasets/loaders,
callbacks (W&B if flagged, plus the checkpoint/early-stopping/image-plot
callbacks the reference declared in config.yaml but never implemented),
build models + optimizers, dispatch to the supervised or adversarial loop.
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

from rtsds_tpu.config import load_config, parse_int_list
from rtsds_tpu.utils.seeding import set_seed


def argument_parser(argv=None):
    parser = argparse.ArgumentParser(
        description="Semantic Segmentation and Domain Adaptation (TPU-native)")
    parser.add_argument("--config", type=str, default="config.yaml",
                        help="Path to the config file. [Default is config.yaml.]")
    parser.add_argument("--dataset", type=str, default="cityscapes",
                        help="Dataset for training without domain adaptation: "
                             "cityscapes or gta5. [Default is cityscapes.]")
    parser.add_argument("--augmented", action="store_true",
                        help="Apply augmentation (GTA5 dataset only).")
    parser.add_argument("--domain_adaptation", action="store_true",
                        help="Run adversarial domain-adaptation training.")
    parser.add_argument("--model", type=str, default="bisenet",
                        help="Segmentation model: deeplab or bisenet. "
                             "[Default is bisenet.]")
    parser.add_argument("--wandb", action="store_true",
                        help="Log to the W&B platform.")
    parser.add_argument("--seed", type=int, default=42,
                        help="Seed for reproducibility. [Default is 42.]")
    parser.add_argument("--synthetic", action="store_true",
                        help="(ours) run on synthetic data -- smoke testing "
                             "without the datasets on disk.")
    parser.add_argument("--resume", action="store_true",
                        help="(ours) resume from the latest checkpoint.")
    parser.add_argument("--validate_only", action="store_true",
                        help="(ours) no training: restore the best/latest "
                             "checkpoint and run validation once (mIoU + "
                             "per-class table).")
    parser.add_argument("--debug", action="store_true",
                        help="(ours) paranoid mode: jax_debug_nans re-runs "
                             "NaN-producing ops un-jitted and raises.")
    parser.add_argument("--multihost", action="store_true",
                        help="(ours) initialize jax.distributed before "
                             "anything touches devices -- run one process "
                             "per host (args auto-detected on Cloud TPU); "
                             "config batch sizes are then GLOBAL and each "
                             "process loads only its shard.")
    return parser.parse_args(argv)


def datasets_loader(config, is_augmented: bool, synthetic: bool = False,
                    seed: int = 42):
    """Build (cs_train, cs_val, gta5_train) loaders + device transforms
    (``datasets_loader``, ``main.py:60-108``).

    Returns dict with host loaders, jitted transforms and sizes.
    """
    from rtsds_tpu.data.indexing import build_cityscapes_index, build_gta5_index
    from rtsds_tpu.data.pipeline import DataLoader, SegmentationDataset
    from rtsds_tpu.data.synthetic import SyntheticSegDataset
    from rtsds_tpu.ops.augment import AugmentConfig
    from rtsds_tpu.ops.preprocess import make_transform

    cs = config.data.get("cityscapes")
    gta5 = config.data.get("gta5_modified")
    cs_size = tuple(parse_int_list(cs["image_size"]))
    gta5_size = tuple(parse_int_list(gta5["image_size"]))

    if synthetic:
        # data.synthetic.fixed_tints (ours): one class->color mapping
        # shared by train and val, so short --synthetic runs reach high
        # mIoU — what trained-model accuracy-delta gates need.  Default
        # false keeps the historical per-image mappings.
        fx = bool(config.data.get("synthetic", {}).get("fixed_tints",
                                                       False))
        cs_train_ds = SyntheticSegDataset(16, cs_size, cs["num_classes"],
                                          seed, fixed_tints=fx)
        cs_val_ds = SyntheticSegDataset(8, cs_size, cs["num_classes"],
                                        seed + 1, fixed_tints=fx)
        gta5_ds = SyntheticSegDataset(16, gta5_size, gta5["num_classes"],
                                      seed + 2, fixed_tints=fx)
    else:
        cs_train_ds = SegmentationDataset(
            build_cityscapes_index(cs["segmentation_train_dir"],
                                   cs["images_train_dir"]), cs_size)
        cs_val_ds = SegmentationDataset(
            build_cityscapes_index(cs["segmentation_val_dir"],
                                   cs["images_val_dir"]), cs_size)
        gta5_ds = SegmentationDataset(
            build_gta5_index(gta5["images_dir"], gta5["segmentation_dir"]),
            gta5_size,
            # raw GTA5 labels are RGB-coded: decode to trainIds at load
            # time (reference `in_getting_decoder`, gta5.py:51,66-70)
            decode_label_colors=bool(gta5.get("decode_label_colors", False)))

    aug_cfg = AugmentConfig.from_config(config) if is_augmented else None

    # multi-host: config batch sizes are GLOBAL; every process loads only
    # its slice of each batch and the arrays assemble per-device
    # (rtsds_tpu/data/multihost.py). Single-process keeps the plain loader.
    if jax.process_count() > 1:
        from rtsds_tpu.data.multihost import MultiHostDataLoader

        loader_cls = MultiHostDataLoader
    else:
        loader_cls = DataLoader

    # transforms (main.py:69-95): Cityscapes antialias resize + normalize;
    # GTA5 [augment] + resize + normalize; labels nearest + clamp.
    # Host loaders already resize to static size, so the device transform
    # resize is an identity no-op folded away by XLA.
    correct = bool(config.data.get("correct_preprocessing", False))
    cs_transform = jax.jit(make_transform(cs_size, cs["num_classes"],
                                          antialias=True,
                                          correct_preprocessing=correct))
    gta5_transform = jax.jit(make_transform(gta5_size, gta5["num_classes"],
                                            antialias=False,
                                            augment_cfg=aug_cfg,
                                            correct_preprocessing=correct))

    mk = partial(loader_cls, num_workers=cs["num_workers"], seed=seed)
    return {
        "cs_train": mk(cs_train_ds, cs["batch_size"], shuffle=True),
        "cs_val": mk(cs_val_ds, cs["batch_size"], shuffle=False,
                     drop_last=False),
        "gta5_train": mk(gta5_ds, gta5["batch_size"], shuffle=True),
        "cs_transform": cs_transform,
        "gta5_transform": gta5_transform,
        "cs_size": cs_size,
        "gta5_size": gta5_size,
    }


def build_callbacks(config, use_wandb: bool, mode_suffix: str = ""):
    """Callbacks from config (``main.py:292-300`` + the declared-but-never-
    implemented config.yaml:127-149 schema, implemented here)."""
    from rtsds_tpu.callbacks import (
        EarlyStopping,
        HistoryCallback,
        ImagePlotsCallback,
        ModelCheckpoint,
        WandBCallback,
    )

    cb_cfg = config.callbacks
    callbacks = []
    if use_wandb:
        logging_cfg = cb_cfg.get("logging")
        wb = logging_cfg.get("wandb") if logging_cfg else None
        if not wb:
            raise SystemExit(
                "--wandb passed but callbacks.logging.wandb is disabled "
                "(null) or missing in the config")
        callbacks.append(WandBCallback(project_name=wb["project_name"],
                                       run_name=wb["run_name"],
                                       config=config._asdict(),
                                       note=wb["note"]))
    # a section set to null in the user YAML disables it -- the
    # deep-merged defaults would otherwise make the default callbacks
    # impossible to turn off.  (An empty mapping {} does NOT disable:
    # deep-merge refills it with the defaults before it gets here.)
    checkpoint = None
    if cb_cfg.get("model_checkpoint"):
        mc = cb_cfg["model_checkpoint"]
        # namespace per training mode so supervised and DA runs sharing a
        # config don't collide on incompatible checkpoint item sets
        checkpoint = ModelCheckpoint(
            save_dir=mc["save_dir"], save_name=mc["save_name"] + mode_suffix,
            save_best=bool(mc.get("save_best", True)),
            monitor=mc.get("monitor", "validation_mIoU"),
            mode=mc.get("mode", "max"),
            save_freq=int(mc.get("save_freq", 1)))
    if cb_cfg.get("early_stopping"):
        es = cb_cfg["early_stopping"]
        callbacks.append(EarlyStopping(
            monitor=es.get("monitor", "validation_mIoU"),
            mode=es.get("mode", "max"),
            patience=int(es.get("patience", 5))))
    if cb_cfg.get("history"):
        callbacks.append(HistoryCallback(
            path=cb_cfg["history"].get("path", "history.jsonl")))
    if cb_cfg.get("images_plots"):
        ip = cb_cfg["images_plots"]
        callbacks.append(ImagePlotsCallback(
            save_dir=ip.get("save_dir", "images"),
            number_of_samples=int(ip.get("number_of_samples", 4))))
    return callbacks, checkpoint


def _device_batches(loader, transform, mesh, key=None, augment=False,
                    infinite=False, start_index: int = 0):
    """host loader -> sharded device batches through the fused transform.

    Multi-host loaders yield per-process shards; each becomes this
    process's span of a global batch-sharded array
    (``jax.make_array_from_process_local_data``) instead of a device_put.
    """
    from rtsds_tpu.data.multihost import MultiHostDataLoader
    from rtsds_tpu.parallel.mesh import input_sharding

    sharding = input_sharding(mesh)
    pc = loader.process_count if isinstance(loader, MultiHostDataLoader) else 1

    def put(arr):
        if pc > 1 or isinstance(loader, MultiHostDataLoader):
            return jax.make_array_from_process_local_data(
                sharding, arr, (arr.shape[0] * pc, *arr.shape[1:]))
        return jax.device_put(arr, sharding)

    def gen():
        i = start_index  # resume: continue the augmentation-key counter
        while True:
            for images, labels in loader:
                images = put(images)
                labels = put(labels)
                if augment and key is not None:
                    yield transform(images, labels, jax.random.fold_in(key, i))
                else:
                    yield transform(images, labels)
                i += 1
            if not infinite:
                return

    return gen()


def _ema_decay_from(tcfg):
    """training.*.ema config -> decay float, or None when disabled."""
    ema_cfg = tcfg.get("ema")
    if ema_cfg and bool(ema_cfg.get("enabled", False)):
        return float(ema_cfg.get("decay", 0.999))
    return None


def _build_eval_step(config, apply_fn, image_size, num_classes,
                     return_preds: bool = False):
    """Validation-protocol eval step from config ``validation:`` --
    multi-scale+flip ensemble or sliding-window (ours; the reference has
    no eval protocol beyond a plain forward, ``validation.py:45-51``).
    Returns None when neither is enabled (the loops build the default
    plain eval step).  ``return_preds`` must be on when an image-plot
    callback is listening, exactly like the default eval step."""
    from rtsds_tpu.config import parse_float_list

    vcfg = config.get("validation")
    ens = vcfg.get("ensemble") if vcfg else None
    sld = vcfg.get("sliding") if vcfg else None
    ens_on = bool(ens and ens.get("enabled", False))
    sld_on = bool(sld and sld.get("enabled", False))
    if ens_on and sld_on:
        raise SystemExit("validation.ensemble and validation.sliding are "
                         "mutually exclusive; enable at most one")
    if ens_on:
        from rtsds_tpu.eval.ensemble import make_ensemble_eval_step

        scales = parse_float_list(ens.get("scales", "0.75, 1.0, 1.25"))
        return make_ensemble_eval_step(
            apply_fn, image_size, num_classes, scales=scales,
            flip=bool(ens.get("flip", True)), return_preds=return_preds)
    if sld_on:
        from rtsds_tpu.eval.sliding import make_sliding_eval_step

        window = tuple(parse_int_list(sld.get("window", "512, 1024")))
        stride = sld.get("stride") or None
        if stride:
            stride = tuple(parse_int_list(stride))
        chunk = int(sld.get("window_chunk", 0) or 0)
        return make_sliding_eval_step(apply_fn, image_size, num_classes,
                                      window=window, stride=stride,
                                      return_preds=return_preds,
                                      window_chunk=chunk if chunk > 0
                                      else None)
    return None


def _run_validation_only(states: dict, which: str, checkpoint, val_batches,
                         num_classes: int, class_names, eval_step=None,
                         use_ema: bool = False):
    """--validate_only: restore the best (else latest) checkpoint and run
    one validation pass; no training.

    ``use_ema``: also restore the ``ema`` checkpoint item (written when
    training ran with EMA enabled) and validate on those weights, so the
    reported mIoU reproduces the training-time validation.
    """
    from rtsds_tpu.eval.validate import validate

    if checkpoint is None:
        raise SystemExit(
            "--validate_only needs a callbacks.model_checkpoint config "
            "section to locate the checkpoint")
    if use_ema:
        states = {**states, "ema": {"params": states[which].params}}
    mgr = checkpoint.attach(lambda: states).manager
    step = mgr.best_step()
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise SystemExit(
            f"--validate_only: no checkpoint found under "
            f"{checkpoint.save_dir}")
    restored = mgr.restore(states, step=step)
    # restore() hands back the TEMPLATE object for anything it could not
    # find -- random weights must never masquerade as a result
    if restored is states or restored[which] is states[which]:
        raise SystemExit(
            f"--validate_only: checkpoint at step {step} under "
            f"{checkpoint.save_dir} does not match this run's model "
            f"(restore skipped)")
    val_state = restored[which]
    if use_ema and restored.get("ema") is not states.get("ema"):
        val_state = val_state.replace(params=restored["ema"]["params"])
    miou, _ = validate(val_state, val_batches(0), num_classes,
                       class_names=class_names, detailed_report=True,
                       eval_step=eval_step)
    print(f"validate_only: checkpoint step {step} -> "
          f"validation_mIoU = {miou:.6f}")
    return miou


def main(argv=None):
    """CLI entry: run :func:`_main` with preemptible-VM discipline --
    SIGTERM becomes an emergency checkpoint + clean exit -- restoring the
    process's signal handlers afterwards (library/test callers keep their
    own semantics)."""
    from rtsds_tpu.utils.preemption import (
        install_preemption_handler,
        restore_handlers,
    )

    previous = install_preemption_handler()
    try:
        return _main(argv)
    finally:
        restore_handlers(previous)


def _main(argv=None):
    args = argument_parser(argv)
    if args.multihost:
        from rtsds_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()  # must precede any device access
    if args.debug:
        from rtsds_tpu.utils.debug import enable_debug

        enable_debug()
    root_key = set_seed(args.seed)
    config = load_config(args.config if args.config else None)
    cache_dir = getattr(config, "compilation_cache", "") or ""
    if cache_dir:
        from rtsds_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(cache_dir)

    from rtsds_tpu.parallel.mesh import make_mesh_from_config, place_state
    from rtsds_tpu.train.factory import build_adversarial, build_supervised
    from rtsds_tpu.train.loop import adversarial_fit, supervised_fit
    from rtsds_tpu.utils.preemption import Preempted

    # mesh spec (config.yaml `mesh: {data: N, spatial: S, model: M}`);
    # data -1 = fill; spatial shards image height, model FSDP-shards params
    mesh_spec = dict(getattr(config, "mesh", {"data": -1}))
    batch_size = int(config.data["cityscapes"]["batch_size"])
    mesh = make_mesh_from_config(mesh_spec, batch_size=min(
        batch_size, int(config.data["gta5_modified"]["batch_size"])))
    data = datasets_loader(config, is_augmented=args.augmented,
                           synthetic=args.synthetic, seed=args.seed)
    callbacks, checkpoint = build_callbacks(
        config, args.wandb,
        mode_suffix="_da" if args.domain_adaptation else "")
    class_names = list(config.meta["class_names"])
    init_key, aug_key = jax.random.split(root_key)

    if args.domain_adaptation:
        tcfg = config.training["domain_adaptation"]
        if "pipe" in mesh.axis_names:
            raise SystemExit(
                "mesh: {pipe: N} supports supervised DeepLab training "
                "only (the fused G/D steps have no pipelined variant); "
                "use a data/spatial/model mesh for domain adaptation")
        gen_bundle, dis_bundle = build_adversarial(config)
        import jax.numpy as jnp

        gta5_bs = config.data["gta5_modified"]["batch_size"]
        cs_bs = config.data["cityscapes"]["batch_size"]
        # independent init keys: G and D must not share correlated inits
        gen_key, dis_key = jax.random.split(init_key)
        gen_state = place_state(gen_bundle.init_state(
            gen_key, jnp.zeros((gta5_bs, *data["gta5_size"], 3))), mesh)
        dis_state = place_state(dis_bundle.init_state(
            dis_key, jnp.zeros((cs_bs, *data["cs_size"],
                                tcfg["num_classes"]))), mesh)

        ema_decay = _ema_decay_from(tcfg)
        st_cfg = tcfg.get("self_training")
        self_training = bool(st_cfg and st_cfg.get("enabled", False))
        # ignore_index follows the GENERATOR's model section (the
        # generator may be bisenet or, ours, deeplab)
        gen_name = config.model["adversarial_model"]["generator"]["name"]
        ignore_index = config.model[gen_name]["criterion"].get(
            "ignore_index")
        st_threshold = None
        st_calibration = None
        if self_training:
            # pseudo-label DA: mean-teacher EMA + v1 adversarial losses in
            # one fused step (train/self_training.py).  The step itself is
            # built AFTER resume, so threshold calibration can use the
            # restored teacher.
            if str(tcfg.get("variant", "v1")) != "v1":
                raise SystemExit("self_training composes with the v1 "
                                 "adversarial step only; set variant: v1")
            if ema_decay is None:
                raise SystemExit(
                    "self_training needs the mean-teacher: enable "
                    "training.domain_adaptation.ema (enabled: true)")
            cal_cfg = st_cfg.get("calibration")
            if cal_cfg and bool(cal_cfg.get("enabled", False)):
                # CBST quantile calibration over target batches replaces
                # the fixed threshold
                st_calibration = {
                    "portion": float(cal_cfg.get("portion", 0.5)),
                    "batches": int(cal_cfg.get("batches", 8)),
                }
            else:
                # threshold: scalar, or a per-class comma list (CBST-style)
                thr = st_cfg.get("threshold", 0.9)
                if isinstance(thr, str) and "," in thr:
                    from rtsds_tpu.config import parse_float_list

                    thr = parse_float_list(thr)
                    if len(thr) != int(tcfg["num_classes"]):
                        raise SystemExit(
                            f"self_training.threshold lists one value per "
                            f"class ({tcfg['num_classes']}), got {len(thr)}")
                else:
                    thr = float(thr)
                st_threshold = thr

        # DANN-style gradient-reversal training (discriminator.grl): one
        # fused backward; composes with the plain v1 step only
        grl_cfg = config.model["adversarial_model"]["discriminator"].get(
            "grl")
        grl_alpha = (float(grl_cfg.get("alpha", 0.1))
                     if grl_cfg and bool(grl_cfg.get("enabled", False))
                     else 0.0)
        if grl_alpha and self_training:
            raise SystemExit("discriminator.grl does not compose with "
                             "self_training (one joint backward vs the "
                             "teacher-student step); disable one")
        if grl_alpha and str(tcfg.get("variant", "v1")) != "v1":
            raise SystemExit("discriminator.grl composes with the v1 "
                             "adversarial step only; set variant: v1")

        # optional fused DA extras (both compose with v1/v2/self-training):
        # MinEnt target-entropy loss (ADVENT) and FDA source restyling
        ent_cfg = tcfg.get("entropy_min")
        lambda_ent = (float(ent_cfg.get("lambda", 0.005))
                      if ent_cfg and bool(ent_cfg.get("enabled", False))
                      else 0.0)
        fda_cfg = tcfg.get("fda")
        fda_beta = (float(fda_cfg.get("beta", 0.01))
                    if fda_cfg and bool(fda_cfg.get("enabled", False))
                    else 0.0)

        def val_batches(_epoch):
            return _device_batches(data["cs_val"], data["cs_transform"], mesh)

        plot_cbs = any(hasattr(cb, "add_sample") for cb in callbacks)
        eval_step = _build_eval_step(config, gen_state.apply_fn,
                                     data["cs_size"],
                                     int(tcfg["num_classes"]),
                                     return_preds=plot_cbs)

        if args.validate_only:
            _run_validation_only(
                {"generator": gen_state, "discriminator": dis_state},
                "generator", checkpoint, val_batches,
                int(tcfg["num_classes"]), class_names, eval_step=eval_step,
                use_ema=ema_decay is not None)
            return

        start_epoch = 0
        resumed_ema = None
        if args.resume and checkpoint is not None:
            templates = {"generator": gen_state, "discriminator": dis_state}
            if ema_decay is not None:
                templates["ema"] = {"params": gen_state.params}
            restored, start_epoch = checkpoint.resume(templates)
            gen_state = restored["generator"]
            dis_state = restored["discriminator"]
            # identity = restore() kept the template (no stored ema item):
            # the loop then restarts the EMA from the restored params
            if (ema_decay is not None
                    and restored.get("ema") is not templates["ema"]):
                resumed_ema = restored["ema"]["params"]

        # fast-forward the infinite source/target streams and the
        # augmentation counter past the completed epochs' batches, so the
        # resumed run draws exactly the shuffles/augmentations the
        # uninterrupted run would have (index-level skip, no decode cost)
        consumed = start_epoch * int(tcfg["iterations"])
        for loader in (data["gta5_train"], data["cs_train"]):
            per_pass = max(len(loader), 1)
            loader.set_epoch(consumed // per_pass)
            loader.skip_batches(consumed % per_pass)

        source_iter = _device_batches(
            data["gta5_train"], data["gta5_transform"], mesh, key=aug_key,
            augment=args.augmented, infinite=True, start_index=consumed)
        target_iter = _device_batches(
            data["cs_train"], data["cs_transform"], mesh, infinite=True)

        if self_training:
            from rtsds_tpu.train.self_training import make_self_training_step

            thr = st_threshold
            if st_calibration is not None:
                import itertools

                import numpy as np

                from rtsds_tpu.train.self_training import (
                    calibrate_class_thresholds,
                )

                # teacher = the resumed EMA (stage-2 workflow: --resume
                # from an adversarially-trained checkpoint) or the fresh
                # init; a SEPARATE finite pass over the target loader so
                # the training stream position is untouched
                teacher = (resumed_ema if resumed_ema is not None
                           else gen_state.params)
                variables = {"params": teacher}
                if gen_state.batch_stats is not None:
                    variables["batch_stats"] = gen_state.batch_stats
                cal_iter = itertools.islice(
                    _device_batches(data["cs_train"], data["cs_transform"],
                                    mesh),
                    st_calibration["batches"])
                thr = calibrate_class_thresholds(
                    gen_state.apply_fn, variables, cal_iter,
                    int(tcfg["num_classes"]),
                    portion=st_calibration["portion"])
                print("self-training calibration (portion="
                      f"{st_calibration['portion']}): thresholds "
                      f"{np.round(thr, 3).tolist()}")
            cm_cfg = st_cfg.get("classmix")
            da_step = make_self_training_step(
                lambda_=float(tcfg["lambda"]),
                iterations=int(tcfg["iterations"]),
                ignore_index=19 if ignore_index is None else ignore_index,
                threshold=thr,
                lambda_pl=float(st_cfg.get("lambda_pl", 1.0)),
                ema_decay=ema_decay,
                lambda_ent=lambda_ent, fda_beta=fda_beta,
                classmix=bool(cm_cfg and cm_cfg.get("enabled", False)),
                classmix_seed=int(args.seed))
        else:
            from rtsds_tpu.train.adversarial import make_adversarial_step

            da_step = make_adversarial_step(
                lambda_=float(tcfg["lambda"]),
                iterations=int(tcfg["iterations"]),
                epochs=int(tcfg["epochs"]),
                ignore_index=ignore_index,
                variant=str(tcfg.get("variant", "v1")),
                lambda_ent=lambda_ent, fda_beta=fda_beta,
                grl_alpha=grl_alpha)

        try:
            adversarial_fit(
                gen_state, dis_state, da_step, source_iter, target_iter,
                val_batches, iterations=int(tcfg["iterations"]),
                epochs=int(tcfg["epochs"]),
                num_classes=int(tcfg["num_classes"]),
                class_names=class_names, callbacks=callbacks,
                do_validation=int(tcfg["do_validation"]),
                checkpoint=checkpoint,
                when_print=int(tcfg.get("when_print", -1)),
                start_epoch=start_epoch, eval_step=eval_step,
                ema_decay=ema_decay, ema_params=resumed_ema,
                ema_in_step=self_training)
        except Preempted as e:
            if checkpoint is not None:
                print(f"Preempted ({e}); exiting -- restart with --resume "
                      f"to continue from the last checkpoint.")
            else:
                print(f"Preempted ({e}); no checkpoint callback configured, "
                      f"progress NOT saved.")
            return
    else:
        if args.dataset == "gta5":
            print(" ------> Training on GTA5, validating on Cityscapes ------ ")
            train_loader, train_transform = data["gta5_train"], data["gta5_transform"]
            train_augment = args.augmented
        else:
            train_loader, train_transform = data["cs_train"], data["cs_transform"]
            train_augment = False

        tcfg = config.training.get("segmentation")
        bundle = build_supervised(config, args.model, len(train_loader))
        import jax.numpy as jnp

        section = "gta5_modified" if args.dataset == "gta5" else "cityscapes"
        bs = config.data[section]["batch_size"]
        size = data["gta5_size"] if args.dataset == "gta5" else data["cs_size"]
        state = place_state(
            bundle.init_state(init_key, jnp.zeros((bs, *size, 3))), mesh)

        from rtsds_tpu.train.supervised import make_train_step

        cfg_model = config.model[
            "bisenet" if args.model == "bisenet" else "deeplab"]
        ignore_index = cfg_model["criterion"].get("ignore_index")
        accumulate_steps = int(tcfg.get("accumulate_steps", 1))
        pipelined = "pipe" in mesh.axis_names
        dist_cfg = tcfg.get("distillation")
        distillation = bool(dist_cfg and dist_cfg.get("enabled", False))
        if pipelined:
            # GPipe over DeepLab's layer3 (train/pipelined.py): exact
            # gradient-accumulation semantics, so it replaces (not
            # composes with) accumulate_steps; microbatch count defaults
            # to the pipe size
            if args.model != "deeplab":
                raise SystemExit(
                    "mesh: {pipe: N} pipelines DeepLab's homogeneous "
                    "layer3 bottlenecks; --model deeplab required")
            if distillation:
                raise SystemExit("mesh.pipe does not compose with "
                                 "distillation; pick one")
            if accumulate_steps > 1:
                raise SystemExit(
                    "mesh.pipe already microbatches (GPipe == gradient "
                    "accumulation); set training.segmentation."
                    "pipe_microbatches instead of accumulate_steps")
            if bool(cfg_model.get("bn_eval", False)):
                raise SystemExit(
                    "mesh.pipe does not support model.deeplab.bn_eval "
                    "yet: the pipelined schedule threads per-microbatch "
                    "batch-stats BN; running it with frozen stats would "
                    "silently diverge from the same config on a non-pipe "
                    "mesh. Disable bn_eval or drop the pipe axis.")
            from rtsds_tpu.train.pipelined import make_pipelined_train_step

            n_micro_cfg = tcfg.get("pipe_microbatches")
            n_micro = (mesh.shape["pipe"] if n_micro_cfg is None
                       else int(n_micro_cfg))
            if n_micro < 1:
                raise SystemExit(
                    f"training.segmentation.pipe_microbatches "
                    f"{n_micro_cfg} must be >= 1 (or null for the pipe "
                    f"size)")
            if bs % n_micro:
                raise SystemExit(
                    f"batch_size {bs} does not split into {n_micro} "
                    f"pipeline microbatches")
            try:
                train_step = make_pipelined_train_step(
                    bundle.model, mesh, ignore_index=ignore_index,
                    num_microbatches=n_micro)
            except ValueError as e:
                raise SystemExit(str(e))
        elif distillation:
            # frozen-teacher KD: teacher forward + student CE+KL in one
            # fused program (train/distill.py); teacher weights ride as a
            # replicated argument, never baked into the HLO
            if accumulate_steps > 1:
                raise SystemExit("distillation does not compose with "
                                 "accumulate_steps > 1; pick one")
            t_cfg = dist_cfg.get("teacher") or {}
            t_dir = t_cfg.get("checkpoint_dir", "") or ""
            if not t_dir:
                raise SystemExit("distillation needs training.segmentation."
                                 "distillation.teacher.checkpoint_dir (a "
                                 "trained ModelCheckpoint directory)")
            teacher_name = str(t_cfg.get("model", "deeplab"))
            from rtsds_tpu.parallel.mesh import replicated_sharding
            from rtsds_tpu.train.distill import (
                load_teacher_variables,
                make_distill_step,
            )

            quantize = t_cfg.get("quantize") or None
            if quantize not in (None, "int8"):
                raise SystemExit(
                    f"distillation.teacher.quantize {quantize!r} is not "
                    "supported (null or int8)")
            n_calib = int(t_cfg.get("calib_batches", 2))
            if quantize and n_calib < 1:
                raise SystemExit("distillation.teacher.calib_batches "
                                 f"{n_calib} must be >= 1")
            teacher_vars = jax.device_put(
                load_teacher_variables(
                    t_dir, use_ema=bool(t_cfg.get("use_ema", True))),
                replicated_sharding(mesh))
            if quantize == "int8" and not args.validate_only:
                # W8A8 the frozen teacher via the serving PTQ driver,
                # calibrated on batches exactly as the STEP will see
                # them (augmented when augmentation is on).  Skipped
                # under --validate_only: the train step never runs, and
                # calibration costs a teacher compile.
                from rtsds_tpu.train.distill import quantize_teacher

                calib = []
                for images, _ in _device_batches(
                        train_loader, train_transform, mesh,
                        key=(jax.random.fold_in(aug_key, 0)
                             if train_augment else None),
                        augment=train_augment):
                    calib.append(images)
                    if len(calib) >= n_calib:
                        break
                # the calibration consumed part of a shuffle pass
                # (loader._epoch advanced); rewind so epoch 0 draws the
                # same permutation as an unquantized run (the
                # deterministic-resume contract, data/pipeline.py)
                train_loader.set_epoch(0)
                teacher_apply, teacher_vars = quantize_teacher(
                    teacher_name, teacher_vars, calib)
                teacher_vars = jax.device_put(teacher_vars,
                                              replicated_sharding(mesh))
            else:
                teacher_bundle = build_supervised(config, teacher_name,
                                                  len(train_loader))
                teacher_apply = teacher_bundle.model.apply
            d_step = make_distill_step(
                teacher_apply, ignore_index=ignore_index,
                temperature=float(dist_cfg.get("temperature", 2.0)),
                alpha=float(dist_cfg.get("alpha", 0.5)))

            def train_step(st, images, labels):
                return d_step(st, teacher_vars, images, labels)
        elif accumulate_steps > 1:
            # K micro-batches through one lax.scan jit program, one
            # optimizer update (train/accumulate.py); the configured
            # batch_size is split K ways
            from rtsds_tpu.train.accumulate import (
                make_accumulating_train_step,
                split_microbatches,
            )

            if bs % accumulate_steps:
                raise SystemExit(
                    f"batch_size {bs} does not divide into "
                    f"accumulate_steps={accumulate_steps} micro-batches")
            acc_step = make_accumulating_train_step(ignore_index=ignore_index)

            def train_step(st, images, labels):
                return acc_step(st,
                                split_microbatches(images, accumulate_steps),
                                split_microbatches(labels, accumulate_steps))
        else:
            train_step = make_train_step(ignore_index=ignore_index)

        ema_decay = _ema_decay_from(tcfg)
        plot_cbs = any(hasattr(cb, "add_sample") for cb in callbacks)
        eval_step = _build_eval_step(config, state.apply_fn, data["cs_size"],
                                     int(tcfg["num_classes"]),
                                     return_preds=plot_cbs)

        def train_batches(epoch):
            # fold the epoch into the augmentation key: without this the
            # per-epoch generator restarts its batch counter at 0 and every
            # epoch's k-th batch draws identical blur/flip/jitter randomness
            return _device_batches(train_loader, train_transform, mesh,
                                   key=jax.random.fold_in(aug_key, epoch),
                                   augment=train_augment)

        def val_batches(_epoch):
            return _device_batches(data["cs_val"], data["cs_transform"], mesh)

        if args.validate_only:
            _run_validation_only({"model": state}, "model", checkpoint,
                                 val_batches, int(tcfg["num_classes"]),
                                 class_names, eval_step=eval_step,
                                 use_ema=ema_decay is not None)
            return

        start_epoch = 0
        resumed_ema = None
        if args.resume and checkpoint is not None:
            templates = {"model": state}
            if ema_decay is not None:
                templates["ema"] = {"params": state.params}
            restored, start_epoch = checkpoint.resume(templates)
            state = restored["model"]
            if (ema_decay is not None
                    and restored.get("ema") is not templates["ema"]):
                resumed_ema = restored["ema"]["params"]
            # fast-forward the shuffle so resumed epochs see exactly the
            # sample order the uninterrupted run would have drawn
            train_loader.set_epoch(start_epoch)

        try:
            supervised_fit(
                state, train_step, train_batches, val_batches,
                epochs=int(tcfg["epochs"]),
                num_classes=int(tcfg["num_classes"]),
                class_names=class_names, callbacks=callbacks,
                do_validation=int(tcfg["do_validation"]),
                checkpoint=checkpoint, start_epoch=start_epoch,
                eval_step=eval_step, ema_decay=ema_decay,
                ema_params=resumed_ema)
        except Preempted as e:
            if checkpoint is not None:
                print(f"Preempted ({e}); exiting -- restart with --resume "
                      f"to continue from the last checkpoint.")
            else:
                print(f"Preempted ({e}); no checkpoint callback configured, "
                      f"progress NOT saved.")
            return


if __name__ == "__main__":
    main()
