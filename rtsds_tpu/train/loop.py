"""Training loops: supervised epochs and the adversarial DA loop.

Orchestration parity with the reference loops (``train.py:24-128`` and
``train.py:130-319``): per-batch/epoch callback fan-out with the same log
keys, epoch summary tables, validation every ``do_validation`` epochs via
the per-class reporter, and checkpoint-on-best -- with the reference's
``best_mIoU`` per-epoch-reset bug fixed (tracking is cross-epoch here;
``train.py:162``, SURVEY.md §7).

TPU-first mechanics: the loop never blocks on step metrics -- it logs the
*previous* step's (already materialized) scalars while the current step
runs, keeping the device queue full.  All compute is inside the fused jit
steps; the loop is pure orchestration.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable



from rtsds_tpu.eval.validate import make_eval_step, validate
from rtsds_tpu.utils.tabular import tabular_print


def _fan_out(callbacks, method: str, *args, **kwargs):
    for cb in callbacks or []:
        getattr(cb, method)(*args, **kwargs)


def _copy_tree(tree):
    """Donation-proof device copy of a state pytree (one extra state of
    HBM while an epoch runs -- the price of a crash-consistent
    epoch-start snapshot)."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True) if hasattr(a, "shape") else a,
        tree)


def train_epoch(state, train_step, batches: Iterable, epoch: int,
                callbacks=None, log_every: int = 1):
    """One supervised epoch (``train.py:24-128``).

    ``batches`` yields device-ready (images, labels).  Returns
    (state, {'train_loss', 'train_accuracy'}).
    """
    _fan_out(callbacks, "on_train_begin")
    running_loss = 0.0
    correct = 0
    total = 0
    pending = None  # (batch_idx, metrics) from the previous step
    n_batches = 0

    def consume(item):
        nonlocal running_loss, correct, total
        batch_idx, metrics = item
        loss = float(metrics["train_loss"])
        running_loss += loss
        correct += int(metrics["correct"])
        total += int(metrics["total"])
        logs = {
            "train_loss": loss,
            "train_accuracy": 100.0 * correct / max(total, 1),
        }
        # extra step metrics (e.g. distillation's loss_ce/loss_distill)
        # pass through to the callbacks; the counters stay internal
        for k, v in metrics.items():
            if k not in ("train_loss", "correct", "total"):
                logs[k] = float(v)
        _fan_out(callbacks, "on_batch_end", batch_idx, logs)

    for batch_idx, (images, labels) in enumerate(batches):
        state, metrics = train_step(state, images, labels)
        n_batches += 1
        if pending is not None:
            consume(pending)
        pending = (batch_idx, metrics)
    if pending is not None:
        consume(pending)

    train_loss = running_loss / max(n_batches, 1)
    train_accuracy = 100.0 * correct / max(total, 1)
    print(f"Train Epoch: {epoch + 1} Loss: {train_loss:.6f} "
          f"Acc: {train_accuracy:.2f}%")
    _fan_out(callbacks, "on_epoch_end", epoch, {
        "train_loss": train_loss, "train_accuracy": train_accuracy})
    return state, {"train_loss": train_loss, "train_accuracy": train_accuracy}


def supervised_fit(state, train_step, make_train_batches: Callable,
                   make_val_batches: Callable, epochs: int, num_classes: int,
                   class_names=None, callbacks=None, do_validation: int = 1,
                   checkpoint=None, start_epoch: int = 0, eval_step=None,
                   ema_decay: float | None = None, ema_params=None):
    """Full supervised run: epochs x (train_epoch + val) (``main.py:349-374``).

    ``start_epoch`` > 0 resumes mid-run (see ModelCheckpoint.resume);
    combined with the loaders' epoch-keyed shuffles and the epoch-folded
    augmentation keys, a resumed run consumes exactly the batches the
    uninterrupted run would have.

    ``eval_step`` overrides the default validation program (e.g. the
    multi-scale ensemble or sliding-window protocols, config
    ``validation:``).  ``ema_decay`` maintains an exponential moving
    average of the params alongside training and VALIDATES on the EMA
    weights; the EMA tree is checkpointed as an ``ema`` item so
    ``--validate_only``/serving can reproduce the reported mIoU, and
    ``ema_params`` (from a resume) seeds it -- otherwise it restarts
    from the current params.
    """
    callbacks = callbacks or []
    # checkpoint providers must read the LIVE state: ``on_epoch_end``
    # fires inside train_epoch, where this function's ``state`` local is
    # still the epoch-START object -- whose buffers the epoch's first
    # step already donated (saving them raises 'Array has been
    # deleted').  The step wrapper below publishes each step's output
    # here; ``ema_params`` is already live via its nonlocal rebinding.
    live = {"state": state}

    def _states():
        out = {"model": live["state"]}
        if ema_params is not None:
            out["ema"] = {"params": ema_params}
        return out

    if checkpoint is not None:
        if checkpoint not in callbacks:
            callbacks = [*callbacks, checkpoint]
    # return_preds must be on whenever an image-plot callback is listening,
    # otherwise validate() never calls add_sample and no images are written
    plot_cbs = any(hasattr(cb, "add_sample") for cb in callbacks)
    if eval_step is None:
        eval_step = make_eval_step(state.apply_fn, num_classes,
                                   return_preds=plot_cbs)
    if ema_decay is not None:
        from rtsds_tpu.train.ema import setup_ema

        ema_params, ema_apply = setup_ema(state.params, ema_decay,
                                          seed=ema_params)
        base_step = train_step

        def train_step(st, images, labels):  # noqa: F811 -- EMA wrapper
            nonlocal ema_params
            new_state, metrics = base_step(st, images, labels)
            ema_params = ema_apply(ema_params, new_state.params,
                                   new_state.step)
            return new_state, metrics
    else:
        ema_params = None  # stray ema state without a decay is ignored

    stepped = train_step

    def train_step(st, images, labels):  # noqa: F811 -- live-state tracking
        new_state, metrics = stepped(st, images, labels)
        live["state"] = new_state
        return new_state, metrics

    history = []
    try:
        for epoch in range(start_epoch, epochs):
            if checkpoint is not None:
                # EPOCH-START device copies feed the emergency path: the
                # live state's buffers are donated by this epoch's first
                # step (saving them raises 'Array has been deleted'), and
                # only an epoch-start snapshot makes the EMERGENCY-marker
                # replay reproduce the uninterrupted run exactly (a
                # mid-epoch snapshot would re-train consumed batches and
                # double-apply EMA updates)
                snap = _copy_tree(_states())
                checkpoint.attach(_states, lambda snap=snap: snap)
                checkpoint._epoch = epoch
            state, train_logs = train_epoch(state, train_step,
                                            make_train_batches(epoch), epoch,
                                            callbacks)
            if do_validation and epoch % do_validation == 0:
                val_state = (state.replace(params=ema_params)
                             if ema_params is not None else state)
                miou, per_class = validate(
                    val_state, make_val_batches(epoch), num_classes,
                    class_names=class_names, epoch=epoch, callbacks=callbacks,
                    detailed_report=class_names is not None,
                    eval_step=eval_step)
                history.append({"epoch": epoch, **train_logs,
                                "validation_mIoU": miou})
            if any(getattr(cb, "should_stop", False) for cb in callbacks):
                break
    except Exception:
        # the reference loses the whole run on any crash (SURVEY §5.3);
        # snapshot the live state before propagating so --resume works
        if checkpoint is not None:
            checkpoint.save_emergency()
        raise
    _fan_out(callbacks, "on_train_end")
    return state, history


def adversarial_fit(gen_state, dis_state, da_step, source_iter, target_iter,
                    make_val_batches: Callable, iterations: int, epochs: int,
                    num_classes: int, class_names=None, callbacks=None,
                    do_validation: int = 1, checkpoint=None,
                    variant: str = "v1", when_print: int = -1,
                    start_epoch: int = 0, eval_step=None,
                    ema_decay: float | None = None, ema_params=None,
                    ema_in_step: bool = False):
    """Adversarial DA loop (``train.py:130-319`` / ``:322-500``).

    ``source_iter`` / ``target_iter`` are infinite device-batch iterators
    (GTA5 / Cityscapes).  Per epoch: ``iterations`` fused G/D steps, the
    epoch summary table, per-class validation, checkpoint-on-best of both
    networks (cross-epoch best).

    ``ema_decay`` keeps a mean-teacher EMA of the GENERATOR params,
    validates on it and checkpoints it as an ``ema`` item (so
    ``--validate_only``/serving reproduce the reported mIoU);
    ``ema_params`` (from a resume) seeds it.

    ``ema_in_step``: the step updates the teacher ITSELF (self-training
    steps, ``train/self_training.py``) and takes/returns it —
    ``step(g, d, ema, src, lbl, tgt) -> (g, d, ema, metrics)``; the loop
    only seeds, checkpoints and validates on it (``ema_decay`` is baked
    into the step and ignored here).
    """
    callbacks = callbacks or []
    if checkpoint is not None:
        if checkpoint not in callbacks:
            callbacks = [*callbacks, checkpoint]
    plot_cbs = any(hasattr(cb, "add_sample") for cb in callbacks)
    if eval_step is None:
        eval_step = make_eval_step(gen_state.apply_fn, num_classes,
                                   return_preds=plot_cbs)
    loss_keys = ["loss_gen_source", "loss_adversarial", "loss_pseudo",
                 "pl_coverage", "mix_coverage", "loss_entropy",
                 "loss_disc_source", "loss_disc_target",
                 # v2-only totals (reference train.py:480-483 epoch logs)
                 "loss_gen_total", "loss_disc_total"]
    ema_apply = None
    if ema_in_step:
        # the fused step owns the teacher update; seed/commit only (a
        # resume-restored tree is host numpy -- commit to device so the
        # step's donation can reuse the buffers in place)
        import jax

        from rtsds_tpu.train.ema import ema_init

        ema_params = (ema_init(gen_state.params) if ema_params is None
                      else jax.tree_util.tree_map(jax.numpy.asarray,
                                                  ema_params))
    elif ema_decay is not None:
        from rtsds_tpu.train.ema import setup_ema

        ema_params, ema_apply = setup_ema(gen_state.params, ema_decay,
                                          seed=ema_params)
    else:
        ema_params = None

    def _states():
        out = {"generator": gen_state, "discriminator": dis_state}
        if ema_params is not None:
            out["ema"] = {"params": ema_params}
        return out

    history = []

    try:
        for epoch in range(start_epoch, epochs):
            _fan_out(callbacks, "on_train_begin")
            if checkpoint is not None:
                # EPOCH-START copies for the emergency path: G/D are
                # rebound (and donated) every iteration, so a mid-epoch
                # snapshot would both hit deleted buffers and make the
                # marker-driven replay re-train already-consumed
                # iterations (optimizer step counter and poly-LR would
                # double-advance); replay from the epoch start is exact
                snap = _copy_tree(_states())
                checkpoint._epoch = epoch
                checkpoint.attach(_states, lambda snap=snap: snap)
            running = {k: 0.0 for k in loss_keys}
            correct = 0
            total = 0
            pending = None
            metrics = {}  # summary key filter needs it bound if iterations==0
            t0 = time.perf_counter()

            def consume(item):
                nonlocal correct, total
                i, metrics = item
                logs = {}
                for k in loss_keys:
                    if k in metrics:
                        v = float(metrics[k])
                        running[k] += v
                        logs[k] = v
                correct += int(metrics["correct"])
                total += int(metrics["total"])
                _fan_out(callbacks, "on_batch_end", i, logs)
                # periodic console print (the config `when_print` knob the
                # reference accepts but never uses, train.py:136)
                if when_print > 0 and (i + 1) % when_print == 0:
                    print(f"  iter {i + 1}/{iterations}: " + ", ".join(
                        f"{k}={v:.4f}" for k, v in logs.items()))

            for i in range(iterations):
                src_images, src_labels = next(source_iter)
                tgt_images, _ = next(target_iter)
                if ema_in_step:
                    gen_state, dis_state, ema_params, metrics = da_step(
                        gen_state, dis_state, ema_params,
                        src_images, src_labels, tgt_images)
                else:
                    gen_state, dis_state, metrics = da_step(
                        gen_state, dis_state, src_images, src_labels,
                        tgt_images)
                    if ema_params is not None:
                        ema_params = ema_apply(ema_params, gen_state.params,
                                               gen_state.step)
                if pending is not None:
                    consume(pending)
                pending = (i, metrics)
            if pending is not None:
                consume(pending)

            dt = time.perf_counter() - t0
            # only keys the step actually produced (self-training adds
            # loss_pseudo/pl_coverage; plain v1/v2 must not print zeros)
            summary = {k: running[k] / iterations for k in loss_keys
                       if k in metrics}
            summary["Generator Accuracy"] = 100.0 * correct / max(total, 1)
            summary["steps_per_sec"] = iterations / dt
            print(f"Epoch Results {epoch}")
            tabular_print(summary)
            _fan_out(callbacks, "on_epoch_end", epoch, summary)

            if do_validation and epoch % do_validation == 0:
                print("-" * 50, "Validation", "-" * 50)
                val_state = (gen_state.replace(params=ema_params)
                             if ema_params is not None else gen_state)
                miou, per_class = validate(
                    val_state, make_val_batches(epoch), num_classes,
                    class_names=class_names, epoch=epoch, callbacks=callbacks,
                    detailed_report=True, eval_step=eval_step)
                print("-" * 100)
                history.append({"epoch": epoch, **summary,
                                "validation_mIoU": miou})
            if any(getattr(cb, "should_stop", False) for cb in callbacks):
                break

    except Exception:
        # snapshot G and D before propagating (SURVEY §5.3)
        if checkpoint is not None:
            checkpoint.save_emergency()
        raise

    _fan_out(callbacks, "on_train_end")
    return gen_state, dis_state, history
