"""Validation: jitted eval step with on-device confusion matrix.

Capability parity with ``validation.py``: ``val`` (``validation.py:12-77``)
and ``val_GTA5`` (``validation.py:79-149``) accumulate a 19x19 confusion
matrix over the loader, report mIoU (nanmean of per-class IoU) and -- for
the GTA5 variant -- a per-class IoU table forwarded to callbacks.

TPU-first: the reference copies every batch to host and runs numpy bincount
(``validation.py:54,120-124``); here argmax + hist-update run inside one jit
program and the matrix stays device-resident until the epoch ends (one
device->host transfer per validation).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.utils.metrics import fast_hist, per_class_iou

_PALLAS_HIST_OK: bool | None = None


def _pallas_hist_available() -> bool:
    """Probe whether the Pallas MXU histogram compiles+runs on the actual
    execution backend (a plugin may report 'tpu' while execution is CPU,
    or a TPU backend may lack Mosaic support) -- cached per process."""
    global _PALLAS_HIST_OK
    if _PALLAS_HIST_OK is None:
        if jax.default_backend() == "cpu":
            _PALLAS_HIST_OK = False
        else:
            try:
                from rtsds_tpu.ops.pallas.hist import TILE, fast_hist_pallas

                # 2 tiles: exercises the multi-step grid path, not just the
                # whole-array block special case
                n = 2 * TILE
                out = fast_hist_pallas(jnp.zeros((n,), jnp.int32),
                                       jnp.zeros((n,), jnp.int32), 19)
                _PALLAS_HIST_OK = int(out[0, 0]) == n
            except Exception:
                _PALLAS_HIST_OK = False
    return _PALLAS_HIST_OK


def _host_local(a) -> np.ndarray | None:
    """Array -> host numpy; for multi-process global arrays (which cannot
    be fetched whole: they span non-addressable devices) returns the
    concatenation of this process's addressable shards -- image-plot
    callbacks then sample the local part of the batch, which is exactly
    the data this host loaded.

    Returns None when the local shards do not hold WHOLE samples (the
    array is also sharded along a non-batch axis, e.g. a composed
    data x spatial mesh): stitching only the batch dimension would
    silently emit truncated images, so the caller skips plotting instead.
    """
    try:
        return np.asarray(a)
    except RuntimeError:
        shards = sorted(a.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
        if any(s.data.shape[1:] != a.shape[1:] for s in shards):
            return None  # sample fragments only: cannot reconstruct
        seen = set()
        parts = []
        for s in shards:  # replicated shards repeat an index: keep one
            start = s.index[0].start or 0
            if start not in seen:
                seen.add(start)
                parts.append(np.asarray(s.data))
        return np.concatenate(parts)


def make_eval_step(apply_fn: Callable, num_classes: int,
                   return_preds: bool = False,
                   use_pallas: bool | None = None):
    """Returns ``eval_step(variables, images, labels, hist) -> hist`` (or
    ``(hist, preds)`` when ``return_preds``, for image-plot callbacks).

    ``hist`` is carried as a device array; the argmax, masking and
    histogram update all fuse into the forward program.  On TPU the
    histogram uses the Pallas MXU kernel (one-hot matmul) instead of the
    serial scatter-add ``bincount`` lowering; ``use_pallas`` overrides the
    auto-detection.
    """
    if use_pallas is None:
        use_pallas = _pallas_hist_available()

    def hist_update(labels, preds):
        if use_pallas:
            from rtsds_tpu.ops.pallas.hist import fast_hist_pallas

            return fast_hist_pallas(labels, preds, num_classes)
        return fast_hist(labels, preds, num_classes)

    @jax.jit
    def eval_step(variables, images, labels, hist):
        outputs = apply_fn(variables, images, train=False)
        if isinstance(outputs, (tuple, list)):
            outputs = outputs[0]
        preds = jnp.argmax(outputs, axis=-1)
        new_hist = hist + hist_update(labels, preds)
        if return_preds:
            return new_hist, preds
        return new_hist

    return eval_step


def validate(state, val_iter: Iterable, num_classes: int,
             class_names: list[str] | None = None, epoch: int = 0,
             callbacks: list | None = None, detailed_report: bool = False,
             eval_step=None, per_batch_callbacks: bool = False):
    """Run validation over an iterator of (images, labels) device batches.

    Returns ``(mean_iou, per_class)`` where ``per_class`` is a list of
    ``(class_name, iou)`` (the reference's DataFrame, ``validation.py:141``).
    Per-batch callbacks receive ``loss = 1 - running_pixel_accuracy``
    (``validation.py:57-62``) but force a device->host sync per batch, so
    they default OFF; the reference-shaped ``val``/``val_GTA5`` wrappers
    turn them back on for parity.
    """
    callbacks = callbacks or []
    for cb in callbacks:
        cb.on_validation_begin()

    plot_cbs = [cb for cb in callbacks if hasattr(cb, "add_sample")]
    if eval_step is None:
        eval_step = make_eval_step(state.apply_fn, num_classes,
                                   return_preds=bool(plot_cbs))
    variables = state.variables if hasattr(state, "variables") else state

    hist = jnp.zeros((num_classes, num_classes), dtype=jnp.int32)
    for batch_idx, (images, labels) in enumerate(val_iter):
        result = eval_step(variables, images, labels, hist)
        if isinstance(result, tuple):
            hist, preds = result
            host = [_host_local(x) for x in (images, labels, preds)]
            if any(h is None for h in host):
                if batch_idx == 0:
                    print("image plots skipped: arrays are sharded along "
                          "non-batch axes across processes (no whole "
                          "sample is host-local)")
            else:
                for cb in plot_cbs:
                    cb.set_epoch(epoch)
                    cb.add_sample(*host)
        else:
            hist = result
        # per-batch running-accuracy callbacks (validation.py:57-66) force a
        # device sync per batch; disable with per_batch_callbacks=False for
        # a fully-async validation epoch (one transfer at the end)
        if callbacks and per_batch_callbacks:
            h = np.asarray(hist)
            total = h.sum()
            pixel_acc = (np.trace(h) / total) if total else 0.0
            for cb in callbacks:
                cb.on_validation_batch_end(batch_idx, 1.0 - pixel_acc)

    hist_np = np.asarray(hist)
    ious = np.asarray(per_class_iou(hist_np))
    miou = float(np.nanmean(ious))
    print(f"Validation mIoU for Epoch {epoch + 1}: {miou:.4f}")

    per_class = None
    if class_names is not None:
        per_class = list(zip(class_names, [float(i) for i in ious]))
        if detailed_report:
            for name, iou in per_class:
                print(f"  {name:<15} {iou:.4f}")

    for cb in callbacks:
        cb.on_validation_end({"validation_mIoU": miou}, data=per_class)
    return miou, per_class


def val(epoch, state, val_iter, num_classes, callbacks=None, eval_step=None):
    """Reference-shaped entry point (``validation.py:12-77``)."""
    miou, _ = validate(state, val_iter, num_classes, epoch=epoch,
                       callbacks=callbacks, eval_step=eval_step,
                       per_batch_callbacks=True)
    return miou


def val_GTA5(epoch, state, val_iter, num_classes, class_names,
             callbacks=None, eval_step=None):
    """Reference-shaped entry point with the per-class report
    (``validation.py:79-149``)."""
    return validate(state, val_iter, num_classes, class_names=class_names,
                    epoch=epoch, callbacks=callbacks, detailed_report=True,
                    eval_step=eval_step, per_batch_callbacks=True)
