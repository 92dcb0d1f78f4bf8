"""Quantization-aware fine-tuning CLI (the offline PTQ-recovery tool).

Use when the int8 serving path (``--quantize int8`` on any serving
surface) measures an mIoU drop on YOUR data that calibration choices
(``--calib_stat``/``--calib_percentile``) cannot close: this tool
takes the trained checkpoint, folds BN, calibrates the activation
scales exactly as serving does, fine-tunes the folded weights against
the W8A8 grid (straight-through estimators, ``train/qat.py``), and
writes back a standard flax SERVING checkpoint — every existing
surface (Predictor, serve CLIs, AOT export, pseudo-label sweeps)
consumes it unchanged.  The activation scales are saved next to the
checkpoint (``qat_act_scales.json``) and ``--quantize int8`` serving
picks them up automatically, so the deployed grid is EXACTLY the one
the weights were tuned for (recalibrating instead would re-clip the
same probability mass at percentile settings — measured to re-apply
the damage).

The written-back checkpoint is serving-only: its BNs are exact
identities carrying the folded statistics, so do not resume
batch-stats-mode TRAINING from it (see ``train/qat.py:writeback``).

Run: ``python -m rtsds_tpu.qat --checkpoint_dir ckpt/m --out ckpt_qat
--images <cityscapes>/leftImg8bit/train --labels
<cityscapes>/gtFine/train --model bisenet --steps 500``.

The reference has no quantization (torch fp32 only); effectiveness is
gated in ``tests/test_qat.py`` (damaged-calibration PTQ drop recovered
through the real int8 export).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def qat_finetune(checkpoint_dir: str, images_dir: str, labels_dir: str,
                 out_dir: str, model_name: str = "bisenet",
                 image_size: tuple[int, int] = (1024, 2048),
                 batch_size: int = 4, steps: int = 500, lr: float = 1e-5,
                 calib_batches: int = 8, calib_stat: str = "max",
                 calib_percentile: float = 99.9, use_ema: bool = True,
                 ignore_index: int = 19,
                 correct_preprocessing: bool = False,
                 seed: int = 42, log_every: int = 50) -> dict:
    """Fine-tune ``checkpoint_dir`` against the W8A8 serving grid on the
    labeled (images, labels) trees and write the serving checkpoint to
    ``out_dir``.  Returns a stats dict."""
    import jax.numpy as jnp

    from rtsds_tpu.data.indexing import build_cityscapes_index
    from rtsds_tpu.data.pipeline import decode_image, decode_label
    from rtsds_tpu.ops.preprocess import normalize
    from rtsds_tpu.serve import load_checkpoint_variables
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.qat import create_qat_state, prepare_qat, writeback
    from rtsds_tpu.train.supervised import make_train_step

    samples = build_cityscapes_index(labels_dir, images_dir)
    if not samples:
        raise SystemExit(f"qat: no paired (image, label) samples between "
                         f"{images_dir} and {labels_dir}")
    variables = load_checkpoint_variables(checkpoint_dir, use_ema=use_ema)

    def load_images(idx):
        return np.stack([decode_image(samples[i].image, size=image_size)
                         for i in idx])

    def load_batch(idx):
        labels = np.stack([decode_label(samples[i].label, size=image_size)
                           for i in idx])
        return load_images(idx), labels

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples))

    calib_idx = [order[i % len(samples)]
                 for i in range(max(1, calib_batches) * batch_size)]
    calib_frames = [load_images(calib_idx[i:i + batch_size])
                    for i in range(0, len(calib_idx), batch_size)]
    prep = prepare_qat(
        model_name, variables,
        (normalize(jnp.asarray(f, jnp.float32), correct_preprocessing)
         for f in calib_frames),
        calib_stat=calib_stat, calib_percentile=calib_percentile)

    state = create_qat_state(prep, make_optimizer("Adam", lr))
    step_fn = make_train_step(ignore_index=ignore_index, donate=False)

    cursor, last_loss = 0, float("nan")
    for it in range(steps):
        if cursor + batch_size > len(order):
            order = rng.permutation(len(samples))
            cursor = 0
        idx = order[cursor:cursor + batch_size]
        cursor += batch_size
        frames, labels = load_batch(idx)
        x = normalize(jnp.asarray(frames, jnp.float32),
                      correct_preprocessing)
        state, metrics = step_fn(state, x, jnp.asarray(labels))
        if (it + 1) % log_every == 0 or it + 1 == steps:
            last_loss = float(metrics["train_loss"])
            print(f"qat step {it + 1}/{steps} loss {last_loss:.4f}",
                  file=sys.stderr, flush=True)

    wb = writeback(model_name, variables, state.params)
    from rtsds_tpu.callbacks.checkpoint import CheckpointManager
    from rtsds_tpu.train.qat import save_act_scales

    mgr = CheckpointManager(out_dir)
    mgr.save(0, {"model": wb})
    mgr.close()
    # the QAT grid follows the checkpoint: serving with --quantize int8
    # consumes these scales instead of recalibrating (recalibration at
    # aggressive settings re-applies the damage QAT repaired)
    scales_path = save_act_scales(out_dir, prep, calib_stat,
                                  calib_percentile)
    return {
        "scales_sidecar": scales_path,
        "out_dir": out_dir,
        "steps": steps,
        "final_loss": last_loss,
        "quantized_convs": len(prep.quant_names),
        "bf16_convs": len(prep.folded) - len(prep.quant_names),
        "calib_stat": calib_stat,
        "calib_percentile": calib_percentile,
        "samples": len(samples),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="QAT fine-tune: recover int8 serving accuracy by "
                    "training against the W8A8 grid")
    ap.add_argument("--checkpoint_dir", required=True,
                    help="trained ModelCheckpoint directory")
    ap.add_argument("--images", required=True,
                    help="labeled image tree (Cityscapes layout)")
    ap.add_argument("--labels", required=True,
                    help="trainId label tree paired by Cityscapes ids "
                         "(real gtFine or a pseudo_label output tree)")
    ap.add_argument("--out", required=True,
                    help="output SERVING checkpoint directory")
    ap.add_argument("--model", default="bisenet",
                    choices=["bisenet", "deeplab"])
    # model structure (backbone, classes) derives from the checkpoint's
    # own parameter tree -- no redundant knobs to get wrong
    ap.add_argument("--size", default="1024, 2048", help="train H, W")
    # b8 is the measured per-sample sweet spot on v5e (b4 pays XLA's
    # small-batch layout-copy wall; CLAUDE.md perf notes)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--calib_batches", type=int, default=8)
    ap.add_argument("--calib_stat", default="max",
                    choices=["max", "percentile"])
    ap.add_argument("--calib_percentile", type=float, default=99.9)
    ap.add_argument("--no_ema", action="store_true",
                    help="use raw training params even when the "
                         "checkpoint has an EMA item")
    ap.add_argument("--ignore_index", type=int, default=19)
    ap.add_argument("--correct_preprocessing", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--log_every", type=int, default=50,
                    help="print a loss line every N steps (stderr)")
    args = ap.parse_args(argv)

    size = tuple(int(v) for v in args.size.split(","))
    stats = qat_finetune(
        args.checkpoint_dir, args.images, args.labels, args.out,
        model_name=args.model, image_size=size,
        batch_size=args.batch, steps=args.steps, lr=args.lr,
        calib_batches=args.calib_batches, calib_stat=args.calib_stat,
        calib_percentile=args.calib_percentile, use_ema=not args.no_ema,
        ignore_index=args.ignore_index,
        correct_preprocessing=args.correct_preprocessing, seed=args.seed,
        log_every=args.log_every)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
