"""Offline pseudo-label generation for self-training rounds.

The offline half of CBST/BDL-style self-training (Zou et al. ECCV'18;
Li et al. CVPR'19): sweep a trained checkpoint over the TARGET domain's
images and write confidence-thresholded argmax labels as trainId PNGs in
the Cityscapes naming convention, so the output directory is a drop-in
``gtFine``-style label tree — point the training config's Cityscapes
label path at it and the standard supervised loop fine-tunes on the
pseudo-labels (the fused ONLINE variant lives in
``train/self_training.py``; this tool is the multi-round offline recipe
the literature alternates with it).  The reference has no self-training
(one adversarial method, ``train.py:130-319``); this is an extension.

TPU design: decode on host threads, ONE jit program per batch (normalize
-> forward -> softmax -> threshold -> uint8 masks), static shapes (last
batch padded), uint8 masks over the wire (the serving-chain lesson:
D2H is the bottleneck through tunneled backends).  ``--quantize int8``
runs the sweep through the W8A8 serving path (``ops/quant.py``) — pure
inference, exactly what it was measured on.  Thresholds: a scalar
``--threshold``, or ``--calibrate`` derives CBST per-class bars from the
checkpoint's own confidence histograms
(``train/self_training.py:calibrate_class_thresholds``).

Run: ``python -m rtsds_tpu.pseudo_label --checkpoint_dir ckpt/da
--images <cityscapes>/leftImg8bit/train --out pseudo/train``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _image_paths(images_dir: str) -> list[str]:
    paths = sorted(glob.glob(os.path.join(images_dir, "**", "*.png"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"pseudo_label: no .png images under {images_dir}")
    return paths


def _label_path(out_dir: str, images_dir: str, image_path: str) -> str:
    """Cityscapes-convention label path: same sub-tree, sample id
    (first 3 ``_`` tokens, ``data/indexing.py:31``) + a trainId-style
    suffix that the index pairing accepts (anything not ``color.png``)."""
    rel = os.path.relpath(image_path, images_dir)
    stem = os.path.splitext(os.path.basename(rel))[0]
    tokens = stem.split("_")
    sid = "_".join(tokens[:3]) if len(tokens) >= 3 else stem
    return os.path.join(out_dir, os.path.dirname(rel),
                        f"{sid}_pseudoTrainIds.png")


def _plan_label_paths(out_dir: str, images_dir: str,
                      paths: list[str]) -> dict[str, str]:
    """image path -> label path for the WHOLE sweep, validated up front.

    Raises (before any inference runs) on (a) two images mapping to the
    same label file, and (b) image names whose generated label would not
    pair back with the image under ``build_cityscapes_index``'s id rule
    (first 3 ``_`` tokens) — either failure mid-sweep would leave a
    partial or silently-unpairable label tree."""
    from rtsds_tpu.data.indexing import _cityscapes_id

    planned: dict[str, str] = {}
    by_label: dict[str, str] = {}
    for path in paths:
        out_path = _label_path(out_dir, images_dir, path)
        if _cityscapes_id(os.path.basename(out_path)) != \
                _cityscapes_id(os.path.basename(path)):
            raise SystemExit(
                f"pseudo_label: {path} is not Cityscapes-named (needs a "
                "trailing suffix token after city_seq_frame, e.g. "
                "city_seq_frame_leftImg8bit.png, so the 3-token Cityscapes "
                "id excludes the file extension); its generated label "
                f"{os.path.basename(out_path)} would never pair back with "
                "the image in build_cityscapes_index — rename the images "
                "or use a Cityscapes-layout tree")
        if out_path in by_label:
            raise SystemExit(
                f"pseudo_label: {path} and {by_label[out_path]} map to "
                f"the same label file {out_path} (their first 3 "
                "'_' tokens collide — Cityscapes ids must be "
                "unique per directory)")
        by_label[out_path] = path
        planned[path] = out_path
    return planned


def generate_pseudo_labels(checkpoint_dir: str, images_dir: str,
                           out_dir: str, model_name: str = "bisenet",
                           backbone: str = "resnet18",
                           num_classes: int = 19,
                           image_size: tuple[int, int] = (1024, 2048),
                           batch_size: int = 4, threshold=0.9,
                           calibrate: bool = False, portion: float = 0.5,
                           calib_batches: int = 8, use_ema: bool = True,
                           ignore_index: int = 19,
                           correct_preprocessing: bool = False,
                           quantize: str | None = None,
                           calib_stat: str = "max",
                           calib_percentile: float = 99.9,
                           full_res: bool = True) -> dict:
    """Sweep the checkpoint over ``images_dir`` and write pseudo-label
    PNGs under ``out_dir`` (mirroring the image sub-tree).  Returns a
    stats dict (n images, pixel coverage, per-class kept-pixel shares,
    thresholds used)."""
    import jax
    import jax.numpy as jnp

    from rtsds_tpu.data.pipeline import decode_image
    from rtsds_tpu.data import native
    from rtsds_tpu.ops.preprocess import normalize
    from rtsds_tpu.serve import load_checkpoint_variables
    from rtsds_tpu.train.self_training import (
        calibrate_class_thresholds,
        pseudo_labels,
    )

    if ignore_index > 255:
        raise SystemExit("pseudo_label: ignore_index must fit the uint8 "
                         "PNG wire format (<= 255)")

    if model_name == "bisenet":
        from rtsds_tpu.models.bisenet import BiSeNet

        model = BiSeNet(num_classes=num_classes, context_path=backbone,
                        output_f32=False)
    elif model_name == "deeplab":
        from rtsds_tpu.models.deeplabv2 import DeepLabV2

        model = DeepLabV2(num_classes=num_classes, output_f32=False)
    else:
        raise SystemExit(f"pseudo_label: unknown model {model_name!r}")

    variables = load_checkpoint_variables(checkpoint_dir, use_ema=use_ema)
    apply_fn = model.apply

    paths = _image_paths(images_dir)
    # Fail fast, BEFORE any inference: collisions and un-pairable names
    # are fully determined by the file paths alone, and aborting
    # mid-sweep would leave a partial label tree behind.
    label_paths = _plan_label_paths(out_dir, images_dir, paths)

    def batches():
        """(frames uint8 (B,H,W,3), originals [(path, (h, w))]) — the
        last batch pads by repeating its first frame (sliced on host)."""
        for i in range(0, len(paths), batch_size):
            chunk = paths[i:i + batch_size]
            frames, metas = [], []
            for p in chunk:
                from PIL import Image

                with Image.open(p) as im:
                    orig = (im.height, im.width)
                frames.append(decode_image(p, size=image_size))
                metas.append((p, orig))
            while len(frames) < batch_size:
                frames.append(frames[0])
            yield np.stack(frames), metas

    if quantize is not None and quantize != "int8":
        raise SystemExit(f"pseudo_label: quantize {quantize!r} is not "
                         "supported (int8)")
    calib_data = None
    if quantize or calibrate:
        # decode the calibration batches ONCE (full-res PNG decode is
        # the host bottleneck) and share them between the W8A8 scales
        # and the CBST bars
        calib_data = [f for f, _ in _take(batches(), max(1, calib_batches))]

    if quantize == "int8":
        # the offline sweep is pure serving — the profile the W8A8 path
        # was measured on
        from rtsds_tpu.ops.quant import quantize_model

        apply_fn, variables = quantize_model(
            model_name, variables,
            (normalize(jnp.asarray(f, jnp.float32), correct_preprocessing)
             for f in calib_data),
            calib_stat=calib_stat, calib_percentile=calib_percentile)

    if calibrate:
        # CBST per-class bars from the checkpoint's own confidence
        # histograms over the first calib_batches batches
        threshold = calibrate_class_thresholds(
            apply_fn, variables,
            (normalize(jnp.asarray(f, jnp.float32), correct_preprocessing)
             for f in calib_data),
            num_classes, portion=portion)
    thr = jnp.asarray(threshold, jnp.float32)

    @jax.jit
    def infer(variables, frames_u8, thr):
        x = normalize(frames_u8.astype(jnp.float32), correct_preprocessing)
        out = apply_fn(variables, x, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        # coverage is recomputed on host from REAL images only (the last
        # batch pads by repetition, which would bias a device-side mean)
        labels, _ = pseudo_labels(out, thr, ignore_index)
        return labels.astype(jnp.uint8)

    n_px = 0
    kept = np.zeros((num_classes,), np.int64)
    n_images = 0
    for frames, metas in batches():
        masks = jax.device_get(infer(variables, jnp.asarray(frames), thr))
        for mask, (path, orig) in zip(masks, metas):
            if full_res and tuple(orig) != tuple(image_size):
                mask = native.resize_nearest(
                    mask.astype(np.int32), tuple(orig)).astype(np.uint8)
            counts = np.bincount(mask.reshape(-1),
                                 minlength=num_classes + 1)
            kept += counts[:num_classes]
            n_px += mask.size
            out_path = label_paths[path]
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            from PIL import Image

            Image.fromarray(mask, mode="L").save(out_path)
            n_images += 1

    total_kept = int(kept.sum())
    stats = {
        "images": n_images,
        "out_dir": out_dir,
        "coverage": total_kept / max(n_px, 1),
        "class_share": (kept / max(total_kept, 1)).round(4).tolist(),
        "threshold": np.asarray(threshold, np.float32).round(4).tolist(),
        "ignore_index": ignore_index,
        **({"quantize": quantize} if quantize else {}),
    }
    return stats


def _take(it, n):
    for i, v in enumerate(it):
        if i >= n:
            return
        yield v


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Offline pseudo-label generation (CBST/BDL-style "
                    "self-training rounds)")
    ap.add_argument("--checkpoint_dir", required=True,
                    help="trained ModelCheckpoint directory")
    ap.add_argument("--images", required=True,
                    help="target-domain image tree (recursive *.png, "
                         "Cityscapes leftImg8bit layout)")
    ap.add_argument("--out", required=True,
                    help="output label tree (gtFine-style drop-in)")
    ap.add_argument("--model", default="bisenet",
                    choices=["bisenet", "deeplab"])
    ap.add_argument("--backbone", default="resnet18")
    ap.add_argument("--num_classes", type=int, default=19)
    ap.add_argument("--size", default="1024, 2048",
                    help="inference H, W")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="scalar confidence bar (ignored with --calibrate)")
    ap.add_argument("--calibrate", action="store_true",
                    help="CBST per-class thresholds from the checkpoint's "
                         "confidence histograms")
    ap.add_argument("--portion", type=float, default=0.5,
                    help="CBST kept-fraction per class")
    ap.add_argument("--calib_batches", type=int, default=8)
    ap.add_argument("--no_ema", action="store_true",
                    help="use raw training params even when the "
                         "checkpoint has an EMA item")
    ap.add_argument("--ignore_index", type=int, default=19)
    ap.add_argument("--correct_preprocessing", action="store_true")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="sweep through the W8A8 serving path")
    ap.add_argument("--calib_stat", default="max",
                    choices=["max", "percentile"],
                    help="int8 activation-scale statistic (PERF.md "
                         "ablation)")
    ap.add_argument("--calib_percentile", type=float, default=99.9)
    ap.add_argument("--model_res", action="store_true",
                    help="write labels at the inference resolution "
                         "instead of each image's original size")
    args = ap.parse_args(argv)

    size = tuple(int(v) for v in args.size.split(","))
    stats = generate_pseudo_labels(
        args.checkpoint_dir, args.images, args.out, model_name=args.model,
        backbone=args.backbone, num_classes=args.num_classes,
        image_size=size, batch_size=args.batch, threshold=args.threshold,
        calibrate=args.calibrate, portion=args.portion,
        calib_batches=args.calib_batches, use_ema=not args.no_ema,
        ignore_index=args.ignore_index,
        correct_preprocessing=args.correct_preprocessing,
        quantize=args.quantize, calib_stat=args.calib_stat,
        calib_percentile=args.calib_percentile,
        full_res=not args.model_res)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
