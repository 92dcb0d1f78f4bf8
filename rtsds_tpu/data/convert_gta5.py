"""Offline GTA5 label pre-conversion: RGB-coded labels -> trainId PNGs.

The reference assumes a pre-converted dataset exists ("GTA5_Modified",
``/root/reference/config.yaml:12-14``) and only ships the per-sample
on-the-fly decoder (``gta5.py:51,66-70``) — there is no tool that
*produces* the Modified tree.  This one does: it walks a raw GTA5 root
(flat ``images/`` + RGB-coded ``labels/`` PNGs, the download format),
writes single-channel trainId label PNGs (void/unmatched -> 255) and
hard-links the images (copy fallback across filesystems), emitting a
drop-in ``GTA5_Modified`` tree for the default fast path — the per-epoch
decode cost paid exactly once.

The remap is a 24-bit lookup table (one uint8 load per pixel, same
scheme as the C++ LUT in ``native/rtsds_host_ops.cpp``) built from the
19-class Cityscapes color table (``gta5.py:10-46``), applied with numpy
across a thread pool.

Run::

    python -m rtsds_tpu.data.convert_gta5 --src data/GTA5 --dst data/GTA5_Modified

Library: :func:`convert_tree` returns a stats dict.
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_lut(color_table=None, default_id: int = 255) -> np.ndarray:
    """(2^24,) uint8 LUT: packed RGB (r<<16 | g<<8 | b) -> trainId."""
    if color_table is None:
        from rtsds_tpu.utils.colors import class_colors_for_remap

        color_table = class_colors_for_remap()
    table = np.asarray(color_table, dtype=np.uint32)
    lut = np.full(1 << 24, default_id, dtype=np.uint8)
    keys = (table[:, 0] << 16) | (table[:, 1] << 8) | table[:, 2]
    lut[keys] = np.arange(len(table), dtype=np.uint8)
    return lut


def convert_label(src_path: str, dst_path: str, lut: np.ndarray) -> int:
    """One RGB label PNG -> trainId PNG; returns #unmatched pixels."""
    from PIL import Image

    rgb = np.asarray(Image.open(src_path).convert("RGB"), dtype=np.uint32)
    packed = (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]
    ids = lut[packed]
    Image.fromarray(ids, mode="L").save(dst_path)
    return int(np.count_nonzero(ids == 255))


def _link_or_copy(src: str, dst: str):
    if os.path.exists(dst):
        return
    try:
        os.link(src, dst)
    except OSError:  # cross-device / unsupported: fall back to a copy
        import shutil

        shutil.copyfile(src, dst)


def convert_tree(src_root: str, dst_root: str, workers: int = 8,
                 overwrite: bool = False, link_images: bool = True,
                 quiet: bool = False) -> dict:
    """Convert ``src_root/{images,labels}`` into a Modified tree at
    ``dst_root``.  Idempotent: existing converted labels are skipped
    unless ``overwrite``.  Returns ``{converted, skipped, linked,
    void_fraction}``."""
    src_images = os.path.join(src_root, "images")
    src_labels = os.path.join(src_root, "labels")
    if not os.path.isdir(src_labels):
        raise FileNotFoundError(f"no labels/ directory under {src_root}")
    dst_images = os.path.join(dst_root, "images")
    dst_labels = os.path.join(dst_root, "labels")
    os.makedirs(dst_labels, exist_ok=True)

    lut = build_lut()
    names = sorted(n for n in os.listdir(src_labels)
                   if n.lower().endswith(".png"))
    todo, skipped = [], 0
    for n in names:
        dst = os.path.join(dst_labels, n)
        if not overwrite and os.path.exists(dst):
            skipped += 1
        else:
            todo.append((os.path.join(src_labels, n), dst))

    void_px = total_px = 0

    def _one(pair):
        src, dst = pair
        from PIL import Image

        with Image.open(src) as im:
            size = im.size
        return convert_label(src, dst, lut), size[0] * size[1]

    with ThreadPoolExecutor(max_workers=workers) as ex:
        for voids, pixels in ex.map(_one, todo):
            void_px += voids
            total_px += pixels

    linked = 0
    if link_images and os.path.isdir(src_images):
        os.makedirs(dst_images, exist_ok=True)
        img_names = sorted(n for n in os.listdir(src_images)
                           if n.lower().endswith(".png"))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda n: _link_or_copy(
                os.path.join(src_images, n), os.path.join(dst_images, n)),
                img_names))
        linked = len(img_names)

    stats = {"converted": len(todo), "skipped": skipped, "linked": linked,
             "void_fraction": (void_px / total_px) if total_px else 0.0}
    if not quiet:
        print(f"convert_gta5: {stats['converted']} labels converted "
              f"({stats['skipped']} already present), {linked} images "
              f"{'linked' if link_images else 'kept'}; "
              f"{100.0 * stats['void_fraction']:.2f}% void pixels -> 255")
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Pre-convert raw GTA5 RGB-coded labels to the "
                    "'GTA5_Modified' trainId layout.")
    parser.add_argument("--src", required=True,
                        help="Raw GTA5 root containing images/ and labels/")
    parser.add_argument("--dst", required=True,
                        help="Output root (a drop-in GTA5_Modified tree)")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--overwrite", action="store_true",
                        help="Re-convert labels that already exist in dst")
    parser.add_argument("--no_images", action="store_true",
                        help="Only convert labels; do not link/copy images")
    args = parser.parse_args(argv)
    try:
        convert_tree(args.src, args.dst, workers=args.workers,
                     overwrite=args.overwrite,
                     link_images=not args.no_images)
    except FileNotFoundError as e:
        print(f"convert_gta5: {e}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
