"""Host-side input pipeline: decode -> (host resize) -> batch -> prefetch,
feeding device-resident, optionally sharded batches.

Replaces the reference's ``torch.utils.data.DataLoader`` with worker
processes (``main.py:101-106``): here a thread pool decodes PNGs (PIL
releases the GIL around libpng), samples are resized on the host to the
static training size so batches stack to fixed shapes (no recompiles), and
finished batches are prefetched into a bounded queue while the previous
step runs on device.  Normalization / augmentation / label clamping happen
on device in one fused jit program (``rtsds_tpu/ops/preprocess.py``).

GTA5 raw labels can be RGB-coded; the vectorized remap
(``rtsds_tpu/ops/remap.py``) is applied when ``decode_label_colors=True``
(the reference's ``in_getting_decoder``, ``gta5.py:51,66-70``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from rtsds_tpu.data.indexing import Sample


def decode_image(path: str, size: tuple[int, int] | None = None,
                 antialias: bool = True) -> np.ndarray:
    """PNG -> HWC uint8 RGB, optionally resized to (H, W) on host.

    PIL's BILINEAR filter is an antialiased triangle resample, matching the
    intent of ``transforms.Resize(..., antialias=True)`` (``main.py:70``);
    NEAREST is used when ``antialias=False`` resizing would not occur --
    images always use BILINEAR.
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.uint8)
    if size is not None and arr.shape[:2] != tuple(size):
        from rtsds_tpu.data import native

        arr = native.resize_bilinear_aa(arr, tuple(size))
    return arr


def decode_label(path: str, size: tuple[int, int] | None = None,
                 rgb: bool = False) -> np.ndarray:
    """PNG -> HW (int32) trainId map, or HWC uint8 when ``rgb=True``.

    Labels resize with NEAREST to preserve ids (the reference's bilinear
    label resize is a catalogued bug, SURVEY.md §7).
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB") if rgb else im.convert("L" if im.mode not in ("I", "I;16") else im.mode)
        arr = np.asarray(im)
    if rgb:
        arr = arr.astype(np.uint8)
        if size is not None and arr.shape[:2] != tuple(size):
            # nearest for RGB-coded labels too: interpolation would invent
            # colors outside the 35-entry key table
            from rtsds_tpu.data import native

            h, w = arr.shape[:2]
            rows = np.minimum((np.arange(size[0]) * h // size[0]), h - 1)
            cols = np.minimum((np.arange(size[1]) * w // size[1]), w - 1)
            arr = arr[rows][:, cols]
        return arr
    arr = arr.astype(np.int32)
    if size is not None and arr.shape[:2] != tuple(size):
        from rtsds_tpu.data import native

        arr = native.resize_nearest(arr, tuple(size))
    return arr


class SegmentationDataset:
    """Index + decode policy -> random-access (image, label) numpy pairs."""

    def __init__(self, samples: Sequence[Sample], image_size: tuple[int, int],
                 decode_label_colors: bool = False):
        self.samples = list(samples)
        self.image_size = tuple(image_size)
        self.decode_label_colors = decode_label_colors

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        s = self.samples[idx]
        image = decode_image(s.image, self.image_size)
        if self.decode_label_colors:
            rgb = decode_label(s.label, self.image_size, rgb=True)
            from rtsds_tpu.data.native import rgb_to_train_ids

            label = rgb_to_train_ids(rgb)
        else:
            label = decode_label(s.label, self.image_size)
        return image, label

    def load_batch(self, idxs, pool=None):
        """Whole-batch fast path: one C++ call decodes + resizes all PNGs
        with an internal thread pool (no GIL, no per-item Python).  Falls
        back to per-item decode (optionally via ``pool``) whenever the
        native PNG path is unavailable or any file fails."""
        from rtsds_tpu.data import native

        paths_img = [self.samples[int(i)].image for i in idxs]
        paths_lbl = [self.samples[int(i)].label for i in idxs]
        images = native.decode_image_batch(paths_img, self.image_size)
        labels = native.decode_label_batch(paths_lbl, self.image_size,
                                           rgb=self.decode_label_colors)
        if images is not None and labels is not None:
            return images, labels
        mapper = pool.map if pool is not None else map
        pairs = list(mapper(self.__getitem__, idxs))
        return (np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]))


class DataLoader:
    """Shuffling, batching, threaded-prefetch loader.

    Yields host numpy batches ``(images NHWC uint8, labels NHW int32)``.
    ``infinite=True`` provides the DA loops' resample-forever discipline
    (replacing the reference's per-step ``next(iter(loader))`` worker churn,
    ``train.py:184-185``).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite
        self.seed = seed
        self._epoch = 0
        self._skip = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """Deterministic resume: the shuffle of pass N is a pure function
        of ``(seed, N)``, so after restoring a checkpoint,
        ``set_epoch(N)`` makes the next iteration reproduce exactly the
        sample order pass N would have seen in the original run (and on
        multi-host, keeps every process's permutation in agreement)."""
        self._epoch = int(epoch)

    def skip_batches(self, k: int):
        """Deterministic mid-pass resume: drop the next ``k`` batches at
        the INDEX level (no decode cost) before yielding.  Combined with
        :meth:`set_epoch` this fast-forwards an infinite stream to an
        arbitrary position, e.g. the adversarial loop's
        ``start_epoch * iterations`` consumed batches."""
        self._skip = int(k)

    def _order(self, n: int) -> np.ndarray:
        if not self.shuffle:
            return np.arange(n)
        return np.random.default_rng((self.seed, self._epoch)).permutation(n)

    def _batch_indices(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        while True:
            order = self._order(n)
            self._epoch += 1
            stop = n - (n % self.batch_size) if self.drop_last else n
            if stop == 0 and not self.drop_last:
                stop = n
            for i in range(0, stop, self.batch_size):
                if self._skip > 0:
                    self._skip -= 1
                    continue
                yield order[i:i + self.batch_size]
            if not self.infinite:
                return

    def _load_batch(self, pool: ThreadPoolExecutor, idxs: np.ndarray):
        load_batch = getattr(self.dataset, "load_batch", None)
        if load_batch is not None:
            return load_batch(idxs, pool)
        pairs = list(pool.map(self.dataset.__getitem__, idxs))
        images = np.stack([p[0] for p in pairs])
        labels = np.stack([p[1] for p in pairs])
        return images, labels

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    for idxs in self._batch_indices():
                        if stop.is_set():
                            return
                        q.put(self._load_batch(pool, idxs))
                finally:
                    q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_iterator(loader, transform, key=None, sharding=None,
                    augment: bool = False):
    """Wrap a host loader: device_put (with optional NamedSharding) ->
    fused preprocess transform.  Yields device (images, labels)."""
    import jax

    for i, (images, labels) in enumerate(loader):
        if sharding is not None:
            images = jax.device_put(images, sharding)
            labels = jax.device_put(labels, sharding)
        if augment and key is not None:
            step_key = jax.random.fold_in(key, i)
            yield transform(images, labels, step_key)
        else:
            yield transform(images, labels)
