"""Sliding-window inference: segment images larger than the network's
training resolution by tiling overlapping windows and blending the class
probabilities -- the standard high-resolution evaluation protocol (and
the single-chip alternative to spatial mesh sharding for >4K panoramas).

TPU-first: the window grid is computed statically from the (static)
image size, so the slices, forwards and the scatter-accumulate all
compile into ONE XLA program -- no host loop, no per-window dispatch.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _positions(total: int, window: int, stride: int) -> list[int]:
    """Window start offsets covering [0, total) with overlap; the last
    window is clamped flush to the edge."""
    if window >= total:
        return [0]
    pos = list(range(0, total - window + 1, stride))
    if pos[-1] + window < total:
        pos.append(total - window)
    return pos


def make_sliding_predict(apply_fn: Callable, image_size: tuple[int, int],
                         window: tuple[int, int] = (512, 1024),
                         stride: tuple[int, int] | None = None,
                         return_probs: bool = False,
                         window_chunk: int | None = None) -> Callable:
    """Build ``predict(variables, images) -> masks`` over NHWC images of
    static ``image_size``, evaluated window-by-window.

    The window tiles are STACKED along the batch axis and run through
    ``apply_fn`` in one forward (per chunk): a 9-window panorama is one
    b9 conv program, not 9 sequential b1 forwards.  On TPU the conv
    throughput scales strongly with batch (PERF.md: BiSeNet b1 is 8.5
    ms/frame vs 3.1 ms/image at b64), so batching the windows is where
    the protocol's speed comes from.

    Args:
      apply_fn: ``apply_fn(variables, images, train=False) -> logits``
        (logits at input resolution).
      window: (wh, ww) evaluation window -- typically the train size.
      stride: window step; default 3/4 of the window (25% overlap).
        Overlapping probabilities are averaged, which suppresses
        window-border artifacts.
      window_chunk: max windows per stacked forward (each forward sees
        ``window_chunk * N`` tiles).  Default: all windows in one
        forward.  Lower it if the stacked activations exceed HBM (e.g.
        many-window panoramas at large eval batch); ``1`` reproduces
        the sequential per-window schedule.
    """
    h, w = image_size
    wh, ww = min(window[0], h), min(window[1], w)
    if stride is None:
        stride = (max(wh * 3 // 4, 1), max(ww * 3 // 4, 1))
    if stride[0] <= 0 or stride[1] <= 0:
        raise ValueError(f"stride {stride} must be positive")
    if stride[0] > wh or stride[1] > ww:
        raise ValueError(
            f"stride {stride} exceeds window ({wh}, {ww}): uncovered "
            f"pixels would divide 0/0")
    ys = _positions(h, wh, stride[0])
    xs = _positions(w, ww, stride[1])
    tiles_yx = [(y, x) for y in ys for x in xs]
    if window_chunk is None:
        window_chunk = len(tiles_yx)
    if window_chunk < 1:
        raise ValueError(f"window_chunk {window_chunk} must be >= 1")

    def predict(variables, images):
        n = images.shape[0]
        c = images.shape[-1]
        acc = None
        count = jnp.zeros((1, h, w, 1), jnp.float32)
        for start in range(0, len(tiles_yx), window_chunk):
            group = tiles_yx[start:start + window_chunk]
            tiles = jnp.concatenate(
                [jax.lax.slice(images, (0, y, x, 0), (n, y + wh, x + ww, c))
                 for (y, x) in group], axis=0)
            logits = apply_fn(variables, tiles, train=False)
            p_all = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            k = p_all.shape[-1]
            for i, (y, x) in enumerate(group):
                p = jax.lax.slice(p_all, (i * n, 0, 0, 0),
                                  ((i + 1) * n, wh, ww, k))
                if acc is None:
                    acc = jnp.zeros((n, h, w, k), jnp.float32)
                acc = jax.lax.dynamic_update_slice(
                    acc, jax.lax.dynamic_slice(
                        acc, (0, y, x, 0), (n, wh, ww, k)) + p,
                    (0, y, x, 0))
                count = jax.lax.dynamic_update_slice(
                    count, jax.lax.dynamic_slice(
                        count, (0, y, x, 0), (1, wh, ww, 1)) + 1.0,
                    (0, y, x, 0))
        probs = acc / count
        if return_probs:
            return probs
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    return predict


def make_sliding_eval_step(apply_fn: Callable, image_size: tuple[int, int],
                           num_classes: int,
                           window: tuple[int, int] = (512, 1024),
                           stride: tuple[int, int] | None = None,
                           use_pallas: bool | None = None,
                           return_preds: bool = False,
                           window_chunk: int | None = None) -> Callable:
    """Sliding-window analog of ``make_eval_step``:
    ``eval_step(variables, images, labels, hist) -> hist`` (or
    ``(hist, preds)`` with ``return_preds``, for image-plot callbacks),
    jitted, with the confusion-matrix update fused into the same program
    (wired from config ``validation.sliding``)."""
    from rtsds_tpu.eval.validate import _pallas_hist_available
    from rtsds_tpu.utils.metrics import fast_hist

    if use_pallas is None:
        use_pallas = _pallas_hist_available()

    def hist_update(labels, preds):
        if use_pallas:
            from rtsds_tpu.ops.pallas.hist import fast_hist_pallas

            return fast_hist_pallas(labels, preds, num_classes)
        return fast_hist(labels, preds, num_classes)

    predict = make_sliding_predict(apply_fn, image_size, window, stride,
                                   window_chunk=window_chunk)

    @jax.jit
    def eval_step(variables, images, labels, hist):
        preds = predict(variables, images)
        new_hist = hist + hist_update(labels, preds)
        if return_preds:
            return new_hist, preds
        return new_hist

    return eval_step
