"""Adaptive average pooling with exact torch semantics, jittable.

``F.adaptive_avg_pool2d`` (used by the reference's v2 adversarial loop to
unify spatial sizes, ``train.py:410,438,445``) averages, for output cell
``i``, the input rows ``[floor(i*H/OH), ceil((i+1)*H/OH))``.  Window sizes
vary per cell, so we compute it from a 2-D summed-area table (cumsum) with
static gather indices -- fully static shapes, one pass over the input.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bounds(in_size: int, out_size: int):
    i = jnp.arange(out_size)
    lo = (i * in_size) // out_size
    hi = -(-((i + 1) * in_size) // out_size)  # ceil
    return lo, hi


def adaptive_avg_pool2d(x, output_size: tuple[int, int]):
    """NHWC (or HWC) adaptive average pool to ``output_size`` (OH, OW)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = output_size
    if (oh, ow) == (h, w):
        return x[0] if squeeze else x

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # summed-area table padded with a leading zero row/col
    sat = jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2)
    sat = jnp.pad(sat, ((0, 0), (1, 0), (1, 0), (0, 0)))

    rlo, rhi = _bounds(h, oh)
    clo, chi = _bounds(w, ow)
    # rect sum via 4 gathers: S[hi,hi] - S[lo,hi] - S[hi,lo] + S[lo,lo]
    a = sat[:, rhi][:, :, chi]
    b = sat[:, rlo][:, :, chi]
    cg = sat[:, rhi][:, :, clo]
    d = sat[:, rlo][:, :, clo]
    counts = ((rhi - rlo)[:, None] * (chi - clo)[None, :]).astype(jnp.float32)
    out = (a - b - cg + d) / counts[None, :, :, None]
    out = out.astype(dtype)
    return out[0] if squeeze else out
