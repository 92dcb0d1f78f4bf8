"""Gaussian blur as a separable depthwise convolution (NHWC, jittable).

Matches ``torchvision.transforms.GaussianBlur`` semantics used by the
reference's augmentation factory (``main.py:26-30``): ``kernel_size`` is a
(kx, ky) pair, sigma is a scalar (sampling from the configured range happens
in ``rtsds_tpu.ops.augment``), the 1-D kernels are normalized gaussians, and
borders use reflect padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(kernel_size: int, sigma) -> jnp.ndarray:
    half = (kernel_size - 1) / 2.0
    x = jnp.linspace(-half, half, kernel_size)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(x, kernel_size: tuple[int, int], sigma):
    """Blur NHWC (or HWC) images.

    Args:
      x: float array, (N, H, W, C) or (H, W, C).
      kernel_size: (kx, ky) -- width, height taps, both odd (torchvision
        convention: first entry blurs along x/width, second along y/height).
      sigma: scalar std-dev (may be a traced value, enabling per-call random
        sigma inside jit).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    kx, ky = int(kernel_size[0]), int(kernel_size[1])
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    kern_x = _gaussian_kernel1d(kx, sigma)
    kern_y = _gaussian_kernel1d(ky, sigma)

    # reflect-pad then two depthwise 1-D convs (XLA fuses the chain)
    px, py = kx // 2, ky // 2
    xf = jnp.pad(xf, ((0, 0), (py, py), (px, px), (0, 0)), mode="reflect")

    # horizontal pass: kernel (1, kx, 1, C) depthwise
    kx_f = jnp.tile(kern_x.reshape(1, kx, 1, 1), (1, 1, 1, c)).astype(jnp.float32)
    xf = jax.lax.conv_general_dilated(
        xf, kx_f, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    ky_f = jnp.tile(kern_y.reshape(ky, 1, 1, 1), (1, 1, 1, c)).astype(jnp.float32)
    xf = jax.lax.conv_general_dilated(
        xf, ky_f, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    out = xf.astype(dtype)
    return out[0] if squeeze else out
