"""Fourier Domain Adaptation (FDA): source images restyled with target
low-frequency amplitude, on device.

Beyond-reference DA capability (Yang & Soatto, "FDA: Fourier Domain
Adaptation for Semantic Segmentation", CVPR'20): the domain gap between
GTA5 renders and Cityscapes photos lives largely in low-frequency
appearance (color cast, illumination, global texture statistics).  FDA
swaps the lowest spatial frequencies of each source image's FFT
*amplitude* with a target image's, keeps the source *phase* (which
carries semantics/edges), and inverse-transforms — a zero-parameter
style transfer that composes with the adversarial loop
(``/root/reference/train.py:130-319``) the reference implements.

TPU-first shape: this is pure device math (two FFTs, an elementwise
amplitude splice, one inverse FFT — XLA lowers ``jnp.fft`` to the TPU
FFT op) executed INSIDE the fused DA step, so the restyled batch never
exists in host memory and costs no extra dispatch.  The swap window is
static (``beta`` is a build-time constant), keeping the program
shape-stable.

Note on preprocessing order: the reference pipeline normalizes images
before batches reach the step, so the swap here operates on normalized
intensities.  Normalization is a per-channel affine map, which only
shifts/scales the spectrum (DC term offset, global scale); swapping the
DC-and-low bins of normalized tensors therefore matches low-frequency
statistics exactly as intended — it just expresses them in normalized
units.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def low_freq_mask(height: int, width: int, beta: float) -> np.ndarray:
    """(H, W) float32 mask selecting the low-frequency bins of an
    UNSHIFTED 2-D FFT spectrum.

    The window half-size is ``b = floor(min(H, W) * beta)`` per the
    paper's L parameter (§3.1); a bin ``(i, j)`` is selected when both
    frequency magnitudes are below ``b``: ``min(i, H-i) < b`` and
    ``min(j, W-j) < b``.  This set is closed under frequency negation
    ``(i, j) -> (-i mod H, -j mod W)``, so splicing the amplitudes of
    two REAL images keeps the spectrum exactly Hermitian and
    ``ifft2().real`` loses nothing (a one-sided ``[:b] + [-b:]`` corner
    window — as in common FDA implementations — is NOT symmetric and
    leaks a small imaginary residual).  ``beta=0`` selects nothing
    (identity transfer); the DC bin is included whenever ``b >= 1``.
    """
    b = int(np.floor(min(height, width) * float(beta)))
    rows = np.minimum(np.arange(height), height - np.arange(height)) < b
    cols = np.minimum(np.arange(width), width - np.arange(width)) < b
    return np.outer(rows, cols).astype(np.float32)


def fda_source_to_target(src_images, tgt_images, beta: float = 0.01):
    """Restyle a source batch with a target batch's low-frequency
    amplitude (FDA, Yang & Soatto CVPR'20 eq. 2).

    Args:
      src_images: (Ns, H, W, C) source batch (NHWC, any float dtype).
      tgt_images: (Nt, H', W', C) target batch; resized (bilinear) to the
        source resolution if it differs, and tiled cyclically when the
        batch sizes differ — every source image gets a style donor.
      beta: the paper's L — relative half-size of the swapped window.
        0 disables the transfer (returns ``src_images`` unchanged).

    Returns a (Ns, H, W, C) batch in the source dtype: source phase,
    target low-frequency amplitude, source amplitude elsewhere.
    """
    if float(beta) <= 0.0:
        return src_images
    ns, h, w, c = src_images.shape
    src = src_images.astype(jnp.float32)
    tgt = tgt_images.astype(jnp.float32)
    if tgt.shape[1:3] != (h, w):
        tgt = jax.image.resize(tgt, (tgt.shape[0], h, w, c), "bilinear")
    if tgt.shape[0] != ns:
        tgt = tgt[jnp.arange(ns) % tgt.shape[0]]

    # real-input FFTs: the images are real and the spliced spectrum is
    # Hermitian (symmetric mask + real inputs), so the half-spectrum
    # rfft2/irfft2 pair computes the identical result at half the FFT
    # work and memory (measured 152.1 -> 144.5 ms on the b8 DA step)
    fft_src = jnp.fft.rfft2(src, axes=(1, 2))
    fft_tgt = jnp.fft.rfft2(tgt, axes=(1, 2))
    mask = jnp.asarray(
        low_freq_mask(h, w, beta)[:, : w // 2 + 1])[None, :, :, None]
    amp = jnp.abs(fft_src) * (1.0 - mask) + jnp.abs(fft_tgt) * mask
    phase = jnp.angle(fft_src)
    out = jnp.fft.irfft2(amp * jnp.exp(1j * phase), s=(h, w), axes=(1, 2))
    return out.astype(src_images.dtype)
