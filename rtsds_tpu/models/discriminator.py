"""Domain discriminators + gradient reversal (Flax/NHWC).

Re-design of ``models/domain_shift/adversarial/model.py``:

  * :class:`DomainDiscriminator` -- the paper's FCDiscriminator: 5 convs
    4x4 stride 2 (19 -> 64 -> 128 -> 256 -> 512 -> 1), LeakyReLU(0.2), no
    BN, global average pool to 1x1, optional gradient reversal on the
    output (``model.py:30-64``)
  * :class:`TinyDomainDiscriminator` -- the authors' 2-conv variant, the
    config default (``model.py:67-83``, ``config.yaml:70-72``)
  * :func:`gradient_reversal` -- identity forward, ``-alpha * grad``
    backward (``model.py:9-17``), as a ``jax.custom_vjp``

Input is the softmaxed segmentation map, NHWC (N, H, W, 19); output is
(N, 1, 1, 1) logits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtsds_tpu.models.layers import conv, global_avg_pool
from rtsds_tpu.utils.dtypes import at_least_f32


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, alpha: float = 1.0):
    """Identity in the forward pass; scales the cotangent by ``-alpha`` in
    the backward pass (GradientReversalFunction, ``model.py:9-17``)."""
    return x


def _grl_fwd(x, alpha):
    return x, None


def _grl_bwd(alpha, _, g):
    return (-alpha * g,)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class UpSampler(nn.Module):
    """8x bilinear upsample + 1x1 conv (``model.py:19-28``).

    Dead code in the reference's main path -- provided for drop-in
    completeness of the module surface."""

    num_classes: int = 19
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from rtsds_tpu.ops.resize import upsample_bilinear

        x = upsample_bilinear(x, 8)
        return conv(self.num_classes, 1, dtype=self.dtype, name="conv")(x)


class DomainDiscriminator(nn.Module):
    """FCDiscriminator (Tsai et al. CVPR'18), ``model.py:30-64``."""

    num_classes: int = 19
    with_grl: bool = False
    lambda_: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        leaky = partial(nn.leaky_relu, negative_slope=0.2)
        for i, ch in enumerate((64, 128, 256, 512)):
            x = conv(ch, 4, 2, 1, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = leaky(x)
        x = conv(1, 4, 2, 1, dtype=self.dtype, name="classifier")(x)
        x = at_least_f32(global_avg_pool(x))
        if self.with_grl:
            x = gradient_reversal(x, self.lambda_)
        return x


class TinyDomainDiscriminator(nn.Module):
    """2-conv discriminator, the reference's config default
    (``model.py:67-83``)."""

    num_classes: int = 19
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = conv(64, 4, 2, 1, dtype=self.dtype, name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = conv(1, 4, 2, 1, dtype=self.dtype, name="classifier")(x)
        return at_least_f32(global_avg_pool(x))
