"""RTSDS-TPU: Real-Time Semantic Segmentation with Domain Adaptation, TPU-native.

A ground-up JAX/Flax/XLA/Pallas re-design of the capabilities of
sina-behnam/RTSDS (reference: /root/reference): BiSeNet and DeepLabV2
segmentation models, Cityscapes + GTA5 data pipelines, supervised and
adversarial (GTA5 -> Cityscapes) domain-adaptation training, mIoU
validation, callbacks (W&B / TensorBoard / checkpoint / early stopping),
and latency/FPS/FLOPs benchmarking -- all built TPU-first:

  * NHWC layouts, bf16 compute on the MXU, XLA-fused elementwise chains
  * one fused jit program per optimization step (incl. the G/D GAN step)
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding (ICI
    collectives inserted by XLA), not DataParallel
  * Pallas kernels for the confusion-matrix update and label remap
"""

__version__ = "0.1.0"

from rtsds_tpu.config import Config, load_config  # noqa: F401
