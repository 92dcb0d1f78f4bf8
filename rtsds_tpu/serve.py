"""Real-time inference API.

The reference's deliverable is real-time segmentation (README latency/FPS
loop, ``utils.py:109-134``) but it ships no serving path -- only the
training script.  This module is the production-facing inference surface:
a :class:`Predictor` that loads a trained checkpoint, keeps a jit-compiled
bf16 forward resident, and serves NHWC uint8 frames -> trainId masks (or
colorized RGB), with optional micro-batching.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.models.deeplabv2 import DeepLabV2
from rtsds_tpu.ops.preprocess import normalize
from rtsds_tpu.utils.colors import apply_color_map


class Predictor:
    """Device-resident segmentation predictor.

    Args:
      model_name: 'bisenet' or 'deeplab'.
      variables: Flax variable dict (params + batch_stats); e.g. from a
        ``CheckpointManager.restore`` or a fresh ``model.init``.
      image_size: static (H, W) the predictor compiles for.
      batch_size: static micro-batch size; inputs are padded up to it.
      dtype: compute dtype (bf16 default -- MXU path).
    """

    def __init__(self, model_name: str = "bisenet", variables: dict | None = None,
                 image_size: tuple[int, int] = (1024, 2048),
                 batch_size: int = 1, num_classes: int = 19,
                 backbone: str = "resnet18", dtype=jnp.bfloat16,
                 correct_preprocessing: bool = False):
        if model_name == "bisenet":
            self.model = BiSeNet(num_classes=num_classes,
                                 context_path=backbone, dtype=dtype,
                                 output_f32=False)
        elif model_name == "deeplab":
            self.model = DeepLabV2(num_classes=num_classes, dtype=dtype,
                                   output_f32=False)
        else:
            raise ValueError(model_name)
        self.image_size = tuple(image_size)
        self.batch_size = batch_size
        self.correct_preprocessing = correct_preprocessing

        if variables is None:
            key = jax.random.key(0)
            dummy = jnp.zeros((batch_size, *self.image_size, 3), jnp.float32)
            variables = self.model.init(key, dummy, train=False)
        self.variables = jax.device_put(variables)

        model = self.model
        correct = correct_preprocessing

        @jax.jit
        def _predict(variables, frames_u8):
            x = normalize(frames_u8.astype(jnp.float32), correct)
            logits = model.apply(variables, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._predict = _predict

    def warmup(self):
        dummy = np.zeros((self.batch_size, *self.image_size, 3), np.uint8)
        np.asarray(self._predict(self.variables, jnp.asarray(dummy)))
        return self

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 -> (N, H, W) int32 trainId masks.

        N may be smaller than the compiled batch; inputs are zero-padded
        and outputs sliced, so one compiled program serves any N <= batch.
        """
        frames = np.asarray(frames, dtype=np.uint8)
        single = frames.ndim == 3
        if single:
            frames = frames[None]
        n = frames.shape[0]
        if frames.shape[1:3] != self.image_size:
            raise ValueError(
                f"predictor compiled for {self.image_size}, got "
                f"{frames.shape[1:3]}")
        if n > self.batch_size:
            chunks = [self.predict(frames[i:i + self.batch_size])
                      for i in range(0, n, self.batch_size)]
            return np.concatenate(chunks)
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *frames.shape[1:]), np.uint8)
            frames = np.concatenate([frames, pad])
        masks = np.asarray(self._predict(self.variables, jnp.asarray(frames)))
        masks = masks[:n]
        return masks[0] if single else masks

    def predict_colored(self, frames: np.ndarray) -> np.ndarray:
        """(..., H, W, 3) uint8 -> colorized (..., H, W, 3) uint8 masks."""
        masks = self.predict(frames)
        if masks.ndim == 2:
            return apply_color_map(masks)
        return np.stack([apply_color_map(m) for m in masks])

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, **kwargs) -> "Predictor":
        """Restore the latest (or best) checkpoint saved by ModelCheckpoint.

        The stored tree is ``{"model": state}`` or ``{"generator": state,
        ...}``; the segmentation network is 'model' or 'generator'.
        """
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(checkpoint_dir)
        step = mgr.best_step()
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
        restored = mgr.restore(step)
        mgr.close()
        tree = restored.get("model", restored.get("generator", restored))
        variables = {"params": tree["params"]}
        if "batch_stats" in tree:
            variables["batch_stats"] = tree["batch_stats"]
        return cls(variables=variables, **kwargs)
