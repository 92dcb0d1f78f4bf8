"""Ahead-of-time export: serialized, self-contained serving artifacts.

The reference deploys by shipping the training repo plus a ``.pth`` file
and re-running the Python model code (``train.py:310-314`` saves bare
state dicts; inference requires importing ``build_bisenet.py``).  The
TPU-native deployment story is stronger: :func:`export_predictor`
serializes the ENTIRE serving computation -- preprocessing, bf16 forward,
argmax -- plus the trained weights into one portable StableHLO artifact
via ``jax.export``.  The artifact:

  * needs NO model code, checkpoint format, or framework version match to
    run -- only jax itself (``load_predictor``);
  * is compiled ahead-of-time per platform (``platforms=("tpu", "cpu")``)
    so a serving fleet never traces Python;
  * supports a dynamic batch dimension (shape polymorphism), so one
    artifact serves any batch size without padding or recompiles at trace
    level.

Typical flow::

    p = Predictor.from_checkpoint("ckpts", image_size=(1024, 2048))
    export_predictor(p, "bisenet_1024x2048.rtsds")
    # ... on the serving host ...
    ep = load_predictor("bisenet_1024x2048.rtsds")
    masks = ep.predict(frames_u8)          # (N, H, W) int32 trainIds
"""

from __future__ import annotations

import json
import struct

import numpy as np

import jax

_MAGIC = b"RTSDS1\n"


def export_predictor(predictor, path: str,
                     platforms: tuple[str, ...] = ("tpu", "cpu"),
                     batch: int | str = "dynamic") -> str:
    """Serialize ``predictor``'s full serving computation + weights.

    Args:
      predictor: a :class:`rtsds_tpu.serve.Predictor` (single-device; mesh
        predictors must be exported unsharded and resharded at load).
      path: output file.
      platforms: lowering targets baked into the artifact.
      batch: ``"dynamic"`` exports a symbolic batch dimension (one
        artifact, any N); an int pins the batch statically (lets XLA
        specialize layouts; pair with the compiled sweet-spot batch).

    Returns ``path``.
    """
    from jax import export as jexport

    h, w = predictor.image_size
    variables = predictor.variables
    inner = predictor._predict  # (variables, frames_u8) -> masks

    def serve_fn(frames_u8):
        return inner(variables, frames_u8)

    if batch == "dynamic":
        scope = jexport.SymbolicScope()
        (b,) = jexport.symbolic_shape("b", scope=scope)
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, h, w, 3), np.uint8)
    exported = jexport.export(jax.jit(serve_fn),
                              platforms=list(platforms))(spec)
    payload = exported.serialize()

    meta = {
        "image_size": [h, w],
        "batch": batch if batch == "dynamic" else int(batch),
        "platforms": list(platforms),
        "num_classes": getattr(predictor.model, "num_classes", None),
        "model": type(predictor.model).__name__,
        "correct_preprocessing": predictor.correct_preprocessing,
        # which inference protocol is baked into the program (a ~12x
        # per-frame cost difference between plain and ensemble -- the
        # artifact must be distinguishable without timing it)
        "protocol": getattr(predictor, "protocol", "plain"),
        # int8 artifacts carry an accuracy caveat (near-tie argmax
        # pixels may flip across platforms; tests/test_quant.py) --
        # they too must be distinguishable from exact bf16 exports
        "quantize": getattr(predictor, "quantize", None),
    }
    head = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(head)))
        f.write(head)
        f.write(payload)
    return path


class ExportedPredictor:
    """A loaded serving artifact: ``predict`` without any model code.

    The first ``predict`` per process compiles the embedded StableHLO for
    the local backend (no Python tracing); subsequent calls are cached.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.image_size = tuple(meta["image_size"])
        self.batch = meta["batch"]
        self._call = jax.jit(exported.call)

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) or (H, W, 3) uint8 -> (N, H, W) / (H, W) int32."""
        from rtsds_tpu.serve import batched_mask_predict

        batch = None if self.batch == "dynamic" else int(self.batch)
        return batched_mask_predict(self._call, frames, self.image_size,
                                    batch)

    def predict_colored(self, frames: np.ndarray) -> np.ndarray:
        """(..., H, W, 3) uint8 -> colorized (..., H, W, 3) uint8 masks."""
        from rtsds_tpu.serve import colorize_masks

        return colorize_masks(self.predict(frames))


def load_predictor(path: str) -> ExportedPredictor:
    """Load an artifact written by :func:`export_predictor`."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not an RTSDS serving artifact")
        raw = f.read(4)
        if len(raw) < 4:
            raise ValueError(f"{path}: truncated serving artifact")
        (hlen,) = struct.unpack("<I", raw)
        head = f.read(hlen)
        if len(head) < hlen:
            raise ValueError(f"{path}: truncated serving artifact")
        meta = json.loads(head.decode())
        payload = f.read()
    return ExportedPredictor(jexport.deserialize(payload), meta)
