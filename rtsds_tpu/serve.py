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


def load_checkpoint_variables(checkpoint_dir: str,
                              use_ema: bool = True) -> dict:
    """Best (else latest) ModelCheckpoint step -> inference variable tree.

    The stored tree is ``{"model": state}`` or ``{"generator": ...}``; the
    segmentation network is 'model' or 'generator'.  When the run trained
    with EMA, the checkpoint carries an ``ema`` item holding the weights
    the validation mIoU (and best-step selection) was computed on --
    prefer THOSE; ``use_ema=False`` opts back into raw training params.
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
    params = tree["params"]
    # restored is Composite/dict-like; .get covers both
    ema = restored.get("ema") if hasattr(restored, "get") else None
    if use_ema and ema:
        params = ema["params"]
        print("serve: using the checkpoint's EMA weights "
              "(use_ema=False for the raw training params)")
    variables = {"params": params}
    if "batch_stats" in tree:
        variables["batch_stats"] = tree["batch_stats"]
    return variables


def batched_mask_predict(call, frames: np.ndarray,
                         image_size: tuple[int, int],
                         batch_size: int | None) -> np.ndarray:
    """Shared serving batch discipline: (N|_, H, W, 3) uint8 -> masks.

    Promotes single frames, validates the compiled size, chunks N >
    ``batch_size``, zero-pads N < ``batch_size`` and slices the result.
    ``batch_size=None`` means the callee accepts any N (dynamic batch).
    Used by both the live :class:`Predictor` and the AOT
    :class:`rtsds_tpu.serve_export.ExportedPredictor` so the subtle
    pad/chunk/slice logic exists exactly once.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    single = frames.ndim == 3
    if single:
        frames = frames[None]
    if frames.shape[1:3] != tuple(image_size):
        raise ValueError(
            f"predictor compiled for {tuple(image_size)}, got "
            f"{frames.shape[1:3]}")
    n = frames.shape[0]
    if batch_size is not None:
        if n > batch_size:
            chunks = [
                batched_mask_predict(call, frames[i:i + batch_size],
                                     image_size, batch_size)
                for i in range(0, n, batch_size)]
            return np.concatenate(chunks)
        if n < batch_size:
            pad = np.zeros((batch_size - n, *frames.shape[1:]), np.uint8)
            frames = np.concatenate([frames, pad])
    out = call(frames)
    if hasattr(out, "device"):  # jax array: slice the padding off ON
        out = out[:n]           # DEVICE so its rows are never fetched
    # device->host is the measured serving bottleneck on tunneled
    # backends (~20 MB/s vs ~1 GB/s host->device); the device side emits
    # uint8 masks (4x smaller wire format) and the int32 contract is
    # restored here at host-memory speed
    masks = np.asarray(out)[:n].astype(np.int32, copy=False)
    return masks[0] if single else masks


def protocol_kwargs_from_flags(protocol: str, scales: str = "0.75, 1.0, 1.25",
                               window: str = "512, 1024",
                               stride: str = "",
                               window_chunk: int = 0) -> dict:
    """CLI flag strings -> :class:`Predictor` ``protocol_kwargs`` (shared
    by the serve CLI and the HTTP server so the parsing exists once)."""
    from rtsds_tpu.config import parse_float_list, parse_int_list

    if protocol == "ensemble":
        return {"scales": tuple(parse_float_list(scales))}
    if protocol == "sliding":
        kwargs = {"window": tuple(parse_int_list(window))}
        if stride:
            kwargs["stride"] = tuple(parse_int_list(stride))
        if window_chunk > 0:
            kwargs["window_chunk"] = window_chunk
        return kwargs
    return {}


def colorize_masks(masks: np.ndarray) -> np.ndarray:
    """(..., H, W) trainId masks -> colorized (..., H, W, 3) uint8."""
    if masks.ndim == 2:
        return apply_color_map(masks)
    return np.stack([apply_color_map(m) for m in masks])


class Predictor:
    """Device-resident segmentation predictor.

    Args:
      model_name: 'bisenet' or 'deeplab'.
      variables: Flax variable dict (params + batch_stats); e.g. from a
        ``CheckpointManager.restore`` or a fresh ``model.init``.
      image_size: static (H, W) the predictor compiles for.
      batch_size: static micro-batch size; inputs are padded up to it.
      dtype: compute dtype (bf16 default -- MXU path).
      mesh: optional ``jax.sharding.Mesh`` for multi-chip serving
        (weights replicated, inputs sharded).
      sharding: with a mesh, 'batch' shards frames over chips
        (throughput) or 'spatial' shards each frame's height
        (single-frame latency).
      protocol: 'plain' (one forward; the real-time path), 'ensemble'
        (multi-scale + flip probability averaging -- the accuracy-first
        eval protocol, typically ~1 mIoU point) or 'sliding'
        (overlapping windows for inputs beyond the train resolution,
        e.g. 4K panoramas -- measured 10.3 FPS/chip at 2048x4096).
        Everything still compiles into ONE XLA program.
      protocol_kwargs: forwarded to the protocol builder, e.g.
        ``{"scales": (0.75, 1.0, 1.25), "flip": True}`` or
        ``{"window": (1024, 2048), "stride": None}``.
      quantize: ``"int8"`` serves through the W8A8 post-training
        quantized path (``models/deeplab_int8.py`` /
        ``models/bisenet_int8.py``: BN folded, int8 convs on the MXU's
        2x-rate path, measured per-model policies -- DeepLab +13% at b8
        and +41% at its b32 batch plateau; BiSeNet +15% at b48
        @1024x2048, PERF.md).  Requires ``calib_frames`` or
        ``act_scales``.
      calib_frames: (N, H, W, 3) uint8 frames used once at construction
        to calibrate the static activation scales (a handful of
        representative frames; they go through the production
        preprocess).  Required with ``quantize``.
      calib_stat: activation-scale statistic, ``"max"`` (max-abs) or
        ``"percentile"`` (outlier-robust; see
        ``ops/quant.py:calibrate_net`` and the measured ablation in
        PERF.md).
      calib_percentile: the percentile for ``calib_stat="percentile"``.
      act_scales: precomputed ``{conv_name: scale}`` activation scales
        (e.g. a QAT run's ``qat_act_scales.json`` — auto-loaded by
        :meth:`from_checkpoint`).  Skips calibration entirely:
        ``calib_frames`` is then not required, and the served grid is
        exactly the one the weights were tuned for.
    """

    def __init__(self, model_name: str = "bisenet", variables: dict | None = None,
                 image_size: tuple[int, int] = (1024, 2048),
                 batch_size: int = 1, num_classes: int = 19,
                 backbone: str = "resnet18", dtype=jnp.bfloat16,
                 correct_preprocessing: bool = False,
                 mesh=None, sharding: str = "batch",
                 protocol: str = "plain",
                 protocol_kwargs: dict | None = None,
                 quantize: str | None = None,
                 calib_frames=None, calib_stat: str = "max",
                 calib_percentile: float = 99.9,
                 act_scales: dict | None = None):
        if model_name == "bisenet":
            self.model = BiSeNet(num_classes=num_classes,
                                 context_path=backbone, dtype=dtype,
                                 output_f32=False)
        elif model_name == "deeplab":
            self.model = DeepLabV2(num_classes=num_classes, dtype=dtype,
                                   output_f32=False)
        else:
            raise ValueError(model_name)
        # the uint8 wire format (``_predict`` casts masks to uint8 before
        # the device->host fetch) can only represent class ids 0..255
        if num_classes > 256:
            raise ValueError(
                f"num_classes={num_classes} exceeds the uint8 serving wire "
                f"format (class ids must fit in a byte)")
        self.image_size = tuple(image_size)
        self.batch_size = batch_size
        self.correct_preprocessing = correct_preprocessing

        if variables is None:
            key = jax.random.key(0)
            dummy = jnp.zeros((batch_size, *self.image_size, 3), jnp.float32)
            variables = self.model.init(key, dummy, train=False)

        # W8A8 quantization happens BEFORE mesh replication so the int8
        # weight tree is what gets replicated/donated downstream
        self.quantize = quantize
        apply_fn = self.model.apply
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r} "
                                 f"(supported: 'int8')")
            if calib_frames is None and act_scales is None:
                raise ValueError(
                    "quantize='int8' needs calib_frames (a few "
                    "representative (N, H, W, 3) uint8 frames to "
                    "calibrate the static activation scales) or "
                    "precomputed act_scales")
            if model_name == "deeplab":
                from rtsds_tpu.models.deeplab_int8 import (
                    build_quantized, calibrate, fold_deeplab as fold,
                    deeplab_int8_apply as int8_apply)
            else:
                from rtsds_tpu.models.bisenet_int8 import (
                    build_quantized, calibrate, fold_bisenet as fold,
                    bisenet_int8_apply as int8_apply)

            folded = fold(variables)
            if act_scales is not None:
                # a QAT (or otherwise precomputed) grid: validate it
                # covers THIS topology exactly -- every legitimate
                # producer (calibrate_net, the QAT sidecar) records a
                # scale for EVERY conv, and build_quantized quietly
                # serves any uncovered conv in bf16, so a partial dict
                # (trimmed/stale/hand-built) would silently degrade the
                # int8 grid instead of erroring
                unknown = sorted(set(act_scales) - set(folded))
                missing = sorted(set(folded) - set(act_scales))
                if unknown or missing:
                    raise ValueError(
                        f"act_scales do not match the {model_name} conv "
                        f"topology ("
                        + ("; ".join(
                            filter(None, [
                                f"unknown names: {unknown[:5]}" if unknown
                                else "",
                                f"missing convs: {missing[:5]}" if missing
                                else "",
                            ])) or "empty scales dict") + ")")
                scales = act_scales
            else:
                calib = np.asarray(calib_frames, dtype=np.uint8)
                if calib.ndim == 3:
                    calib = calib[None]
                # chunk the calibration forwards to the serving batch
                # size (ONE compiled shape; the tail wraps around --
                # repeated frames cannot change a max and only
                # marginally reweight a per-batch percentile) so a
                # many-image calibration set never compiles or runs a
                # giant one-off batch
                if calib.shape[0] > batch_size:
                    pad = (-calib.shape[0]) % batch_size
                    if pad:
                        calib = np.concatenate([calib, calib[:pad]])
                    chunks = [calib[i:i + batch_size]
                              for i in range(0, calib.shape[0], batch_size)]
                else:
                    chunks = [calib]
                calib_batches = (
                    normalize(jnp.asarray(c, jnp.float32),
                              correct_preprocessing) for c in chunks)
                scales = calibrate(variables, calib_batches, folded=folded,
                                   stat=calib_stat,
                                   percentile=calib_percentile)
            variables = build_quantized(variables, scales, folded=folded)

            def apply_fn(qtree, x, train=False):
                return int8_apply(qtree, x)

        # multi-chip serving: replicate weights over the mesh and shard
        # the incoming frame batch ('batch', the throughput mode) or each
        # frame's height ('spatial', the single-frame latency mode --
        # XLA inserts the conv halo exchanges).  One predict() call then
        # fans out over every chip of the mesh.
        self._in_sharding = None
        if mesh is not None:
            from rtsds_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding, spatial_sharding)

            n = mesh.devices.size
            if sharding == "batch":
                if batch_size % n:
                    raise ValueError(
                        f"batch_size {batch_size} must be a multiple of the "
                        f"{n}-device mesh for batch-sharded serving")
                self._in_sharding = batch_sharding(mesh)
            elif sharding == "spatial":
                if self.image_size[0] % n:
                    raise ValueError(
                        f"image height {self.image_size[0]} must divide over "
                        f"the {n}-device mesh for spatial serving")
                # XLA's SPMD partitioner emits invalid HLO (s8 halo-fill
                # broadcast, hlo_verifier SameElementType) when an int8
                # conv's sharded height collapses below one row per
                # device; bf16 tolerates degenerate bands, s8 does not.
                # Guard on the DEEPEST feature map (stride 32 for the
                # bisenet context path, 8 for dilated deeplab) so the
                # failure is a clear error, not an XLA internal crash.
                # Production spatial serving shapes are far above this.
                if quantize is not None:
                    min_stride = 8 if model_name == "deeplab" else 32
                    if self.image_size[0] // min_stride < n:
                        raise ValueError(
                            f"quantize='int8' with spatial serving needs "
                            f"image height >= {min_stride * n} on a "
                            f"{n}-device mesh (the deepest feature map, "
                            f"height/{min_stride}, must keep >= 1 row "
                            f"per device; XLA's partitioner cannot halo "
                            f"thinner int8 bands)")
                self._in_sharding = spatial_sharding(mesh)
            else:
                raise ValueError(f"unknown serving sharding {sharding!r}")
            variables = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, replicated_sharding(mesh))
                if hasattr(a, "shape") else a, variables)
            self.variables = variables
        else:
            self.variables = jax.device_put(variables)

        correct = correct_preprocessing

        protocol_fn = None
        if protocol == "ensemble":
            from rtsds_tpu.eval.ensemble import make_ensemble_predict

            protocol_fn = make_ensemble_predict(
                apply_fn, self.image_size, **(protocol_kwargs or {}))
        elif protocol == "sliding":
            from rtsds_tpu.eval.sliding import make_sliding_predict

            protocol_fn = make_sliding_predict(
                apply_fn, self.image_size, **(protocol_kwargs or {}))
        elif protocol != "plain":
            raise ValueError(f"unknown serving protocol {protocol!r}")
        self.protocol = protocol

        @jax.jit
        def _predict(variables, frames_u8):
            x = normalize(frames_u8.astype(jnp.float32), correct)
            if protocol_fn is not None:
                out = protocol_fn(variables, x)
            else:
                logits = apply_fn(variables, x, train=False)
                out = jnp.argmax(logits, axis=-1)
            # uint8 wire format: trainIds are < 256 and device->host is
            # the serving bottleneck through tunneled backends; callers
            # get int32 back from batched_mask_predict
            return out.astype(jnp.uint8)

        self._predict = _predict

    def _stage(self, frames: np.ndarray):
        """Host->device staging, honoring the mesh sharding if any."""
        arr = jnp.asarray(frames)
        if self._in_sharding is not None:
            arr = jax.device_put(arr, self._in_sharding)
        return arr

    def warmup(self):
        dummy = np.zeros((self.batch_size, *self.image_size, 3), np.uint8)
        np.asarray(self._predict(self.variables, self._stage(dummy)))
        return self

    def predict(self, frames: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 -> (N, H, W) int32 trainId masks.

        N may be smaller than the compiled batch; inputs are zero-padded
        and outputs sliced, so one compiled program serves any N <= batch.
        """
        return batched_mask_predict(
            lambda f: self._predict(self.variables, self._stage(f)),
            frames, self.image_size, self.batch_size)

    def predict_iter(self, frames_iter):
        """Streaming inference: yields masks per input batch while keeping
        ONE batch in flight on device (JAX async dispatch overlaps the
        host->device staging and mask fetch of batch N with the compute of
        batch N+1 -- the real-time camera-feed pattern)."""
        pending = None
        for frames in frames_iter:
            frames = np.asarray(frames, dtype=np.uint8)
            if frames.ndim == 3:
                frames = frames[None]
            n = frames.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, *frames.shape[1:]),
                               np.uint8)
                frames = np.concatenate([frames, pad])
            elif n > self.batch_size:
                raise ValueError(
                    f"stream batches must be <= compiled batch "
                    f"{self.batch_size}, got {n}")
            # slice the padding off ON DEVICE (fetch only n rows) and
            # restore the int32 contract at host-memory speed
            fut = self._predict(self.variables, self._stage(frames))[:n]
            if pending is not None:
                yield np.asarray(pending[0]).astype(np.int32, copy=False)
            pending = (fut, n)
        if pending is not None:
            yield np.asarray(pending[0]).astype(np.int32, copy=False)

    def predict_colored(self, frames: np.ndarray) -> np.ndarray:
        """(..., H, W, 3) uint8 -> colorized (..., H, W, 3) uint8 masks."""
        return colorize_masks(self.predict(frames))

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, use_ema: bool = True,
                        use_qat_scales: bool = True,
                        **kwargs) -> "Predictor":
        """Restore the latest (or best) checkpoint saved by ModelCheckpoint.

        The stored tree is ``{"model": state}`` or ``{"generator": state,
        ...}``; the segmentation network is 'model' or 'generator'.  When
        the run trained with EMA enabled, the checkpoint carries an
        ``ema`` item holding the weights the validation mIoU (and so
        best-step selection) was computed on -- serve THOSE by default;
        ``use_ema=False`` opts back into the raw training params.

        A QAT write-back checkpoint (``python -m rtsds_tpu.qat``)
        carries a ``qat_act_scales.json`` sidecar; with
        ``quantize='int8'`` those scales are served automatically so the
        deployed grid is exactly the one the weights were tuned for.
        The sidecar takes precedence over ``calib_frames``/``calib_stat``
        kwargs; pass ``use_qat_scales=False`` (CLI ``--recalibrate``) to
        ignore it and recalibrate from the inputs, or ``act_scales``
        explicitly to serve a different precomputed grid.
        """
        if (use_qat_scales and kwargs.get("quantize")
                and "act_scales" not in kwargs):
            from rtsds_tpu.train.qat import load_act_scales

            sidecar = load_act_scales(checkpoint_dir)
            if sidecar is not None:
                scales, meta = sidecar
                kwargs["act_scales"] = scales
                print(f"serving the QAT activation scales from "
                      f"{checkpoint_dir} ({meta.get('calib_stat')} "
                      f"calibration, {len(scales)} convs)")
        return cls(variables=load_checkpoint_variables(
            checkpoint_dir, use_ema=use_ema), **kwargs)


def main(argv=None):
    """Inference CLI: ``python -m rtsds_tpu.serve [--checkpoint DIR] img...``

    Decodes the given images, resizes them to the compiled size, runs the
    predictor, and writes ``<name>_mask.png`` (trainIds) or
    ``<name>_color.png`` (colorized) next to ``--out``.  Without
    ``--checkpoint`` the model runs from random init (smoke / perf use).
    """
    import argparse
    import os

    parser = argparse.ArgumentParser(
        description="RTSDS-TPU real-time segmentation inference")
    parser.add_argument("images", nargs="*", help="input image paths (PNG)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="ModelCheckpoint directory (best/latest step)")
    parser.add_argument("--model", type=str, default="bisenet",
                        choices=["bisenet", "deeplab"])
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--size", type=str, default="1024, 2048",
                        help='inference size "H, W"')
    parser.add_argument("--out", type=str, default=".",
                        help="output directory")
    parser.add_argument("--colored", action="store_true",
                        help="write colorized masks instead of trainIds")
    parser.add_argument("--correct_preprocessing", action="store_true",
                        help="standard /255 preprocessing (must match how "
                             "the checkpoint was trained)")
    parser.add_argument("--num_classes", type=int, default=19)
    parser.add_argument("--protocol", type=str, default="plain",
                        choices=["plain", "ensemble", "sliding"],
                        help="inference protocol: plain forward (real-time)"
                             ", multi-scale+flip ensemble (accuracy-first)"
                             ", or sliding-window (beyond-train-resolution"
                             " inputs)")
    parser.add_argument("--scales", type=str, default="0.75, 1.0, 1.25",
                        help='ensemble scales, e.g. "0.75, 1.0, 1.25"')
    parser.add_argument("--window", type=str, default="512, 1024",
                        help='sliding window "H, W"')
    parser.add_argument("--stride", type=str, default="",
                        help='sliding stride "H, W" (default 3/4 window)')
    parser.add_argument("--window_chunk", type=int, default=0,
                        help="max sliding windows stacked per forward; "
                             "0 = all windows in one batched forward "
                             "(fastest). Lower it if batch x windows "
                             "exceeds device memory")
    parser.add_argument("--export", type=str, default=None, metavar="PATH",
                        help="write a self-contained AOT serving artifact "
                             "(StableHLO + weights; see serve_export.py) "
                             "and exit")
    parser.add_argument("--artifact", type=str, default=None, metavar="PATH",
                        help="serve from an exported artifact instead of "
                             "model code + checkpoint")
    parser.add_argument("--compilation_cache", default=None, metavar="DIR",
                        help="persistent XLA compile cache directory")
    parser.add_argument("--mesh", type=str, default=None,
                        choices=["batch", "spatial"],
                        help="serve across ALL visible chips: 'batch' "
                             "shards frames over chips (throughput, "
                             "bit-exact vs single device), 'spatial' "
                             "shards image height (single-frame latency)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="serve through the W8A8 post-training "
                             "quantized path (activation scales are "
                             "calibrated on the given input images)")
    parser.add_argument("--calib_stat", type=str, default="max",
                        choices=["max", "percentile"],
                        help="activation-scale statistic for --quantize: "
                             "max-abs or an outlier-robust percentile "
                             "(measured ablation in PERF.md)")
    parser.add_argument("--calib_percentile", type=float, default=99.9,
                        help="percentile for --calib_stat percentile")
    parser.add_argument("--recalibrate", action="store_true",
                        help="ignore a QAT act-scales sidecar in the "
                             "checkpoint and recalibrate from the input "
                             "images (otherwise the sidecar takes "
                             "precedence over --calib_stat/"
                             "--calib_percentile)")
    args = parser.parse_args(argv)

    if args.compilation_cache:
        from rtsds_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    # pure flag validation BEFORE any expensive model/artifact work
    if args.export and args.artifact:
        parser.error("--export needs a live model, not --artifact")
    if args.artifact and args.protocol != "plain":
        parser.error("--protocol is baked into an artifact at export time; "
                     "export a protocol-enabled predictor instead of "
                     "passing --protocol with --artifact")
    if args.mesh and (args.artifact or args.export):
        parser.error("--mesh is live multi-chip serving; AOT artifacts "
                     "are single-device programs (export without --mesh)")
    if not args.images and not args.export:
        parser.error("no input images given")
    if args.quantize and args.artifact:
        parser.error("--quantize happens at predictor build time; the "
                     "artifact is already a compiled program")
    if args.quantize and not args.images:
        parser.error("--quantize needs input images to calibrate the "
                     "activation scales")

    from rtsds_tpu.data.pipeline import decode_image

    size = tuple(int(v) for v in args.size.replace(" ", "").split(","))

    def decode_frames(sz):
        return (np.stack([decode_image(p, sz) for p in args.images])
                if args.images else None)

    if args.artifact:
        from rtsds_tpu.serve_export import load_predictor

        predictor = load_predictor(args.artifact)
        size = predictor.image_size  # decode at the ARTIFACT's size
        frames = decode_frames(size)
    else:
        frames = decode_frames(size)
        protocol_kwargs = protocol_kwargs_from_flags(
            args.protocol, args.scales, args.window, args.stride,
            args.window_chunk)
        kwargs = dict(model_name=args.model, image_size=size,
                      batch_size=min(max(len(args.images), 1), 8),
                      num_classes=args.num_classes, backbone=args.backbone,
                      correct_preprocessing=args.correct_preprocessing,
                      protocol=args.protocol,
                      protocol_kwargs=protocol_kwargs)
        if args.quantize:
            kwargs["quantize"] = args.quantize
            kwargs["calib_frames"] = frames
            kwargs["calib_stat"] = args.calib_stat
            kwargs["calib_percentile"] = args.calib_percentile
            if args.recalibrate and args.checkpoint:
                # from_checkpoint-only knob: without a checkpoint there
                # is no sidecar to ignore (Predictor() rejects it)
                kwargs["use_qat_scales"] = False
        if args.mesh:
            from rtsds_tpu.parallel.mesh import make_mesh

            # batch mode trims the mesh to divide the batch; spatial
            # mode bands image height over every chip
            kwargs["mesh"] = make_mesh(
                batch_size=kwargs["batch_size"] if args.mesh == "batch"
                else None)
            kwargs["sharding"] = args.mesh
        if args.checkpoint:
            predictor = Predictor.from_checkpoint(args.checkpoint, **kwargs)
        else:
            print("serve: no --checkpoint given, running from RANDOM init")
            predictor = Predictor(**kwargs)
    if args.export:
        from rtsds_tpu.serve_export import export_predictor

        export_predictor(predictor, args.export)
        print(f"exported serving artifact to {args.export}")
        if not args.images:
            return
        # images given alongside --export: fall through and predict them
        # too (previously they were silently ignored)

    os.makedirs(args.out, exist_ok=True)
    outputs = (predictor.predict_colored(frames) if args.colored
               else predictor.predict(frames))
    from PIL import Image

    for path, out in zip(args.images, outputs):
        stem = os.path.splitext(os.path.basename(path))[0]
        suffix = "_color.png" if args.colored else "_mask.png"
        dst = os.path.join(args.out, stem + suffix)
        if args.colored:
            Image.fromarray(out.astype(np.uint8)).save(dst)
        else:
            Image.fromarray(out.astype(np.uint8), mode="L").save(dst)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
