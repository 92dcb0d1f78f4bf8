"""Pretrained-weight ingestion: torch state dicts -> Flax variable trees.

Capability parity with the reference's two loading paths:
  * torchvision ImageNet ResNets for the BiSeNet context path
    (``build_contextpath.py:8,35`` uses ``pretrained=True``)
  * the DeepLabV2 external checkpoint, whose keys are ingested by stripping
    the first dotted segment and loading non-strictly
    (``deeplabv2.py:179-188``)

Offline-friendly: loading happens only when a local ``.pth``/``.npz`` path
is supplied (this environment has no network egress); otherwise models run
from random init.  torch is used purely as a host-side deserializer.

Layout conversion: torch Conv2d weights are OIHW, Flax kernels are HWIO
(``transpose(2, 3, 1, 0)``); BN ``weight/bias`` -> params ``scale/bias``;
``running_mean/running_var`` -> batch_stats ``mean/var``.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        # .numpy() aliases the torch storage -- copy so later in-place
        # mutation of the source model (e.g. a train-mode forward updating
        # BN running stats) cannot corrupt converted weights
        return v.detach().cpu().numpy().copy()
    return np.array(v)


def _translate_key(key: str) -> tuple[str, tuple[str, ...]] | None:
    """torch dotted key -> (collection, flax path) or None to skip.

    Handles torchvision-style names::

        conv1.weight                    -> params/conv1/kernel
        bn1.weight|bias                 -> params/bn1/scale|bias
        bn1.running_mean|var            -> batch_stats/bn1/mean|var
        layer2.3.conv1.weight           -> params/layer2_3/conv1/kernel
        layer2.0.downsample.0.weight    -> params/layer2_0/downsample_conv/kernel
        layer2.0.downsample.1.*         -> params/layer2_0/downsample_bn/*
        layer6.conv2d_list.2.weight     -> params/layer6/conv2d_list_2/kernel
    """
    parts = key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None

    # flatten "layerL.B" -> "layerL_B" and "conv2d_list.I" -> "conv2d_list_I"
    flat: list[str] = []
    i = 0
    while i < len(parts) - 1:  # last part is the leaf name
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) - 1 else None
        if re.fullmatch(r"layer\d+", p) and nxt is not None and nxt.isdigit():
            flat.append(f"{p}_{nxt}")
            i += 2
        elif p == "conv2d_list" and nxt is not None and nxt.isdigit():
            flat.append(f"conv2d_list_{nxt}")
            i += 2
        elif p == "downsample" and nxt is not None:
            # downsample.0 = conv, downsample.1 = bn
            flat.append("downsample_conv" if nxt == "0" else "downsample_bn")
            i += 2
        else:
            flat.append(p)
            i += 1
    leaf = parts[-1]

    is_bn = bool(flat) and ("bn" in flat[-1] or flat[-1] == "downsample_bn")
    if leaf == "weight":
        if is_bn:
            return "params", (*flat, "scale")
        return "params", (*flat, "kernel")
    if leaf == "bias":
        return "params", (*flat, "bias")
    if leaf == "running_mean":
        return "batch_stats", (*flat, "mean")
    if leaf == "running_var":
        return "batch_stats", (*flat, "var")
    return None


def convert_torch_state_dict(state_dict: Mapping[str, object],
                             strip_prefix: bool = False,
                             strict: bool = False) -> dict:
    """Convert a torch state dict into ``{"params": ..., "batch_stats": ...}``.

    ``strip_prefix=True`` drops the first dotted segment of every key, the
    reference's DeepLab ingestion rule (``deeplabv2.py:185-187``).
    ``strict=True`` raises on any key the translator cannot map (instead
    of silently dropping it) -- ``num_batches_tracked`` counters are
    always an intentional skip, never an error.
    """
    out: dict = {"params": {}, "batch_stats": {}}
    unmapped: list[str] = []
    for key, value in state_dict.items():
        if strip_prefix:
            key = key.split(".", 1)[-1]
        translated = _translate_key(key)
        if translated is None:
            if not key.endswith("num_batches_tracked"):
                unmapped.append(key)
            continue
        collection, path = translated
        arr = _to_numpy(value)
        if path[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        node = out[collection]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    if strict and unmapped:
        raise ValueError(
            f"checkpoint keys the converter cannot map: {unmapped}")
    return out


def _merge(dst: dict, src: dict, path: str = "",
           dtype=None) -> tuple[int, list[str]]:
    """Recursively copy matching leaves of src into dst (strict=False)."""
    loaded, skipped = 0, []
    for k, v in src.items():
        if k not in dst:
            skipped.append(f"{path}{k}")
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            sub_loaded, sub_skipped = _merge(dst[k], v, f"{path}{k}/", dtype)
            loaded += sub_loaded
            skipped += sub_skipped
        else:
            if np.shape(dst[k]) != np.shape(v):
                skipped.append(f"{path}{k} (shape {np.shape(v)} vs {np.shape(dst[k])})")
                continue
            dst[k] = np.asarray(v, dtype=dtype or np.asarray(dst[k]).dtype)
            loaded += 1
    return loaded, skipped


def merge_pretrained(variables: dict, converted: dict,
                     submodule: str | None = None, verbose: bool = True,
                     dtype=None, report: dict | None = None) -> dict:
    """Load converted weights into a freshly-initialized variable tree.

    ``submodule`` targets a nested scope (e.g. ``"context_path"`` to load a
    torchvision ResNet into BiSeNet's backbone).  Non-strict, like the
    reference's ``load_state_dict(strict=False)``.  ``dtype`` overrides the
    destination leaf dtype (float64 parity tests pass ``np.float64`` so
    converted weights are not rounded to the f32 init dtype).
    """
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    total_loaded = 0
    all_skipped: list[str] = []
    for collection in ("params", "batch_stats"):
        if collection not in variables or collection not in converted:
            continue
        dst = variables[collection]
        if submodule is not None:
            if submodule not in dst:
                continue
            dst = dst[submodule]
        loaded, skipped = _merge(dst, converted[collection], dtype=dtype)
        total_loaded += loaded
        all_skipped += skipped
    if verbose:
        print(f"pretrained: loaded {total_loaded} tensors"
              + (f", skipped {len(all_skipped)}" if all_skipped else ""))
    if report is not None:  # coverage audit: exactly what loaded/skipped
        report["loaded"] = total_loaded
        report["skipped"] = all_skipped
    return variables


def _inv_scope(name: str) -> str:
    """Invert :func:`_translate_key`'s scope flattening (flax -> torch)."""
    if name == "downsample_conv":
        return "downsample.0"
    if name == "downsample_bn":
        return "downsample.1"
    m = re.fullmatch(r"(layer\d+)_(\d+)", name)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    m = re.fullmatch(r"conv2d_list_(\d+)", name)
    if m:
        return f"conv2d_list.{m.group(1)}"
    return name


def export_torch_state_dict(variables: Mapping, rename: Mapping[str, str]
                            | None = None, prefix: str = "",
                            bn_counters: bool = True) -> dict:
    """Flax variable tree -> torch-style flat state dict (numpy values).

    The exact inverse of :func:`convert_torch_state_dict`: scopes
    un-flatten (``layer2_3`` -> ``layer2.3``, ``downsample_conv`` ->
    ``downsample.0``, ...), 4-D kernels transpose back HWIO -> OIHW,
    BN ``scale`` -> ``weight`` and batch_stats ``mean``/``var`` ->
    ``running_mean``/``running_var`` (2-D kernels pass through untouched,
    mirroring the forward converter).  Lets a reference user take weights
    trained HERE back to the torch ecosystem (the reference loads
    state dicts at ``deeplabv2.py:179-188`` / ``build_contextpath.py:8``).

    ``rename`` maps OUR first-segment scope names to the target's (e.g.
    ``spatial_path`` -> the reference BiSeNet's misspelled
    ``saptial_path``, ``build_bisenet.py``); ``prefix`` re-adds a dotted
    prefix the import stripped (DeepLab checkpoints).  ``bn_counters``
    emits the ``num_batches_tracked`` zero buffers torch BNs carry, so
    ``load_state_dict(strict=True)`` is satisfiable.
    """
    rename = dict(rename or {})
    out: dict = {}

    def torch_key(path: tuple[str, ...], leaf: str) -> str:
        head = rename.get(path[0], path[0]) if path else ""
        segs = [_inv_scope(s) for s in (head, *path[1:])]
        return prefix + ".".join((*segs, leaf))

    def walk(node, path, emit):
        for k in node:
            v = node[k]
            if hasattr(v, "items"):
                walk(v, (*path, k), emit)
            else:
                emit(path, k, np.asarray(v))

    def emit_param(path, leaf, arr):
        if leaf == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[torch_key(path, "weight")] = arr
        elif leaf == "scale":
            out[torch_key(path, "weight")] = arr
        elif leaf == "bias":
            out[torch_key(path, "bias")] = arr
        else:  # unknown leaf: export verbatim rather than drop silently
            out[torch_key(path, leaf)] = arr

    def emit_stat(path, leaf, arr):
        name = {"mean": "running_mean", "var": "running_var"}.get(leaf, leaf)
        out[torch_key(path, name)] = arr
        if bn_counters and leaf == "mean":
            out[torch_key(path, "num_batches_tracked")] = np.zeros(
                (), np.int64)

    if "params" in variables:
        walk(variables["params"], (), emit_param)
    if "batch_stats" in variables and variables["batch_stats"] is not None:
        walk(variables["batch_stats"], (), emit_stat)
    return out


# our BiSeNet scope names -> the reference's torch module names
# (including the reference's misspelled 'saptial_path', build_bisenet.py:89)
REFERENCE_BISENET_RENAMES = {
    "spatial_path": "saptial_path",
    "arm1": "attention_refinement_module1",
    "arm2": "attention_refinement_module2",
    "ffm": "feature_fusion_module",
}


def export_reference_bisenet_state_dict(variables: Mapping,
                                        context_aliases: bool = True) -> dict:
    """Export a BiSeNet tree under the REFERENCE's module names.

    ``context_aliases=True`` duplicates every ``context_path.*`` entry as
    ``context_path.features.*``: the reference context path aliases its
    torchvision submodules as attributes of ``self.features``
    (``build_contextpath.py:8-16``), so its state dict carries BOTH key
    sets and a ``load_state_dict(strict=True)`` demands the duplicates.
    """
    state = export_torch_state_dict(variables,
                                    rename=REFERENCE_BISENET_RENAMES)
    if context_aliases:
        for k in list(state):
            if k.startswith("context_path."):
                state["context_path.features."
                      + k[len("context_path."):]] = state[k]
    return state


def save_state_dict(state: Mapping[str, np.ndarray], path: str) -> int:
    """``torch.save`` a numpy state dict (as tensors); returns entry count."""
    import torch

    # copy=True: exported leaves can alias read-only jax buffers, which
    # torch.from_numpy refuses to own
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in state.items()}, path)
    return len(state)


def save_torch_checkpoint(variables: Mapping, path: str,
                          rename: Mapping[str, str] | None = None,
                          prefix: str = "") -> int:
    """Export + ``torch.save`` in one call; returns entry count."""
    return save_state_dict(
        export_torch_state_dict(variables, rename=rename, prefix=prefix),
        path)


def load_torch_checkpoint(path: str) -> dict:
    """Deserialize a ``.pth``/``.pt`` (via torch) or ``.npz`` checkpoint."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return dict(f)
    import torch  # host-side deserializer only

    return torch.load(path, map_location="cpu", weights_only=True)


def load_deeplab_pretrained(path: str) -> dict:
    """DeepLab external checkpoint -> converted tree (``deeplabv2.py:179-188``)."""
    state = load_torch_checkpoint(path)
    return convert_torch_state_dict(state, strip_prefix=True)


def load_backbone_pretrained(path: str) -> dict:
    """torchvision ImageNet ResNet checkpoint -> converted tree."""
    state = load_torch_checkpoint(path)
    return convert_torch_state_dict(state, strip_prefix=False)
