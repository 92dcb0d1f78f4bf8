"""ctypes bindings for the native host ops (``native/rtsds_host_ops.cpp``).

Compiled lazily with g++ on first use; all entry points gracefully fall
back to the Python/PIL implementations when the toolchain or .so is
unavailable, so the framework never hard-depends on the native path.
ctypes calls release the GIL, giving the loader's thread pool real
parallelism on the resize/remap hot path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "rtsds_host_ops.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "librtsds_host_ops.so"))

_lib = None
_lib_lock = threading.Lock()
_remap_lut_key = None


def _build() -> bool:
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    for extra in (["-lpng", "-lz"], ["-DRTSDS_NO_PNG"]):
        try:
            subprocess.run(base + extra, check=True, capture_output=True,
                           timeout=120)
            return True
        except Exception:
            continue
    return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.resize_bilinear_aa_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.resize_nearest_i32.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int]
        lib.build_remap_lut.argtypes = [u8p, ctypes.c_int, ctypes.c_int]
        lib.rgb_to_train_ids.argtypes = [u8p, ctypes.c_int64, i32p]
        i8p = ctypes.POINTER(ctypes.c_int8)
        ppc = ctypes.POINTER(ctypes.c_char_p)
        try:  # PNG batch decode (absent when built with -DRTSDS_NO_PNG)
            lib.decode_batch_images.argtypes = [
                ppc, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i8p,
                ctypes.c_int]
            lib.decode_batch_images.restype = ctypes.c_int
            lib.decode_batch_labels.argtypes = [
                ppc, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i8p,
                ctypes.c_int, ctypes.c_int]
            lib.decode_batch_labels.restype = ctypes.c_int
            lib._has_png = True
        except AttributeError:
            lib._has_png = False
        _lib = lib
        return lib


def available() -> bool:
    return load() is not None


def png_available() -> bool:
    lib = load()
    return lib is not None and getattr(lib, "_has_png", False)


def _path_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_image_batch(paths: list[str], size: tuple[int, int],
                       n_threads: int = 8) -> np.ndarray | None:
    """Threaded C++ decode+antialias-resize of N PNGs into one NHWC uint8
    batch.  Returns None when the native PNG path is unavailable or any
    file fails (caller falls back to the per-item Python path)."""
    if not png_available() or not paths:
        return None
    lib = load()
    n = len(paths)
    dh, dw = size
    out = np.empty((n, dh, dw, 3), dtype=np.uint8)
    status = np.zeros((n,), dtype=np.int8)
    failures = lib.decode_batch_images(
        _path_array(paths), n, dh, dw, _u8p(out),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n_threads)
    return out if failures == 0 else None


def decode_label_batch(paths: list[str], size: tuple[int, int],
                       rgb: bool = False, n_threads: int = 8,
                       color_table: np.ndarray | None = None,
                       default_id: int = 255) -> np.ndarray | None:
    """Threaded C++ decode+nearest-resize of N label PNGs -> (N, H, W)
    int32.  ``rgb=True`` additionally remaps RGB-coded labels through the
    24-bit LUT (the GTA5 ``in_getting_decoder`` path).  Returns None when
    unavailable or any file fails."""
    global _remap_lut_key
    if not png_available() or not paths:
        return None
    lib = load()
    if rgb:
        from rtsds_tpu.utils.colors import class_colors_for_remap

        if color_table is None:
            color_table = class_colors_for_remap()
        table = np.ascontiguousarray(color_table, dtype=np.uint8)
        lut_key = (table.tobytes(), default_id)
        with _lib_lock:
            if _remap_lut_key != lut_key:
                lib.build_remap_lut(_u8p(table), table.shape[0], default_id)
                _remap_lut_key = lut_key
    n = len(paths)
    dh, dw = size
    out = np.empty((n, dh, dw), dtype=np.int32)
    status = np.zeros((n,), dtype=np.int8)
    failures = lib.decode_batch_labels(
        _path_array(paths), n, dh, dw, _i32p(out),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n_threads,
        1 if rgb else 0)
    return out if failures == 0 else None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def resize_bilinear_aa(image: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Antialiased triangle-filter resize of HWC uint8 (PIL-equivalent)."""
    lib = load()
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    dh, dw = size
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(image).resize(
            (dw, dh), Image.BILINEAR), dtype=np.uint8)
    out = np.empty((dh, dw, c), dtype=np.uint8)
    lib.resize_bilinear_aa_u8(_u8p(image), h, w, _u8p(out), dh, dw, c)
    return out


def resize_nearest(labels: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest resize of HW int labels."""
    lib = load()
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = labels.shape
    dh, dw = size
    if lib is None:
        rows = np.minimum((np.arange(dh) * h / dh).astype(np.int64), h - 1)
        cols = np.minimum((np.arange(dw) * w / dw).astype(np.int64), w - 1)
        return labels[rows][:, cols]
    out = np.empty((dh, dw), dtype=np.int32)
    lib.resize_nearest_i32(_i32p(labels), h, w, _i32p(out), dh, dw)
    return out


def rgb_to_train_ids(rgb: np.ndarray, color_table: np.ndarray | None = None,
                     default_id: int = 255) -> np.ndarray:
    """HWC uint8 RGB label -> HW int32 trainIds via the 24-bit LUT."""
    global _remap_lut_key
    from rtsds_tpu.utils.colors import class_colors_for_remap

    if color_table is None:
        color_table = class_colors_for_remap()
    lib = load()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if lib is None:
        import jax.numpy as jnp

        from rtsds_tpu.ops.remap import rgb_to_train_ids as jax_remap

        return np.asarray(jax_remap(jnp.asarray(rgb), color_table,
                                    default_id=default_id))
    table = np.ascontiguousarray(color_table, dtype=np.uint8)
    lut_key = (table.tobytes(), default_id)
    with _lib_lock:
        if _remap_lut_key != lut_key:
            lib.build_remap_lut(_u8p(table), table.shape[0], default_id)
            _remap_lut_key = lut_key
    h, w = rgb.shape[:2]
    out = np.empty((h, w), dtype=np.int32)
    lib.rgb_to_train_ids(_u8p(rgb), h * w, _i32p(out))
    return out
