"""ctypes loader for the native flowviz kernels (with auto-build + fallback).

``flow_to_color_native`` / ``resize_flow_native`` drop into the video overlay
hot path; if the shared library is missing it is built on first use with g++
(-O3), and if no toolchain exists the numpy implementations take over
transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["available", "flow_to_color_native", "flow_max_rad",
           "resize_flow_native", "draw_segments_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "flowviz.cpp")
# built artifact lives outside the package so it is never mistaken for a
# CPython extension module by import machinery
_LIB_DIR = os.environ.get("OPTICALFLOW_TPU_LIB_DIR",
                          os.path.expanduser("~/.cache/opticalflow_tpu"))
_LIB_PATH = os.path.join(_LIB_DIR, "libflowviz.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        os.makedirs(_LIB_DIR, exist_ok=True)
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ofv_flow_max_rad.restype = ctypes.c_double
        lib.ofv_flow_max_rad.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ofv_flow_to_color.restype = None
        lib.ofv_flow_to_color.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]
        lib.ofv_resize_flow_bilinear.restype = None
        lib.ofv_resize_flow_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.ofv_draw_segments.restype = None
        lib.ofv_draw_segments.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def flow_max_rad(flow: np.ndarray) -> float:
    lib = _load()
    flow = np.ascontiguousarray(flow, np.float32)
    if lib is None:
        return float(np.sqrt((flow ** 2).sum(-1)).max())
    return lib.ofv_flow_max_rad(_fptr(flow), flow.shape[0] * flow.shape[1])


def flow_to_color_native(flow: np.ndarray,
                         max_rad: float = 0.0) -> np.ndarray:
    """(H, W, 2) f32 → (H, W, 3) u8 RGB; falls back to the numpy wheel."""
    lib = _load()
    if lib is None:
        from opticalflow_tpu.viz.colorwheel import flow_to_color
        return flow_to_color(flow)
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    out = np.empty((h, w, 3), np.uint8)
    lib.ofv_flow_to_color(
        _fptr(flow), h, w, float(max_rad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def draw_segments_native(img: np.ndarray, segs: np.ndarray,
                         bgr) -> bool:
    """Draw (N, 2, 2) or (N, 4) int32 ``[x1 y1 x2 y2]`` segments into a
    contiguous (H, W, 3) u8 image in place, thickness 1, 8-connected,
    bit-exact vs ``cv2.line`` (including rect clipping).  Returns False
    (drew nothing) when the native library is unavailable — callers fall
    back to ``cv2.polylines``."""
    lib = _load()
    if lib is None:
        return False
    assert img.dtype == np.uint8 and img.flags.c_contiguous
    segs = np.ascontiguousarray(segs.reshape(-1, 4), np.int32)
    h, w = img.shape[:2]
    lib.ofv_draw_segments(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), segs.shape[0],
        int(bgr[0]), int(bgr[1]), int(bgr[2]))
    return True


def resize_flow_native(flow: np.ndarray, height: int,
                       width: int) -> np.ndarray:
    """Half-pixel bilinear flow resize + vector rescale (cv2-equivalent)."""
    lib = _load()
    if lib is None:
        from opticalflow_tpu.viz.overlay import resize_flow_np
        return resize_flow_np(flow, height, width)
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    out = np.empty((height, width, 2), np.float32)
    lib.ofv_resize_flow_bilinear(_fptr(flow), h, w, height, width,
                                 _fptr(out))
    return out
