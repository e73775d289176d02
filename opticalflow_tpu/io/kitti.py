"""KITTI 16-bit PNG optical-flow I/O.

Encoding (KITTI devkit; reference readers ``inference_kitti.py:23-52``,
``data_processing_or.py:25-66``, ``inference.py:60-79``):

    u = (R - 2^15) / 64,  v = (G - 2^15) / 64,  valid = (B != 0)

Reads via cv2 when available (16-bit aware, like ``inference_kitti.py``) with
a PIL/imageio fallback; the writer mirrors ``inference.py:266-282``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_flow_png", "write_flow_png"]


def _imread_u16_rgb(path: str) -> np.ndarray:
    try:
        import cv2
        arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise RuntimeError(f"cv2.imread failed: {path}")
        return arr[..., ::-1]  # BGR → RGB
    except ImportError:
        import imageio.v2 as imageio
        return np.asarray(imageio.imread(path))


def read_flow_png(path: str):
    """Read a KITTI flow PNG → ((H, W, 2) float32 flow, (H, W) bool valid)."""
    arr = _imread_u16_rgb(path)
    if arr.ndim != 3 or arr.shape[2] < 3:
        raise ValueError(f"{path}: expected 3-channel PNG, got {arr.shape}")
    if arr.dtype != np.uint16:
        raise ValueError(f"{path}: expected uint16 PNG, got {arr.dtype}")
    u = (arr[..., 0].astype(np.float32) - 32768.0) / 64.0
    v = (arr[..., 1].astype(np.float32) - 32768.0) / 64.0
    valid = arr[..., 2] != 0
    return np.stack([u, v], axis=-1), valid


def write_flow_png(path: str, flow: np.ndarray,
                   valid: np.ndarray | None = None) -> None:
    """Write (H, W, 2) flow (+optional validity) as a KITTI 16-bit PNG."""
    flow = np.asarray(flow)
    h, w, _ = flow.shape
    out = np.zeros((h, w, 3), np.uint16)
    scaled = np.clip(flow * 64.0 + 32768.0, 0, 65535)
    out[..., 0] = scaled[..., 0].astype(np.uint16)
    out[..., 1] = scaled[..., 1].astype(np.uint16)
    out[..., 2] = (np.ones((h, w), np.uint16) if valid is None
                   else valid.astype(np.uint16))
    try:
        import cv2
        ok = cv2.imwrite(str(path), out[..., ::-1])  # RGB → BGR for cv2
        if not ok:
            raise RuntimeError(f"cv2.imwrite failed: {path}")
    except ImportError:
        # no cv2: write the PNG directly.  (imageio's 16-bit writers need
        # either FreeImage — a separate native download — or a plugin
        # stack we don't pin, and Pillow cannot write 16-bit RGB; a
        # hand-rolled encoder is 15 lines and dependency-free.)
        _write_png_u16_rgb(path, out)


def _write_png_u16_rgb(path: str, arr: np.ndarray) -> None:
    """Minimal 16-bit RGB PNG writer (bit depth 16, color type 2,
    filter 0): signature + IHDR + one zlib IDAT + IEND."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    be = arr.astype(">u2")  # PNG samples are big-endian
    raw = b"".join(b"\x00" + be[r].tobytes() for r in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
