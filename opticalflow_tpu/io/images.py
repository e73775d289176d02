"""Image loading + geometry helpers for the /64-constrained PWC pipeline.

The architecture has six stride-2 levels, so inputs must be multiples of 64.
The reference uses two distinct strategies, both preserved as named helpers:

  * :func:`resize_to_multiple_of_64` — distorting bilinear resize (canonical
    CLI, ``script_pwc.py:47-54``; flow vectors rescaled back after);
  * :func:`pad_to_multiple_of_64` / :func:`unpad` — replicate pad bottom/right
    (``inference_kitti.py:53-71``, ``pwc_extract_flow.py:31-44``).

Plus the two preprocessing conventions (easy to silently get wrong —
BASELINE.md "numeric contract"):

  * ``bgr_unit``: BGR order, /255, **no** normalization — what the canonical
    ``pwc_net.pth.tar`` weights expect (``script_pwc.py:56-58``);
  * ``rgb_imagenet``: RGB + ImageNet mean/std — used by the repo's own
    fine-tuned checkpoints (``inference.py:305-310``,
    ``inference_kitti.py:176-179``).
"""

from __future__ import annotations

from math import ceil
from typing import Tuple

import numpy as np

__all__ = ["load_image", "resize_to_multiple_of_64", "pad_to_multiple_of_64",
           "unpad", "preprocess_pair", "PREPROC_PRESETS"]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

PREPROC_PRESETS = ("bgr_unit", "rgb_imagenet", "rgb_unit")


def load_image(path: str) -> np.ndarray:
    """Read an image file → (H, W, 3) uint8 RGB (alpha dropped, like
    ``script_pwc.py:43-44``)."""
    try:
        import imageio.v2 as imageio
        img = np.asarray(imageio.imread(path))
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


def resize_to_multiple_of_64(img: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """cv2-bilinear resize up to ceil(/64)*64 (``script_pwc.py:47-54``).

    Returns (resized, H_orig, W_orig)."""
    h, w = img.shape[:2]
    h64 = int(ceil(h / 64.0) * 64)
    w64 = int(ceil(w / 64.0) * 64)
    if (h64, w64) == (h, w):
        return img, h, w
    import cv2
    return cv2.resize(img, (w64, h64)), h, w


def pad_to_multiple_of_64(img: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Replicate-pad bottom/right to /64 (``inference_kitti.py:53-63``).

    img: (..., H, W, C).  Returns (padded, pad_h, pad_w)."""
    h, w = img.shape[-3], img.shape[-2]
    pad_h = (64 - h % 64) % 64
    pad_w = (64 - w % 64) % 64
    if pad_h or pad_w:
        pads = [(0, 0)] * (img.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
        img = np.pad(img, pads, mode="edge")
    return img, pad_h, pad_w


def unpad(x: np.ndarray, pad_h: int, pad_w: int) -> np.ndarray:
    """Strip bottom/right padding from (..., H, W, C)."""
    if pad_h:
        x = x[..., :-pad_h, :, :]
    if pad_w:
        x = x[..., :, :-pad_w, :]
    return x


def preprocess_pair(im1: np.ndarray, im2: np.ndarray,
                    preset: str = "bgr_unit") -> np.ndarray:
    """uint8 RGB pair → (1, H, W, 6) float32 network input.

    ``bgr_unit`` reproduces the canonical CLI preprocessing exactly
    (``script_pwc.py:56-58``: RGB→BGR flip then /255, nothing else).
    """
    def one(im):
        im = im.astype(np.float32)
        if preset == "bgr_unit":
            return im[..., ::-1] / 255.0
        if preset == "rgb_unit":
            return im / 255.0
        if preset == "rgb_imagenet":
            return (im / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
        raise ValueError(f"unknown preprocessing preset {preset!r}; "
                         f"choose from {PREPROC_PRESETS}")

    x = np.concatenate([one(im1), one(im2)], axis=-1)
    return x[None].astype(np.float32)
