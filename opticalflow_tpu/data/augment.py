"""Host-side data augmentation for flow training (numpy/cv2).

Two pipelines mirroring the reference's, both driven by an explicit
``numpy.random.Generator`` so every sample is reproducible from (seed, epoch,
index) — the deterministic-resume property the reference lacks (its
augmentations draw from global ``random``/``np.random``, SURVEY.md §5):

  * :func:`reduced_affine` — the KITTI fine-tune augmentation
    (``data_processing_or.py:72-140``): 40% skip, rotation ±2°, isotropic
    zoom 0.95–1.05, anisotropic squeeze 0.97–1.03, reflect-101 border;
    flow vectors transformed by the affine's linear part;
  * :class:`RichAugment` — the PWC-paper pipeline
    (``data_processing.py:136-279``): crop, 50% h-flip with u negation,
    rotation ±17° with vector rotation, translation ±10px, brightness /
    contrast 0.8–1.2, Gaussian blur;
  * :func:`random_crop` / :func:`hflip` shared helpers (30% flip in the
    KITTI set, ``data_processing_or.py:281-287``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["reduced_affine", "RichAugment", "random_crop", "hflip",
           "affine_matrix"]


def affine_matrix(center_xy: Tuple[float, float], rot_deg: float,
                  sx: float, sy: float,
                  translate_xy: Tuple[float, float] = (0.0, 0.0)):
    """2×3 cv2 affine about a center: A = R(θ)·diag(sx, sy); returns (M, A)."""
    cx, cy = center_xy
    th = np.deg2rad(rot_deg)
    c, s = np.cos(th), np.sin(th)
    a = np.array([[sx * c, -sy * s], [sx * s, sy * c]], np.float32)
    t = np.array([cx, cy], np.float32) - a @ np.array([cx, cy], np.float32)
    t = t + np.asarray(translate_xy, np.float32)
    return np.concatenate([a, t[:, None]], axis=1), a


def _warp(img: np.ndarray, m: np.ndarray, size_hw, nearest=False,
          border=None):
    import cv2
    if border is None:
        border = cv2.BORDER_REFLECT_101
    h, w = size_hw
    flags = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.warpAffine(img, m, (w, h), flags=flags, borderMode=border)


def _warp_flow(flow: np.ndarray, m: np.ndarray, a: np.ndarray, size_hw):
    """Resample the flow field and rotate/scale its vectors by A."""
    fu = _warp(flow[..., 0], m, size_hw)
    fv = _warp(flow[..., 1], m, size_hw)
    return np.stack([a[0, 0] * fu + a[0, 1] * fv,
                     a[1, 0] * fu + a[1, 1] * fv], axis=-1).astype(np.float32)


def reduced_affine(im1, im2, flow, valid, rng: np.random.Generator,
                   skip_prob: float = 0.4):
    """Reduced rotation/zoom/squeeze applied identically to frames + flow."""
    if rng.random() < skip_prob:
        return im1, im2, flow, valid
    h, w = im1.shape[:2]
    rot = rng.uniform(-2.0, 2.0)
    zoom = rng.uniform(0.95, 1.05)
    sx = zoom * rng.uniform(0.97, 1.03)
    sy = zoom * rng.uniform(0.97, 1.03)
    m, a = affine_matrix((w * 0.5, h * 0.5), rot, sx, sy)
    im1 = _warp(im1, m, (h, w))
    im2 = _warp(im2, m, (h, w))
    flow = _warp_flow(flow, m, a, (h, w))
    valid = (_warp(valid.astype(np.float32), m, (h, w)) > 0.5)
    return im1, im2, flow, valid


def random_crop(arrays, crop_hw: Tuple[int, int], rng: np.random.Generator):
    """Crop all (H, W, ...) arrays at one random window."""
    h, w = arrays[0].shape[:2]
    ch, cw = crop_hw
    y = 0 if h <= ch else int(rng.integers(0, h - ch + 1))
    x = 0 if w <= cw else int(rng.integers(0, w - cw + 1))
    return [arr[y:y + ch, x:x + cw] for arr in arrays]


def hflip(im1, im2, flow, valid):
    """Horizontal flip with u-component negation."""
    im1 = np.ascontiguousarray(im1[:, ::-1])
    im2 = np.ascontiguousarray(im2[:, ::-1])
    flow = np.ascontiguousarray(flow[:, ::-1])
    flow[..., 0] *= -1.0
    valid = np.ascontiguousarray(valid[:, ::-1])
    return im1, im2, flow, valid


class RichAugment:
    """The PWC-paper augmentation pipeline (``data_processing.py:136-279``).

    Operates on uint8-range float images (0..255) like the reference; each
    transform fires with probability 0.5.
    """

    def __init__(self, crop_hw: Tuple[int, int] = (368, 768),
                 augment: bool = True):
        self.crop_hw = crop_hw
        self.augment = augment

    def __call__(self, im1, im2, flow, valid, rng: np.random.Generator):
        import cv2
        im1, im2, flow, valid = random_crop((im1, im2, flow, valid),
                                            self.crop_hw, rng)
        if not self.augment:
            return im1, im2, flow, valid

        if rng.random() < 0.5:
            im1, im2, flow, valid = hflip(im1, im2, flow, valid)

        if rng.random() < 0.5:  # rotation ±17° with vector rotation
            ang = rng.uniform(-17.0, 17.0)
            h, w = im1.shape[:2]
            m, a = affine_matrix((w // 2, h // 2), ang, 1.0, 1.0)
            im1 = _warp(im1, m, (h, w), border=cv2.BORDER_REFLECT)
            im2 = _warp(im2, m, (h, w), border=cv2.BORDER_REFLECT)
            flow = _warp_flow(flow, m, a, (h, w))
            valid = _warp(valid.astype(np.float32), m, (h, w),
                          border=cv2.BORDER_REFLECT) > 0.5

        if rng.random() < 0.5:  # translation ±10 px (both frames alike)
            tx = int(rng.integers(-10, 11))
            ty = int(rng.integers(-10, 11))
            m = np.float32([[1, 0, tx], [0, 1, ty]])
            h, w = im1.shape[:2]
            im1 = _warp(im1, m, (h, w), border=cv2.BORDER_REFLECT)
            im2 = _warp(im2, m, (h, w), border=cv2.BORDER_REFLECT)
            fu = _warp(flow[..., 0], m, (h, w), border=cv2.BORDER_REFLECT)
            fv = _warp(flow[..., 1], m, (h, w), border=cv2.BORDER_REFLECT)
            flow = np.stack([fu, fv], axis=-1)
            valid = _warp(valid.astype(np.float32), m, (h, w),
                          border=cv2.BORDER_REFLECT) > 0.5

        if rng.random() < 0.5:  # brightness / contrast on 0..255 range
            # bf·cf·(x−127.5)+127.5 collapses both draws into one gain about
            # the center — mathematically a single contrast factor.  That is
            # the REFERENCE's own parameterization, cloned verbatim
            # (data_processing.py:238-250: product of two U(0.8,1.2) draws,
            # whose triangular-ish density differs from one uniform draw),
            # so both RNG draws stay for distribution fidelity.
            bf = rng.uniform(0.8, 1.2)
            cf = rng.uniform(0.8, 1.2)
            im1 = np.clip(bf * cf * (im1 - 127.5) + 127.5, 0, 255)
            im2 = np.clip(bf * cf * (im2 - 127.5) + 127.5, 0, 255)

        if rng.random() < 0.5:  # gaussian blur
            k = int(rng.choice((3, 5)))
            im1 = cv2.GaussianBlur(im1, (k, k), 0)
            im2 = cv2.GaussianBlur(im2, (k, k), 0)

        return im1, im2, flow.astype(np.float32), valid
