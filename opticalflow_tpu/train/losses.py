"""Training losses for all four reference regimes (SURVEY.md §2.5), NHWC/JAX.

  * masked Charbonnier EPE — supervised fine-tune at full resolution
    (reference ``train.py:31-48``);
  * multiscale supervised loss with per-level GT downsampling + vector
    rescale, weights [0.32, 0.08, 0.02, 0.01, 0.005], optional photometric +
    edge-aware smoothness regularizers (``train2.py:124-167``);
  * proxy-label self-supervised loss = 0.85·SSIM + 0.15·L1 photometric
    (border-padded align_corners=True warp) + 0.1 first-order smoothness
    (``train_pseudo.py:65-164``);
  * the epipolar-filtered variants add per-pixel masks / Sampson penalties on
    top (see ``opticalflow_tpu.geometry.epipolar``).

All functions are pure and jit/grad/vmap-compatible; flows and images are
channel-last ((..., H, W, 2) / (..., H, W, 3)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops.resize import resize_bilinear, resize_nearest
from opticalflow_tpu.ops.warp import bilinear_warp

__all__ = ["charbonnier_epe", "multiscale_supervised_loss", "ssim",
           "photometric_l1", "proxy_photometric_loss", "smoothness_first_order",
           "edge_aware_smoothness", "proxy_label_loss", "epe_loss",
           "MULTISCALE_WEIGHTS"]

MULTISCALE_WEIGHTS = (0.32, 0.08, 0.02, 0.01, 0.005)


def charbonnier_epe(pred: jax.Array, gt: jax.Array,
                    valid: Optional[jax.Array] = None,
                    eps: float = 1e-3) -> jax.Array:
    """Masked Charbonnier endpoint error: mean over valid pixels of
    sqrt(‖pred−gt‖² + eps²)."""
    e = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1) + eps * eps)
    if valid is None:
        return jnp.mean(e)
    v = (valid > 0.5).astype(e.dtype)
    return jnp.sum(e * v) / jnp.maximum(jnp.sum(v), 1.0)


def epe_loss(pred: jax.Array, gt: jax.Array,
             valid: Optional[jax.Array] = None) -> jax.Array:
    """Plain mean EPE (the train-time metric, ``train2.py:100-112``)."""
    e = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))
    if valid is None:
        return jnp.mean(e)
    v = valid.astype(e.dtype)
    return jnp.sum(e * v) / (jnp.sum(v) + 1e-8)


def smoothness_first_order(flow: jax.Array) -> jax.Array:
    """mean |∂u/∂x| + mean |∂u/∂y| over both flow channels."""
    dx = jnp.abs(flow[..., :, :-1, :] - flow[..., :, 1:, :])
    dy = jnp.abs(flow[..., :-1, :, :] - flow[..., 1:, :, :])
    return jnp.mean(dx) + jnp.mean(dy)


def edge_aware_smoothness(flow: jax.Array, image: jax.Array) -> jax.Array:
    """First-order smoothness weighted by exp(−|∇image|)
    (``train2.py:80-97``)."""
    fdx = jnp.abs(flow[..., :, :-1, :] - flow[..., :, 1:, :])
    fdy = jnp.abs(flow[..., :-1, :, :] - flow[..., 1:, :, :])
    idx = jnp.mean(jnp.abs(image[..., :, :-1, :] - image[..., :, 1:, :]),
                   axis=-1, keepdims=True)
    idy = jnp.mean(jnp.abs(image[..., :-1, :, :] - image[..., 1:, :, :]),
                   axis=-1, keepdims=True)
    return jnp.mean(fdx * jnp.exp(-idx)) + jnp.mean(fdy * jnp.exp(-idy))


def photometric_l1(im1: jax.Array, im2_warped: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """L1 photometric loss, optionally masked ((..., H, W) mask)."""
    diff = jnp.abs(im1 - im2_warped)
    if mask is None:
        return jnp.mean(diff)
    m = mask[..., None]
    return jnp.sum(diff * m) / (jnp.sum(mask) * im1.shape[-1] + 1e-8)


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3×3 stride-1 average pool with zero padding counted in the mean
    (torch ``avg_pool2d(k=3, s=1, p=1)`` default count_include_pad=True,
    as used by the reference SSIM, ``train_pseudo.py:87-99``)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def ssim(x: jax.Array, y: jax.Array,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """SSIM-based loss term: mean of clamp((1 − SSIM)/2, 0, 1)."""
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sig_x = _avg_pool3(x * x) - mu_x ** 2
    sig_y = _avg_pool3(y * y) - mu_y ** 2
    sig_xy = _avg_pool3(x * y) - mu_x * mu_y
    s = ((2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(jnp.clip((1.0 - s) / 2.0, 0.0, 1.0))


def proxy_photometric_loss(im1: jax.Array, im2_warped: jax.Array) -> jax.Array:
    """0.85·SSIM + 0.15·L1 (``train_pseudo.py:77-85``)."""
    return 0.85 * ssim(im1, im2_warped) + 0.15 * jnp.mean(
        jnp.abs(im2_warped - im1))


def _flow_to_image_res(flow: jax.Array, height: int, width: int) -> jax.Array:
    """align_corners=True upsample + vector rescale
    (``train_pseudo.py:195-208``)."""
    h, w = flow.shape[-3], flow.shape[-2]
    if (h, w) == (height, width):
        return flow
    up = resize_bilinear(flow, height, width, align_corners=True)
    return up * jnp.array([width / float(w), height / float(h)], up.dtype)


def proxy_label_loss(flow: jax.Array, im1: jax.Array, im2: jax.Array,
                     alpha_photo: float = 1.0, alpha_smooth: float = 0.1,
                     photo_mask: Optional[jax.Array] = None):
    """Self-supervised proxy-label loss (``train_pseudo.py:65-164``).

    flow may be at reduced resolution — it is upsampled to the image size
    with vector rescale; im2 is backward-warped with border padding and
    align_corners=True semantics.  ``photo_mask`` (optional, (..., H, W))
    restricts the photometric term — the hook the epipolar-filtered regime
    uses (``train_fundamental.py:102-163``).

    Returns (total, photometric, smoothness).
    """
    h, w = im1.shape[-3], im1.shape[-2]
    flow_full = _flow_to_image_res(flow, h, w)
    im2_warped = bilinear_warp(im2, flow_full, padding="border")
    if photo_mask is None:
        photo = proxy_photometric_loss(im1, im2_warped)
    else:
        m = photo_mask[..., None]
        denom = jnp.sum(photo_mask) * im1.shape[-1] + 1e-8
        l1 = jnp.sum(jnp.abs(im2_warped - im1) * m) / denom
        # masked SSIM: weight the per-pixel SSIM map before reduction
        mu_x, mu_y = _avg_pool3(im1), _avg_pool3(im2_warped)
        sig_x = _avg_pool3(im1 * im1) - mu_x ** 2
        sig_y = _avg_pool3(im2_warped * im2_warped) - mu_y ** 2
        sig_xy = _avg_pool3(im1 * im2_warped) - mu_x * mu_y
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        smap = ((2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2))
        smap = jnp.clip((1.0 - smap) / 2.0, 0.0, 1.0)
        ssim_v = jnp.sum(smap * m) / denom
        photo = 0.85 * ssim_v + 0.15 * l1
    smooth = smoothness_first_order(flow_full)
    total = alpha_photo * photo + alpha_smooth * smooth
    return total, photo, smooth


def multiscale_supervised_loss(
        flow_preds: Sequence[jax.Array], gt_flow: jax.Array,
        valid: jax.Array, *, weights: Sequence[float] = MULTISCALE_WEIGHTS,
        images: Optional[jax.Array] = None, lambda_photo: float = 0.0,
        lambda_smooth: float = 0.0) -> jax.Array:
    """Supervised multiscale loss (``train2.py:124-167``).

    flow_preds: (flow2..flow6) finest-first, each (..., h, w, 2) in the
    network's own units; gt_flow (..., H, W, 2) full-res pixels; valid
    (..., H, W).  GT is bilinearly downsampled to each prediction's size with
    vector division by the scale factor; masks use torch-style nearest.
    """
    bh, bw = gt_flow.shape[-3], gt_flow.shape[-2]
    total = 0.0
    for i, pred in enumerate(flow_preds):
        h, w = pred.shape[-3], pred.shape[-2]
        gt_s = resize_bilinear(gt_flow, h, w, align_corners=False)
        gt_s = gt_s * jnp.array([w / float(bw), h / float(bh)], gt_s.dtype)
        mask_s = resize_nearest(valid[..., None].astype(jnp.float32),
                                h, w)[..., 0]
        lvl = charbonnier_epe(pred, gt_s, mask_s)
        if images is not None and (lambda_photo > 0.0 or lambda_smooth > 0.0):
            im1_s = resize_bilinear(images[..., :3], h, w)
            im2_s = resize_bilinear(images[..., 3:], h, w)
            if lambda_photo > 0.0:
                warped = bilinear_warp(im2_s, pred)
                lvl = lvl + lambda_photo * photometric_l1(im1_s, warped, mask_s)
            if lambda_smooth > 0.0:
                lvl = lvl + lambda_smooth * edge_aware_smoothness(pred, im1_s)
        wi = weights[i] if i < len(weights) else weights[-1]
        total = total + wi * lvl
    return total
