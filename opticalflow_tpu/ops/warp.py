"""Bilinear backward warping with validity mask (TPU-native, NHWC).

Reproduces the reference model's warp exactly (reference:
``models/PWCNet.py:141-177``): the flow is added to an integer mesh grid,
normalized with ``2*p/max(dim-1,1) - 1`` (the align_corners=True convention),
and then sampled by ``torch.nn.functional.grid_sample`` — which under the
torch 2.x runtime the reference ships (Dockerfile torch cu121) defaults to
``align_corners=False`` with zero padding.  The composition of those two
conventions means the *effective* sample location for target position
``p = x + u`` is::

    x_s = p * W / max(W-1, 1) - 0.5        (same for y with H)

Out-of-bounds bilinear corners contribute zero (grid_sample "zeros" padding),
and the validity mask is grid_sample of an all-ones tensor, binarized at a
threshold (0.9999 for the current PWCDCNet, 0.999 for the _old variant —
reference ``models/PWCNet.py:174`` vs ``:401``).

Everything here is pure ``jax.numpy`` / gathers: it traces into a single XLA
program, differentiates with standard AD, and shards trivially over the batch
axis (no cross-example communication).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bilinear_warp", "grid_sample", "warp_with_mask"]


def _effective_coords(flow: jax.Array, height: int, width: int):
    """Map flow (u, v) to effective grid_sample pixel coordinates (x_s, y_s)."""
    u = flow[..., 0]
    v = flow[..., 1]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    px = xx + u
    py = yy + v
    # align_corners=True normalization followed by align_corners=False
    # unnormalization (see module docstring).
    xs = px * (width / max(width - 1, 1)) - 0.5
    ys = py * (height / max(height - 1, 1)) - 0.5
    return xs, ys


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] for per-pixel integer index maps.

    img: (B, H, W, C); iy/ix: (B, Ho, Wo) int32 already clipped in-range.
    Returns (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = (iy * w + ix).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


def grid_sample(img: jax.Array, xs: jax.Array, ys: jax.Array,
                compute_mask: bool = False, padding: str = "zeros"):
    """Bilinear sample ``img`` at pixel coords (xs, ys).

    Matches ``torch.nn.functional.grid_sample(..., mode='bilinear')`` once
    coordinates are in pixel space.  img: (B, H, W, C); xs/ys: (B, Ho, Wo).
    ``padding``: "zeros" (out-of-bounds corners contribute 0) or "border"
    (coordinates clamped to the image rectangle).

    When ``compute_mask`` is true, also returns the sampled all-ones map
    (the sum of in-bounds bilinear weights), used for validity masking.
    """
    _, h, w, _ = img.shape
    if padding == "border":
        xs = jnp.clip(xs, 0.0, float(w - 1))
        ys = jnp.clip(ys, 0.0, float(h - 1))
    elif padding != "zeros":
        raise ValueError(f"padding must be 'zeros' or 'border', got {padding!r}")
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    out = None
    ones_acc = None
    for yi, xi, wgt in (
        (y0, x0, (1.0 - wy) * (1.0 - wx)),
        (y0, x1, (1.0 - wy) * wx),
        (y1, x0, wy * (1.0 - wx)),
        (y1, x1, wy * wx),
    ):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        wv = wgt * valid.astype(wgt.dtype)
        ic = jnp.clip(xi, 0, w - 1)
        jc = jnp.clip(yi, 0, h - 1)
        contrib = _gather_2d(img, jc, ic) * wv[..., None]
        out = contrib if out is None else out + contrib
        if compute_mask:
            ones_acc = wv if ones_acc is None else ones_acc + wv

    if compute_mask:
        return out, ones_acc
    return out


@functools.partial(jax.jit, static_argnames=("mask_threshold",))
def warp_with_mask(x: jax.Array, flow: jax.Array,
                   mask_threshold: float = 0.9999):
    """Backward-warp ``x`` by ``flow`` and zero out invalid samples.

    x: (B, H, W, C) features of image 2; flow: (B, H, W, 2) as (u, v) in
    pixels at this resolution.  Returns warped features with the binary
    validity mask applied, exactly as the reference model's ``warp``
    (``models/PWCNet.py:141-177``).
    """
    _, h, w, _ = x.shape
    xs, ys = _effective_coords(flow.astype(jnp.float32), h, w)
    out, ones = grid_sample(x, xs, ys, compute_mask=True)
    # reference: mask[mask < thr] = 0; mask[mask > 0] = 1
    mask = (ones >= mask_threshold).astype(out.dtype)
    return out * mask[..., None]


def bilinear_warp(x: jax.Array, flow: jax.Array,
                  padding: str = "zeros") -> jax.Array:
    """Mask-free bilinear warp, used by the photometric losses.

    Matches the training-code warps that call grid_sample with
    ``align_corners=True``: there the normalization and sampling conventions
    agree, so the effective sample point is exactly ``p = x + u``.  The
    supervised regularizers use zeros padding (reference ``train2.py:44-61``);
    the self-supervised proxy loss uses border padding
    (``train_pseudo.py:128-164``) — select via ``padding``.
    """
    _, h, w, _ = x.shape
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + u
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + v
    return grid_sample(x, xs, ys, padding=padding)
