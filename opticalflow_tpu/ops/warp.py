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


def grid_sample(img: jax.Array, xs: jax.Array, ys: jax.Array,
                compute_mask: bool = False, padding: str = "zeros"):
    """Bilinear sample ``img`` at pixel coords (xs, ys).

    Matches ``torch.nn.functional.grid_sample(..., mode='bilinear')`` once
    coordinates are in pixel space.  img: (B, H, W, C); xs/ys: (B, Ho, Wo).
    ``padding``: "zeros" (out-of-bounds corners contribute 0) or "border"
    (coordinates clamped to the image rectangle).

    When ``compute_mask`` is true, also returns the sampled all-ones map
    (the sum of in-bounds bilinear weights), used for validity masking.

    TPU note: implemented as ONE row-gather of packed 2×2 neighborhoods
    (4C channels from a 1-px zero-padded image) instead of four separate
    gathers — TPU gathers are per-row-throughput-limited, so this is ~4×
    cheaper where the XLA profile showed them dominating (~25% of the
    forward).  Out-of-range corners get zero *weight*, so packed values are
    only required to be exact for in-range corners (they are: a base index
    in [-1, dim-1] maps unclipped into the padded array).
    """
    b, h, w, c = img.shape
    if padding == "border":
        xs = jnp.clip(xs, 0.0, float(w - 1))
        ys = jnp.clip(ys, 0.0, float(h - 1))
    elif padding != "zeros":
        raise ValueError(f"padding must be 'zeros' or 'border', got {padding!r}")
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    # weights stay float32 regardless of img dtype: the 0.9999 validity
    # threshold on their sum is far below bf16 resolution
    wx = (xs - x0).astype(jnp.float32)
    wy = (ys - y0).astype(jnp.float32)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # packed neighborhoods over the 1-px zero-padded image:
    # z[py, px] = [p(py,px), p(py,px+1), p(py+1,px), p(py+1,px+1)]
    pimg = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jnp.concatenate([
        pimg[:, :-1, :-1], pimg[:, :-1, 1:],
        pimg[:, 1:, :-1], pimg[:, 1:, 1:]], axis=-1)  # (B, H+1, W+1, 4C)
    zb = jnp.clip(y0 + 1, 0, h)
    za = jnp.clip(x0 + 1, 0, w)
    idx = (zb * (w + 1) + za).reshape(b, -1, 1)
    corners = jnp.take_along_axis(
        z.reshape(b, (h + 1) * (w + 1), 4 * c), idx, axis=1)
    corners = corners.reshape(b, xs.shape[1], xs.shape[2], 4, c)

    weights = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                         wy * (1 - wx), wy * wx], axis=-1)
    valid = jnp.stack([
        (x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1),
        (x0 >= -1) & (x0 <= w - 2) & (y0 >= 0) & (y0 <= h - 1),
        (x0 >= 0) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 2),
        (x0 >= -1) & (x0 <= w - 2) & (y0 >= -1) & (y0 <= h - 2),
    ], axis=-1)
    wv = weights * valid.astype(weights.dtype)
    out = jnp.einsum("bhwk,bhwkc->bhwc", wv, corners)
    if compute_mask:
        return out, jnp.sum(wv, axis=-1)
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
