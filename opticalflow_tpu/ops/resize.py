"""Bilinear resizing of images and flow fields (in-jit, TPU-friendly).

Replaces the reference's host-side ``cv2.resize`` / ``F.interpolate`` calls
with traced XLA ops so pre/postprocess live in the same compiled program as
the network.  Two interpolation conventions exist in the reference and both
matter for parity:

  * half-pixel (``align_corners=False``) — ``F.interpolate`` in
    ``upsample_flow_to`` (``data_processing_or.py:300-310``) and cv2.resize
    in the canonical CLI (``script_pwc.py:76-81``);
  * ``align_corners=True`` — ``flow_resize`` in ``inference_kitti.py:83-91``
    and the loss-side resizes (``train2.py:129-141``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear", "upsample_flow_to", "flow_resize",
           "upsample_flow_2x"]


def _ac_true_1d(x: jax.Array, new_size: int, axis: int) -> jax.Array:
    """align_corners=True bilinear resize along one axis."""
    old = x.shape[axis]
    if old == new_size:
        return x
    if old == 1:
        return jnp.repeat(x, new_size, axis=axis)
    pos = jnp.arange(new_size, dtype=jnp.float32) * ((old - 1) / (new_size - 1))
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, old - 2)
    frac = pos - i0.astype(jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = new_size
    frac = frac.reshape(shape)
    return a * (1.0 - frac) + b * frac


def _half_pixel_1d(x: jax.Array, new_size: int, axis: int) -> jax.Array:
    """align_corners=False (half-pixel) bilinear resize along one axis,
    *without* antialiasing — matching torch ``F.interpolate`` and
    ``cv2.resize(INTER_LINEAR)`` for both up- and downsampling (NB:
    ``jax.image.resize`` antialiases on downsample, which torch does not)."""
    old = x.shape[axis]
    if old == new_size:
        return x
    pos = (jnp.arange(new_size, dtype=jnp.float32) + 0.5) * (old / new_size) - 0.5
    pos = jnp.clip(pos, 0.0, float(old - 1))
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(old - 2, 0))
    frac = pos - i0.astype(jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, jnp.minimum(i0 + 1, old - 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = new_size
    frac = frac.reshape(shape)
    return a * (1.0 - frac) + b * frac


@functools.partial(jax.jit, static_argnames=("height", "width", "align_corners"))
def resize_bilinear(x: jax.Array, height: int, width: int,
                    align_corners: bool = False) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (height, width)."""
    if x.shape[-3] == height and x.shape[-2] == width:
        return x
    fn = _ac_true_1d if align_corners else _half_pixel_1d
    x = fn(x, height, x.ndim - 3)
    return fn(x, width, x.ndim - 2)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def upsample_flow_to(flow: jax.Array, height: int, width: int) -> jax.Array:
    """Upsample (..., h, w, 2) flow and rescale vectors (half-pixel conv.),
    cloning ``data_processing_or.py:300-310``."""
    h, w = flow.shape[-3], flow.shape[-2]
    out = resize_bilinear(flow, height, width, align_corners=False)
    scale = jnp.array([width / float(w), height / float(h)], out.dtype)
    return out * scale


@functools.partial(jax.jit, static_argnames=("height", "width"))
def flow_resize(flow: jax.Array, height: int, width: int) -> jax.Array:
    """Resize flow with align_corners=True + vector rescale, cloning
    ``inference_kitti.py:83-91``."""
    h, w = flow.shape[-3], flow.shape[-2]
    if (h, w) == (height, width):
        return flow
    out = resize_bilinear(flow, height, width, align_corners=True)
    scale = jnp.array([width / float(w), height / float(h)], out.dtype)
    return out * scale


@functools.partial(jax.jit, static_argnames=("height", "width"))
def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize of (..., H, W, C) with torch's asymmetric
    index rule ``src = floor(dst * in/out)`` (``F.interpolate(mode='nearest')``,
    used for validity masks in the multiscale loss, ``train2.py:135``)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (height, width):
        return x
    iy = jnp.floor(jnp.arange(height, dtype=jnp.float32)
                   * (h / height)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(width, dtype=jnp.float32)
                   * (w / width)).astype(jnp.int32)
    x = jnp.take(x, jnp.clip(iy, 0, h - 1), axis=-3)
    return jnp.take(x, jnp.clip(ix, 0, w - 1), axis=-2)


def upsample_flow_2x(flow: jax.Array) -> jax.Array:
    """2× flow upsampling with vector doubling (multiscale-loss helper)."""
    h, w = flow.shape[-3], flow.shape[-2]
    return upsample_flow_to(flow, 2 * h, 2 * w)
