"""No-ground-truth validation metrics for self-supervised training.

Clones the proxy-quality signals of the reference
(``train_pseudo.py:177-233``, ``train_fundamental.py:503-536``):

  * photometric error of the warped pair;
  * forward–backward cycle consistency: ‖flow12 + warp(flow21, flow12)‖;
  * out-of-bounds ratio: fraction of sample points leaving the frame.

All jitted, batched, NHWC.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops.warp import bilinear_warp
from opticalflow_tpu.train.losses import proxy_photometric_loss, _flow_to_image_res

__all__ = ["selfsup_metrics"]


def _finest_full(flow, h, w):
    return _flow_to_image_res(flow, h, w)


def selfsup_metrics(model, params, images: jax.Array,
                    flow_scale: float = 1.0) -> Dict[str, jax.Array]:
    """images: (B, H, W, 6).  Runs the model on both frame orders."""
    im1, im2 = images[..., :3], images[..., 3:]
    h, w = im1.shape[-3], im1.shape[-2]

    flow12 = model.apply({"params": params}, images) * flow_scale
    rev = jnp.concatenate([im2, im1], axis=-1)
    flow21 = model.apply({"params": params}, rev) * flow_scale

    f12 = _finest_full(flow12, h, w)
    f21 = _finest_full(flow21, h, w)

    warped2 = bilinear_warp(im2, f12, padding="border")
    photo = proxy_photometric_loss(im1, warped2)

    # cycle: backward flow sampled at the forward-displaced positions should
    # cancel the forward flow (train_pseudo.py:177-193)
    f21_warped = bilinear_warp(f21, f12, padding="border")
    cycle = jnp.mean(jnp.abs(f12 + f21_warped))

    # out-of-bounds ratio of forward sample points (train_pseudo.py:209-233)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + f12[..., 0]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + f12[..., 1]
    oob = ((xs < 0) | (xs > w - 1) | (ys < 0) | (ys > h - 1))
    return {"photometric": photo, "fb_cycle": cycle,
            "oob_ratio": jnp.mean(oob.astype(jnp.float32))}
