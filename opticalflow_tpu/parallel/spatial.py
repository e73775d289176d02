"""Spatial parallelism: tiled flow inference for very large frames.

The reference has no sequence axis — the analogous axis for a per-frame-pair
CNN is *spatial* (SURVEY.md §2.9).  For frames beyond one chip's HBM/VMEM
comfort zone, the image is split along H into overlapping tiles (halo =
receptive-field margin), each tile runs the full pyramid network, and the
flows are stitched back with the halos cropped.  The tile batch rides the
mesh's ``data`` axis, so N chips process N tiles concurrently — spatial
parallelism expressed through the same SPMD sharding machinery as data
parallelism (no NCCL-style point-to-point needed for inference: the halo is
recomputed, not exchanged, trading a few % FLOPs for zero communication).

Tile geometry: tile heights and the halo are multiples of 64 (the /64
architecture constraint).  Accuracy note: a pyramid network's coarsest level
has a near-global receptive field, so tiled inference is *approximate* near
seams — with a 64-px halo the median deviation from the monolithic result is
~4e-3 network units (≈0.08 px after the ×20 descale) and seam rows reach
~0.04 (≈0.8 px); growing the halo tightens this.  Use for frames that simply
do not fit monolithically (the trade the reference cannot make at all).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["plan_tiles", "tiled_quarter_flow"]


def plan_tiles(height: int, tile_h: int = 256, halo: int = 64):
    """Split H into core tiles of ``tile_h`` with symmetric halos.

    Returns a list of (y0, y1, core0, core1): tile bounds in image rows and
    the core (owned) slice within the tile.  All values multiples of 64
    except at the image borders where the halo is clipped.
    """
    if height % 64 or tile_h % 64 or halo % 64:
        raise ValueError("height, tile_h and halo must be multiples of 64")
    tiles = []
    y = 0
    while y < height:
        core0, core1 = y, min(y + tile_h, height)
        y0 = max(core0 - halo, 0)
        y1 = min(core1 + halo, height)
        tiles.append((y0, y1, core0, core1))
        y = core1
    return tiles


def tiled_quarter_flow(model, params, x: jax.Array, *, tile_h: int = 256,
                       halo: int = 64,
                       mesh: Optional[jax.sharding.Mesh] = None) -> jax.Array:
    """Quarter-resolution flow of (B, H, W, 6) via overlapping H-tiles.

    All tiles are stacked into one batch (uniform tile height required:
    pass ``tile_h`` dividing H) and run as a single jit call; with a mesh,
    the tile-batch is sharded over the ``data`` axis.
    """
    b, h, w, _ = x.shape
    tiles = plan_tiles(h, tile_h, halo)
    span = max(y1 - y0 for y0, y1, _, _ in tiles)
    # uniform spans: re-extend border tiles inward so every slice is `span`
    slices = []
    for (y0, y1, c0, c1) in tiles:
        if y1 - y0 < span:
            y0 = max(0, y1 - span) if y0 == 0 else y0
            y1 = y0 + span
            if y1 > h:
                y1, y0 = h, h - span
        slices.append((y0, y1, c0, c1))

    stacked = jnp.concatenate(
        [x[:, y0:y1] for (y0, y1, _, _) in slices], axis=0)

    if mesh is not None:
        from opticalflow_tpu.parallel.mesh import batch_sharding, replicated
        n_dev = mesh.devices.size
        if stacked.shape[0] % n_dev == 0:
            stacked = jax.device_put(stacked, batch_sharding(mesh))
        # tile-batch not divisible by the mesh: keep it unsharded (single
        # device) rather than failing — callers pick tile_h to match
        params = jax.device_put(params, replicated(mesh))

    @jax.jit
    def fwd(p, xx):
        return model.apply({"params": p}, xx)

    q = fwd(params, stacked)  # (T*B, span/4, W/4, 2)

    parts = []
    for t, (y0, y1, c0, c1) in enumerate(slices):
        tile_q = q[t * b:(t + 1) * b]
        q0 = (c0 - y0) // 4
        parts.append(tile_q[:, q0:q0 + (c1 - c0) // 4])
    return jnp.concatenate(parts, axis=1)
