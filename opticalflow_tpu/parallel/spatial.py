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

__all__ = ["plan_tiles", "tiled_quarter_flow", "halo_exchange_quarter_flow"]


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
        if stacked.shape[0] % n_dev:
            # refusing beats silently running unsharded at 1/n throughput
            raise ValueError(
                f"tile batch {stacked.shape[0]} (= {len(slices)} tiles × "
                f"batch {b}) is not divisible by the {n_dev}-device mesh — "
                f"pick tile_h so tiles×batch is a multiple of {n_dev}, or "
                f"use halo_exchange_quarter_flow (shards H directly)")
        stacked = jax.device_put(stacked, batch_sharding(mesh))
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


def halo_exchange_quarter_flow(model, params, x: jax.Array, *,
                               halo: int = 64,
                               mesh: jax.sharding.Mesh = None,
                               axis_name: Optional[str] = None) -> jax.Array:
    """Quarter-resolution flow with H sharded over the mesh via ``shard_map``
    + ``ppermute`` halo exchange — the SP analogue done with collectives.

    Each device owns a contiguous H-slab of the input (B, H/n, W, 6),
    receives ``halo`` rows from each neighbor over ICI (``lax.ppermute``),
    runs the full network on its extended slab, and keeps the core quarter
    rows; the output sharding stitches the global (B, H/4, W/4, 2) flow.
    Unlike :func:`tiled_quarter_flow` (halo *recompute*, tile batch rides
    the data axis) this exchanges real rows between devices, so the whole
    image is held once across the mesh — the fit-anything path.

    Accuracy: interior seams see real neighbor context (same ~halo-bounded
    approximation as tiled inference: the coarsest pyramid level's receptive
    field exceeds any practical halo).  Image borders are EXACT: each edge
    device slides its compute window so the true border sits at the window
    edge (2·halo rows arrive from its single neighbor instead of halo from
    each side), reproducing the monolithic conv zero-padding there — the
    same trick as :func:`tiled_quarter_flow`'s inward re-extension of border
    tiles.

    Requires ``H % n == 0``, ``(H/n) % 64 == 0``, ``halo % 64 == 0`` and
    ``H/n ≥ 2·halo``.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if mesh is None:
        raise ValueError("halo_exchange_quarter_flow requires a mesh")
    axis = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis]
    b, h, w, c = x.shape
    if h % n or (h // n) % 64 or halo % 64:
        raise ValueError(
            f"H={h} must split into {n} slabs of a /64 height with a /64 "
            f"halo (got slab {h // n if h % n == 0 else 'non-integer'}, "
            f"halo {halo})")
    loc = h // n
    if n == 1:
        # degenerate mesh: the monolithic forward is the exact answer
        return jax.jit(lambda p, xx: model.apply({"params": p}, xx))(
            params, jnp.asarray(x))
    two = 2 * halo
    if loc < two:
        raise ValueError(
            f"slab height {loc} must be ≥ 2·halo = {two} (edge devices "
            f"borrow a double halo from their single neighbor)")

    def local_fn(p, xs):
        # xs: (B, loc, W, 6) — this device's slab
        idx = jax.lax.axis_index(axis)
        # 2·halo-row blocks from each neighbor (edge devices receive zeros
        # on their missing side, never used: the window slides off them)
        from_above = jax.lax.ppermute(
            xs[:, loc - two:], axis, [(i, i + 1) for i in range(n - 1)])
        from_below = jax.lax.ppermute(
            xs[:, :two], axis, [(i + 1, i) for i in range(n - 1)])
        cat = jnp.concatenate([from_above, xs, from_below], axis=1)
        # window of loc+2·halo rows: interior devices center it (halo each
        # side); device 0 starts at its true top border, device n-1 ends at
        # its true bottom border — borders match the monolithic forward
        start = jnp.where(idx == 0, two,
                          jnp.where(idx == n - 1, 0, halo))
        ext = jax.lax.dynamic_slice_in_dim(cat, start, loc + two, axis=1)
        q = model.apply({"params": p}, ext)  # (B, (loc+2·halo)/4, W/4, 2)
        q0 = (two - start) // 4              # xs's origin within the window
        return jax.lax.dynamic_slice_in_dim(q, q0, loc // 4, axis=1)

    fwd = shard_map(local_fn, mesh=mesh,
                    in_specs=(P(), P(None, axis)),
                    out_specs=P(None, axis))
    return jax.jit(fwd)(params, jnp.asarray(x))
