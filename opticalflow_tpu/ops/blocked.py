"""Space-to-depth ("blocked") execution of the lane-starved level-1 convs.

The level-1 pyramid trio (conv1a 3→16 stride-2, conv1aa/conv1b 16→16) runs
at the largest spatial extent with only 16 output channels — 16/128 MXU
lanes (PERF.md: ~3 ms of a 35 ms step at B=8).  This module re-expresses
those convs over 2×2 *pixel blocks*: every tensor holds a (H/2, W/2) grid
of blocks with 4× the channels, so the same math runs with 64 output lanes
at a quarter of the spatial positions.  The transforms are exact kernel
re-indexings (no approximation beyond float summation order):

  * stride-2 3×3 conv  →  blocked 5×5 stride-4 conv  (``blocked_s2_kernel``)
  * stride-1 3×3 conv  →  blocked 4×4 stride-2 conv applied to the blocked
    layout = 2×2 *block-window* conv (``blocked_s1_kernel``)
  * the consumer stride-2 conv (conv2a) reads the blocked layout directly
    via a 2×2 block-window kernel (``blocked_consumer_kernel``), so the
    un-blocked (H/2, W/2, 16) tensor never exists.

Used only in ``precision="fast"`` mode — the re-indexing changes float
accumulation order, so the "highest" checkpoint-parity path keeps the
original convs.  Reference semantics unchanged
(``/root/reference/models/PWCNet.py:52-55``, conv+LeakyReLU(0.1)).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["blocked_s2_kernel", "blocked_s1_kernel",
           "blocked_consumer_kernel", "blocked_s2_to_blocked_kernel",
           "to_blocked_bias", "depth_to_space",
           "conv_blocked_s2", "conv_blocked_s1", "conv_blocked_consumer",
           "conv_blocked_s2_to_blocked",
           "space_to_depth_d", "depth_to_space_d"]


def space_to_depth_d(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·d², H/d, W/d, C): split into the d×d dilation
    phases, phases stacked into the batch axis.  A 3×3 conv with dilation d
    and padding d on ``x`` equals a plain 3×3 pad-1 conv on every phase —
    taps at ±d stay within a phase and the d-px zero border maps to the
    phase's 1-px border.  XLA's dilated-conv lowering underutilizes the MXU
    (PERF.md round-2: the context net runs at ~28% of its FLOP bound); the
    phase form runs as an ordinary well-tiled conv."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b * d * d, h // d, w // d, c)


def depth_to_space_d(y: jnp.ndarray, d: int, batch: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_d`."""
    _, h, w, c = y.shape
    y = y.reshape(batch, d, d, h, w, c)
    y = jnp.transpose(y, (0, 3, 1, 4, 2, 5))
    return y.reshape(batch, h * d, w * d, c)


def _np(k):
    return jnp.asarray(k, jnp.float32)


def blocked_s2_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-2 HWIO kernel → 5×5 stride-4 kernel whose Cout is the
    2×2-block expansion (dy, dx, co): output pixel (2y+dy, 2x+dx) reads the
    input window starting at row 4y + 2·dy − 1."""
    k3 = _np(k3)
    ci, co = k3.shape[2], k3.shape[3]
    k5 = jnp.zeros((5, 5, ci, 2, 2, co), jnp.float32)
    for dy in range(2):
        for dx in range(2):
            # offset within the 5×5 window: 2·d + k − 1 + 1(pad origin)
            k5 = k5.at[2 * dy:2 * dy + 3, 2 * dx:2 * dx + 3, :,
                       dy, dx, :].add(k3)
    return k5.reshape(5, 5, ci, 4 * co)


def blocked_s1_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 HWIO kernel (C→C) → 2×2 block-window kernel over the
    blocked layout: (2, 2, 4·Ci, 4·Co).

    Output pixel p_out = 2(y+0)+dy needs input pixels p_out + k − 1 for
    k ∈ {0,1,2}; input pixel 2(y+by)+di contributes when
    2·by + di = dy + k − 1, with block window by ∈ {−1, 0, +1} folded into
    a 2×2 window anchored at (y−1): window index wy = by + 1 ∈ {0,1,2} —
    but only wy ∈ {0,1,2} with taps present collapse to a 3-wide window;
    we build the general 3×3 block window and trim empty planes.
    """
    k3 = _np(k3)
    ci, co = k3.shape[2], k3.shape[3]
    # block window of 3 (by ∈ {-1,0,1}); build then trim
    kb = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), jnp.float32)
    for dy in range(2):            # output intra-block row
        for dx in range(2):
            for ky in range(3):    # original kernel taps
                for kx in range(3):
                    py, px = dy + ky - 1, dx + kx - 1   # input pixel offset
                    by, di = divmod(py, 2)              # floor div/mod
                    bx, dj = divmod(px, 2)
                    kb = kb.at[by + 1, bx + 1, di, dj, :,
                               dy, dx, :].add(k3[ky, kx])
    # taps with py ∈ {-1,0,1,2} live in blocks {-1,0,1}: by=+1 only holds
    # py=2 (dy=1, ky=2) → the window is genuinely 3 blocks wide; keep 3×3.
    return kb.reshape(3, 3, 4 * ci, 4 * co)


def blocked_consumer_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-2 HWIO kernel consuming the blocked layout: output grid ==
    block grid, so it becomes a 2×2 block-window stride-1 conv
    (2, 2, 4·Ci, Co).  Output y reads input pixels 2y−1 … 2y+1 = blocks
    y−1 (intra 1) and y (intra 0, 1)."""
    k3 = _np(k3)
    ci, co = k3.shape[2], k3.shape[3]
    kb = jnp.zeros((2, 2, 2, 2, ci, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            py, px = ky - 1, kx - 1          # input pixel offset from 2y
            by, di = divmod(py, 2)           # block −1 gets intra 1
            bx, dj = divmod(px, 2)
            kb = kb.at[by + 1, bx + 1, di, dj].add(k3[ky, kx])
    return kb.reshape(2, 2, 4 * ci, co)


def blocked_s2_to_blocked_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-2 HWIO kernel consuming AND producing the blocked layout:
    (3, 3, 4·Ci, 4·Co), applied with stride 2 over the input block grid.

    Output block (Y, dy) is conv output pixel q = 2Y + dy, which reads
    input pixels p = 2q + k − 1 = 4Y + (2·dy + k − 1); in blocked input
    coordinates p lives in block 2Y + by with intra di where
    (by, di) = divmod(2·dy + k − 1, 2), by ∈ {−1, 0, 1} — a 3-block
    window anchored at 2Y − 1 (pad (1, 0)), i.e. a 3×3 stride-2 conv over
    the block grid.  Keeps the 2×2-block pipeline unbroken so the
    stride-1 consumers (conv2aa/conv2b) also run with 4× the lanes."""
    k3 = _np(k3)
    ci, co = k3.shape[2], k3.shape[3]
    kb = jnp.zeros((3, 3, 2, 2, ci, 2, 2, co), jnp.float32)
    for dy in range(2):            # output intra-block row
        for dx in range(2):
            for ky in range(3):    # original kernel taps
                for kx in range(3):
                    by, di = divmod(2 * dy + ky - 1, 2)
                    bx, dj = divmod(2 * dx + kx - 1, 2)
                    kb = kb.at[by + 1, bx + 1, di, dj, :,
                               dy, dx, :].add(k3[ky, kx])
    return kb.reshape(3, 3, 4 * ci, 4 * co)


def conv_blocked_s2_to_blocked(x, kb, **kw):
    """Apply a :func:`blocked_s2_to_blocked_kernel` to blocked input
    (B, h, w, 4Ci) → blocked (B, h/2, w/2, 4Co): 3×3 stride-2 block-grid
    conv, window anchored one block up/left (pad (1, 0)).  Requires h, w
    even (original H, W divisible by 8)."""
    return _conv(x, kb, 2, ((1, 0), (1, 0)), **kw)


def to_blocked_bias(b: jnp.ndarray) -> jnp.ndarray:
    """Bias for a blocked conv output: tiled over the 2×2 intra-block."""
    return jnp.tile(jnp.asarray(b), 4)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) blocked → (B, 2H, 2W, C) pixel layout."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def _conv(x, k, stride, pad, precision=None, out_dtype=None):
    import jax
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        preferred_element_type=out_dtype)


def conv_blocked_s2(x, k5, stride4_pad=((1, 0), (1, 0)), **kw):
    """Apply a :func:`blocked_s2_kernel` to pixel-layout input
    (B, H, W, Ci) → blocked (B, H/4, W/4, 4·Co)."""
    return _conv(x, k5, 4, stride4_pad, **kw)


def conv_blocked_s1(x, kb, **kw):
    """Apply a :func:`blocked_s1_kernel` to blocked input
    (B, h, w, 4C) → blocked (B, h, w, 4C).  3×3 block window, pad 1."""
    return _conv(x, kb, 1, ((1, 1), (1, 1)), **kw)


def conv_blocked_consumer(x, kb, **kw):
    """Apply a :func:`blocked_consumer_kernel` to blocked input
    (B, h, w, 4Ci) → pixel-layout (B, h, w, Co) at the consumer's stride-2
    output grid.  2×2 block window anchored one block up/left (pad (1,0))."""
    return _conv(x, kb, 1, ((1, 0), (1, 0)), **kw)
