"""Pallas TPU kernel for the context network's dilated 3×3 convolutions.

The reference's context net is seven dilated convs (dilation 1,2,4,8,16,1 —
``models/PWCNet.py:126-132``).  XLA's dilated-conv lowering runs at ~15% of
the bf16 MXU bound at the level-2 grid (device profile: the 128→128
dilated convs cost ~6.5 ms each at B=32 vs a ~0.7 ms FLOP bound — PERF.md
round-2 log).  The space-to-depth rewrite (``ops/blocked.space_to_depth_d``)
was measured neutral: its two full-tensor transposes cost what the
better-tiled conv saves.

This kernel instead computes the dilated conv directly, exploiting that all
nine taps are *static* offsets (no gathers):

  * the d-padded input stays in HBM; each (batch, row-tile) grid step DMAs
    its (th + 2d)-row halo window into VMEM (same windowed-DMA pattern as
    ``pallas_corr``) — overlapping halos that BlockSpecs cannot express;
  * for each tap (ky, kx): one MXU matmul contracts the channel dim of the
    ky-shifted row slab against the (C, Co) weight slice, and the result is
    accumulated into the output tile at a static kx·d column offset (a
    sublane shift — vector work, no copies through HBM);
  * accumulation is float32 for the whole tile; the output is written once.

HBM traffic is read-x-once + write-out-once (the XLA lowering's im2col-ish
form re-reads activations per tap); MXU work is nine well-shaped
(rows × C) @ (C, Co) matmuls.

The op is linear (bias/LeakyReLU stay outside, where XLA fuses them into
the next elementwise pass), wrapped in ``jax.custom_vjp``:

    dx = conv_d(g, rot180(w) with in/out channels swapped)   # same kernel
    dw[ky,kx] = Σ_{b,y,x} x_pad[y+ky·d, x+kx·d, :] ⊗ g[y,x,:]  # 9 einsums
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dilated_supported", "conv_dilated3x3", "conv_dilated3x3_act"]

_VMEM_BUDGET = 12 * 1024 * 1024


def _row_tile(h: int, w: int, c: int, co: int, d: int,
              itemsize: int) -> int | None:
    """Largest row tile dividing ``h`` whose working set fits VMEM."""
    w2 = w + 2 * d
    wl = -(-w2 // 8) * 8          # sublane rounding of the window width
    cl = -(-max(c, co) // 128) * 128

    def fits(th):
        winb = (th + 2 * d) * wl * cl * itemsize   # DMA'd input window
        mb = th * wl * cl * 4                      # one tap's matmul result
        accb = th * (-(-w // 8) * 8) * cl * 4      # f32 accumulator
        return winb + mb + accb <= _VMEM_BUDGET

    for th in (64, 56, 48, 32, 28, 16, 14, 8, 7, 4):
        if h % th == 0 and fits(th):
            return th
    return h if fits(h) else None


def dilated_supported(x: jax.Array, d: int, co: int = 0) -> bool:
    """Pallas path availability: TPU backend + a workable row tiling.

    ``co`` is the output channel count (defaults to the input's, which is
    correct for every context-net conv today) — probing with the real value
    keeps this gate in sync with ``_dilated_impl``'s tile search, which
    otherwise raises at trace time instead of falling back (ADVICE round 2).
    """
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    _, h, w, c = x.shape
    return _row_tile(h, w, c, co or c, d, x.dtype.itemsize) is not None


def _kernel(d, th, w, co, epilogue, x_hbm, w_ref, b_ref, out_ref,
            win_ref, sem):
    """One (batch, row-tile) grid step: DMA the halo window, then nine
    shifted matmuls accumulated in float32; optional fused bias+LeakyReLU
    epilogue (a separate XLA elementwise pass costs ~0.7 ms per conv at
    B=32 — PERF.md round-2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(i * th, th + 2 * d)], win_ref, sem)
    cp.start()
    cp.wait()

    acc = jnp.zeros((th, w, co), jnp.float32)
    for ky in range(3):
        slab = win_ref[pl.ds(ky * d, th)]           # (th, w+2d, C)
        for kx in range(3):
            m = jax.lax.dot_general(
                slab, w_ref[ky, kx],                # (C, Co)
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (th, w+2d, Co)
            acc = acc + m[:, kx * d:kx * d + w, :]
    if epilogue:
        acc = acc + b_ref[0]
        acc = jnp.maximum(acc, 0.1 * acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_dilated3x3(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """Dilated 3×3 conv, stride 1, zero padding ``d`` (same-size output).

    x: (B, H, W, C); w: (3, 3, C, Co).  Linear — no bias, no activation.
    Output dtype matches ``x`` (float32 accumulation in-kernel).
    """
    return _dilated_impl(x, w, d)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _dilated_impl(x: jax.Array, w: jax.Array, d: int,
                  interpret: bool = False,
                  epilogue: bool = False,
                  bias: jax.Array | None = None) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wdt, c = x.shape
    co = w.shape[-1]
    th = _row_tile(h, wdt, c, co, d, x.dtype.itemsize)
    if th is None:
        raise ValueError(f"no VMEM-feasible row tile for shape {x.shape}, "
                         f"dilation {d}")
    # Mosaic memref slices need 8-aligned sublane extents and 128-aligned
    # lane extents: round the padded width up to a multiple of 8 and the
    # channel dim up to a multiple of 128 (extra zero columns are never
    # read; extra zero channels contract against zero-padded weights).
    w2 = -(-(wdt + 2 * d) // 8) * 8
    c2 = -(-c // 128) * 128
    xp = jnp.pad(x, ((0, 0), (d, d), (d, w2 - wdt - d), (0, c2 - c)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c2 - c), (0, 0)))
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel, d, th, wdt, co, epilogue),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, c2, co), lambda bb, ii: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wdt, co),
                               lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, w2, c2), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wp.astype(x.dtype), bias.astype(jnp.float32).reshape(1, co))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_dilated3x3_act(x: jax.Array, w: jax.Array, b: jax.Array,
                        d: int) -> jax.Array:
    """Dilated 3×3 conv + bias + LeakyReLU(0.1), fused in-kernel.

    The VJP recovers the activation mask from the *output* — LeakyReLU
    preserves sign, so d(pre)/d(out) = [out > 0 ? 1 : 0.1] without storing
    the pre-activation.
    """
    return _dilated_impl(x, w, d, False, True, b)


def _dilated_act_vjp_fwd(x, w, b, d):
    y = _dilated_impl(x, w, d, False, True, b)
    return y, (x, w, y)


def _dilated_act_vjp_bwd(d, res, g):
    x, w, y = res
    gp = jnp.where(y > 0, g.astype(jnp.float32), 0.1 * g.astype(jnp.float32))
    gpd = gp.astype(g.dtype)
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _dilated_impl(gpd, wt.astype(gpd.dtype), d).astype(x.dtype)
    dw = _dilated_dw(d, x, gpd).astype(w.dtype)
    db = jnp.sum(gp, axis=(0, 1, 2))
    return dx, dw, db


conv_dilated3x3_act.defvjp(_dilated_act_vjp_fwd, _dilated_act_vjp_bwd)


def _dilated_vjp_fwd(x, w, d):
    return _dilated_impl(x, w, d), (x, w)


def _dilated_dw(d: int, x: jax.Array, g: jax.Array) -> jax.Array:
    """Weight gradient: nine slice-einsums, f32 accumulation."""
    b, h, wdt, _ = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for ky in range(3):
        row = []
        for kx in range(3):
            xs = jax.lax.slice(xp, (0, ky * d, kx * d, 0),
                               (b, ky * d + h, kx * d + wdt, xp.shape[-1]))
            row.append(jnp.einsum("bhwc,bhwo->co", xs, gf))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)


def _dilated_vjp_bwd(d, res, g):
    x, w = res
    # dx: same dilated conv of g with the spatially-flipped, channel-swapped
    # kernel (stride 1 makes transposed conv == conv on the padded grad)
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _dilated_impl(g, wt.astype(g.dtype), d).astype(x.dtype)
    return dx, _dilated_dw(d, x, g).astype(w.dtype)


conv_dilated3x3.defvjp(_dilated_vjp_fwd, _dilated_vjp_bwd)
