"""Fused Pallas kernel: DenseNet flow estimator + its two 3×3 heads.

The level-2 dense block is the hottest region of the forward (PERF.md):
five 3×3 convs whose inputs grow by concatenation 117→245→373→469→533→565
channels at H/4 resolution, then two heads (``predict_flow2`` 565→2 and
``dc_conv1`` 565→128) that re-read the 565-channel tensor.  In XLA each
concat materializes to HBM (≈2185 channel-writes + re-reads per step) and
the 565-ch tensor makes three more HBM trips.  This kernel keeps everything
in VMEM: the input tile is DMA'd once with a 6-row halo, the five conv
outputs live as separate VMEM buffers (concatenation becomes *weight
slicing*: ``conv(concat(a,b), W) = conv(a, W_a) + conv(b, W_b)``), and only
the two head outputs return to HBM.

Layout: each buffer is a flat ``(rows·(W+2), C)`` matrix with C on lanes and
one zero column of padding on each side of W.  A 3×3 conv tap (ky, kx) is
then a single MXU matmul over a *shifted contiguous row window* of the flat
matrix — shift ``ky·(W+2) + kx − 1`` — because the W-wraparound rows land in
the zeroed pad columns.  Nine shifted matmuls per (conv, input piece), f32
accumulation, LeakyReLU(0.1), cast back to the compute dtype.  Buffers carry
an 8-row front pad so the (0,0) tap's −1 shift stays in bounds, and pad
columns / out-of-image halo rows are re-zeroed after each conv (they hold
wraparound garbage and must act as conv zero-padding for the next conv).

Semantics match the reference exactly (``models/PWCNet.py:74-124`` dense
estimator, ``:126`` dc_conv1, ``predict_flow`` at ``:33``); the backward
pass is the VJP of an equivalent lax implementation (``custom_vjp`` — the
kernel is an inference-throughput device, training recomputes in lax).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["fused_dense_heads", "dense_heads_lax", "fused_supported"]

_FRONT = 8          # front-pad rows of every flat buffer (8-aligned)
_LEAKY = 0.1


def _leaky(x):
    return jnp.where(x >= 0, x, _LEAKY * x)


def dense_heads_lax(xin: jax.Array, conv_ws: Sequence[jax.Array],
                    conv_bs: Sequence[jax.Array], head_ws: Sequence[jax.Array],
                    head_bs, head_acts: Tuple[bool, ...]):
    """Reference implementation (and the VJP used for training).

    Matches the kernel's numeric contract: bf16 (or f32) convs with f32
    accumulation, f32 bias add, LeakyReLU(0.1) after each dense conv, heads
    with optional activation.  Dense concat order is the "new" variant's
    ``concat(y, x)`` (``models/PWCNet.py:202-206``).
    """
    from opticalflow_tpu.ops.convops import conv2d

    x = xin
    for w, b in zip(conv_ws, conv_bs):
        y = conv2d(x, w.astype(x.dtype), None, stride=1, padding=1,
                   out_dtype=jnp.float32)
        y = _leaky(y + b.astype(jnp.float32)).astype(x.dtype)
        x = jnp.concatenate((y, x), axis=-1)
    outs = []
    for w, b, act in zip(head_ws, head_bs, head_acts):
        o = conv2d(x, w.astype(x.dtype), None, stride=1, padding=1,
                   out_dtype=jnp.float32)
        if b is not None:
            o = o + b.astype(jnp.float32)
        if act:
            o = _leaky(o)
        outs.append(o.astype(x.dtype))
    return tuple(outs)


def fused_supported(xin: jax.Array, n_convs: int = 5) -> bool:
    """Kernel availability for this input (TPU, tileable rows)."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    _, h, w, _ = xin.shape
    return h % 4 == 0 and w >= 8


def _kernel(md_rows, th, w, c0, widths, head_specs, n_pieces_max,
            xin_hbm, *refs):
    """One (batch, row-tile) grid step.

    refs layout: [w0..w4, wh0.., b_all, out0.., xin_win, y0..y4, sem].
    All conv/head weights ride as whole-array VMEM inputs; feature buffers
    are flat (FRONT + rows·WP, C) VMEM scratch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del n_pieces_max
    n_convs = len(widths)
    n_heads = len(head_specs)
    ws = refs[:n_convs]
    hws = refs[n_convs:n_convs + n_heads]
    b_all = refs[n_convs + n_heads]
    outs = refs[n_convs + n_heads + 1:n_convs + n_heads + 1 + n_heads]
    xin_win = refs[n_convs + n_heads + 1 + n_heads]
    ybufs = refs[n_convs + n_heads + 2 + n_heads:-1]
    sem = refs[-1]

    wp = -(-(w + 2) // 8) * 8           # 8-aligned padded width
    bb = pl.program_id(0)
    ii = pl.program_id(1)

    # DMA this tile's input window (rows + 2·halo, already zero-padded in
    # HBM) into the flat xin buffer
    halo0 = n_convs + 1                 # 6: five convs + one head layer
    rows0 = th + 2 * halo0
    # xin is pre-flattened in HBM to (B, Hp·wp, c0): the row window is a
    # contiguous 2-D slice, matching the flat VMEM buffer directly
    cp = pltpu.make_async_copy(
        xin_hbm.at[bb, pl.ds(ii * th * wp, rows0 * wp)],
        xin_win.at[pl.ds(_FRONT, rows0 * wp)],
        sem)
    cp.start()
    cp.wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0)
    col_ok = (col >= 1) & (col <= w)            # zero the W pad columns

    def conv_from(pieces, rows_out, wref, coff, cout, bias_row, act, out_ref):
        """pieces: list of (buf_ref, ch, dh) — dh = halo_piece − halo_out.

        Alignment scheme: every MXU operand slice starts at a multiple of 8
        (wp and _FRONT are 8-multiples), so Mosaic issues zero-copy matmuls.
        The ±1 kx shifts are applied to the three per-kx PARTIAL outputs
        (one small value-shift each) instead of to every input slice —
        9·pieces misaligned input copies collapse into 2 output shifts.
        """
        m = rows_out * wp
        m2 = m + 16
        acc = bias_row * jnp.ones((m, cout), jnp.float32)
        for kx in range(3):
            p = jnp.zeros((m2, cout), jnp.float32)
            off_k = 0
            for buf, ch, dh in pieces:
                for ky in range(3):
                    base = _FRONT - 8 + (dh - 1 + ky) * wp   # 8-aligned
                    xs = buf[pl.ds(base, m2), :ch]
                    wmat = wref[ky, kx,
                                coff + off_k:coff + off_k + ch, :cout]
                    p += jnp.dot(xs, wmat,
                                 preferred_element_type=jnp.float32)
                off_k += ch
            # y[o] += p_kx[o + kx − 1]; p row r holds o' = r − 8
            acc += jax.lax.slice(p, (7 + kx, 0), (7 + kx + m, cout))
        if act:
            acc = _leaky(acc)
        if out_ref is None:
            return acc
        out_ref[pl.ds(_FRONT, m), :cout] = acc.astype(out_ref.dtype)
        return None

    # ---- dense chain: y_j = leaky(conv(concat(y_{j-1}..y_0, xin))) ----
    # pieces listed in the "new" variant's concat order (newest first)
    halos = [halo0 - 1 - j for j in range(n_convs)]       # 5,4,3,2,1
    pieces = [(xin_win, c0, halo0)]   # (buf, channels, halo of that buf)
    boff = 0
    for j, cj in enumerate(widths):
        rows_j = th + 2 * halos[j]
        plist = [(buf, ch, hp - halos[j]) for (buf, ch, hp) in
                 [(b_, c_, h_) for (b_, c_, h_) in pieces]]
        bias_row = b_all[0, boff:boff + cj].astype(jnp.float32)
        conv_from(plist, rows_j, ws[j], 0, cj, bias_row, True, ybufs[j])
        boff += cj
        # zero pad columns + out-of-image halo rows so downstream convs see
        # true zero padding (matmul wraparound left garbage there)
        row_g = (ii * th - halos[j]
                 + jax.lax.broadcasted_iota(
                     jnp.int32, (rows_j, wp, 1), 0))
        h_img = pl.num_programs(1) * th
        ok = ((row_g >= 0) & (row_g < h_img)
              & col_ok.reshape(1, wp, 1))
        m = rows_j * wp
        buf = ybufs[j][pl.ds(_FRONT, m), :cj].reshape(rows_j, wp, cj)
        # jnp.where, not multiply: the front/tail pad garbage can be NaN
        # (uninitialized scratch) and 0*NaN would keep it alive
        buf = jnp.where(ok, buf, jnp.zeros((), buf.dtype))
        ybufs[j][pl.ds(_FRONT, m), :cj] = buf.reshape(m, cj)
        pieces = [(ybufs[j], cj, halos[j])] + pieces

    # ---- heads over the full feature stack, output rows = th ----
    for k, (cout, act) in enumerate(head_specs):
        plist = [(buf, ch, hp) for (buf, ch, hp) in pieces]  # halo_out = 0
        bias_row = b_all[0, boff:boff + cout].astype(jnp.float32)
        boff += cout
        acc = conv_from(plist, th, hws[k], 0, cout, bias_row, act, None)
        res = acc.reshape(th, wp, cout)[:, 1:w + 1]
        outs[k][0] = res.astype(outs[k].dtype)


def _pick_tile(h: int) -> int:
    for t in (8, 4, 2):
        if h % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnums=(5, 6))
def _fused_impl(xin, conv_ws, conv_bs, head_ws, head_bs, head_acts,
                interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c0 = xin.shape
    widths = tuple(int(wk.shape[-1]) for wk in conv_ws)
    n_convs = len(widths)
    head_specs = tuple((int(wk.shape[-1]), act)
                       for wk, act in zip(head_ws, head_acts))
    th = _pick_tile(h)
    halo0 = n_convs + 1
    wp = -(-(w + 2) // 8) * 8           # 8-aligned padded width

    # pre-pad input: zero halo rows, one zero column each side, and zero
    # channels up to a lane multiple (Mosaic DMA needs the innermost dim
    # 128-aligned); flatten rows×W so the kernel's window DMA is one
    # contiguous 2-D slice
    c0p = -(-c0 // 128) * 128
    xin_p = jnp.pad(xin, ((0, 0), (halo0, halo0), (1, wp - w - 1),
                          (0, c0p - c0)))
    xin_p = xin_p.reshape(b, (h + 2 * halo0) * wp, c0p)

    # biases concatenated into one (1, total) row (f32)
    b_all = jnp.concatenate(
        [jnp.asarray(x, jnp.float32).reshape(-1) for x in conv_bs]
        + [jnp.zeros((c,), jnp.float32) if hb is None
           else jnp.asarray(hb, jnp.float32).reshape(-1)
           for hb, (c, _) in zip(head_bs, head_specs)])[None]

    dt = xin.dtype
    kernel = functools.partial(
        _kernel, halo0, th, w, c0, widths, head_specs, n_convs + 1)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]          # xin (HBM)
    args = [xin_p]
    for wk in conv_ws:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wk.astype(dt))
    for wk in head_ws:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wk.astype(dt))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # biases
    args.append(b_all)

    out_shape = [jax.ShapeDtypeStruct((b, th * (h // th), w, c), dt)
                 for c, _ in head_specs]
    out_specs = [pl.BlockSpec((1, th, w, c), lambda bb, ii: (bb, ii, 0, 0),
                              memory_space=pltpu.VMEM)
                 for c, _ in head_specs]

    # +_FRONT tail: the (kx=2) tap at the last (pad-column) output element
    # reads one element past the data end — garbage that lands in discarded
    # pad columns, but it must stay in bounds
    scratch = [pltpu.VMEM((2 * _FRONT + (th + 2 * halo0) * wp, c0p), dt)]
    for j, cj in enumerate(widths):
        rows_j = th + 2 * (halo0 - 1 - j)
        scratch.append(pltpu.VMEM((2 * _FRONT + rows_j * wp, cj), dt))
    scratch.append(pltpu.SemaphoreType.DMA(()))

    outs = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_dense_heads(xin, conv_ws, conv_bs, head_ws, head_bs,
                      head_acts: Tuple[bool, ...] = (False, True)):
    """Fused dense block + heads.  Returns one output per head.

    Args mirror :func:`dense_heads_lax`; ``head_acts[k]`` selects LeakyReLU
    on head k.  ``head_bs`` entries may be None (bias added by the caller —
    the predict_flow convention keeps its f32 bias outside).
    """
    return _fused_impl(xin, tuple(conv_ws), tuple(conv_bs), tuple(head_ws),
                       tuple(head_bs), tuple(head_acts))


def _fused_fwd(xin, conv_ws, conv_bs, head_ws, head_bs, head_acts):
    out = _fused_impl(xin, tuple(conv_ws), tuple(conv_bs), tuple(head_ws),
                      tuple(head_bs), tuple(head_acts))
    return out, (xin, tuple(conv_ws), tuple(conv_bs), tuple(head_ws),
                 tuple(head_bs))


def _fused_bwd(head_acts, res, g):
    xin, conv_ws, conv_bs, head_ws, head_bs = res
    # hb=None heads carry no bias grad; substitute zeros and drop after
    def f(x, cw, cb, hw, hb):
        return dense_heads_lax(x, cw, cb, hw, hb, head_acts)
    _, vjp = jax.vjp(f, xin, conv_ws, conv_bs, head_ws, head_bs)
    dx, dcw, dcb, dhw, dhb = vjp(tuple(g))
    dhb = tuple(None if b is None else db
                for b, db in zip(head_bs, dhb))
    return dx, dcw, dcb, dhw, dhb


fused_dense_heads.defvjp(_fused_fwd, _fused_bwd)
