"""Measure the warp⊕corr fused Pallas kernel (VERDICT r4 task 2).

SURVEY §7 names warp→corr fusion as a design candidate (the warp's output
is always immediately consumed by correlation, reference
``models/PWCNet.py:212-214``), and the packed L2 warp gather is the largest
single op in the device profile.  The measured negative in PERF.md is a
*standalone* Pallas warp; this probe measures the structurally different
program: bilinear warp computed INSIDE the correlation kernel, where the
packed-corner image is VMEM-resident, so the warped tensor never
round-trips HBM.

The only Mosaic-expressible dynamic gather is a scalar loop of per-pixel
dynamic slices (``probe_gather.py``: 8.4 M rows/s vs XLA's 78 M).  The
kernel keeps that loop minimal — gather one packed 2×2-neighborhood row
(4C lanes) per warped pixel into scratch — and vectorizes everything else
(bilinear combine, mask, 81-displacement correlation).  Gather indices and
bilinear corner weights (validity + 0.9999 mask folded in) are precomputed
on the XLA side and ride in as md-row-padded inputs, so the in-kernel halo
window is a plain dynamic row slice.

Validates against the composed reference (warp_with_mask →
correlation), then times both forms at the L2 headline shape.
Run:  python scripts/probe_fused_warpcorr.py [B [H W C]]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MD = 4
ND = 2 * MD + 1
ND2 = ND * ND


def _prep_gather(flow, h, w, mask_threshold=0.9999):
    """XLA-side precompute, md-row zero-padded:

    * ``idx`` (h+2md, w) int32 — flattened packed-corner row index per
      warped pixel (0 for the out-of-image halo rows: any row works, the
      weights there are zero);
    * ``wv`` (h+2md, w, 4) f32 — bilinear corner weights with per-corner
      in-bounds validity AND the reference's 0.9999 sum-mask folded in.
    """
    import jax.numpy as jnp

    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = (xx + u) * (w / max(w - 1, 1)) - 0.5
    ys = (yy + v) * (h / max(h - 1, 1)) - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    weights = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                         wy * (1 - wx), wy * wx], axis=-1)
    valid = jnp.stack([
        (x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1),
        (x0 >= -1) & (x0 <= w - 2) & (y0 >= 0) & (y0 <= h - 1),
        (x0 >= 0) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 2),
        (x0 >= -1) & (x0 <= w - 2) & (y0 >= -1) & (y0 <= h - 2),
    ], axis=-1)
    wv = weights * valid.astype(jnp.float32)
    mask = (jnp.sum(wv, axis=-1) >= mask_threshold).astype(jnp.float32)
    wv = wv * mask[..., None]
    idx = (jnp.clip(y0 + 1, 0, h) * (w + 1)
           + jnp.clip(x0 + 1, 0, w)).astype(jnp.int32)
    pad = ((0, 0), (MD, MD), (0, 0))
    return jnp.pad(idx, pad), jnp.pad(wv, pad + ((0, 0),))


def _fused_kernel(md, th, h, w, c, rows8, cl,
                  f1_ref, z_hbm, idx_ref, wv_ref, out_ref,
                  z_ref, gat_ref, sem):
    """One (batch, row-tile) grid step.

    f1 (1, th, w, c); z packed corners (b·rows8, 4c) in HBM, DMAed into the
    persistent z_ref scratch once per batch item (a resident BlockSpec
    would be double-buffered by the pipeline — 2×7.5 MB blew VMEM);
    idx (1, h+2md, w) int32 in SMEM; wv (1, h+2md, w, 4) f32;
    out (1, nd2, th, w); gat scratch ((th+2md)·w, 4c) f32.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb = pl.program_id(0)
    i = pl.program_id(1)
    thh = th + 2 * md
    base = i * th                                  # halo start in padded rows

    @pl.when(i == 0)
    def _load_z():
        cp = pltpu.make_async_copy(
            z_hbm.at[pl.ds(bb * rows8, rows8)], z_ref, sem)
        cp.start()
        cp.wait()

    # phase 1 — the scalar gather loop (the measured bottleneck candidate).
    # z and the scratch are 2-D (rows, 4c): Mosaic's alignment prover
    # rejects width-1 dynamic sublane slices on 3-D refs at this scale.
    def gather_row(yy, _):
        def gather_px(xx, _):
            gat_ref[pl.ds(yy * w + xx, 1)] = z_ref[
                pl.ds(idx_ref[0, base + yy, xx], 1)]
            return 0
        jax.lax.fori_loop(0, w, gather_px, 0)
        return 0
    jax.lax.fori_loop(0, thh, gather_row, 0)

    # phase 2 — vectorized bilinear combine + 81-displacement correlation
    wvwin = wv_ref[0, pl.ds(base, thh)]            # (thh, w, 4)
    gat = gat_ref[:].reshape(thh, w, cl)           # f32
    warped = jnp.zeros((thh, w, c), jnp.float32)
    for k in range(4):
        warped = warped + wvwin[..., k:k + 1] * gat[:, :, k * c:(k + 1) * c]

    f1 = f1_ref[0].astype(jnp.float32)             # (th, w, c)
    inv_c = 1.0 / c
    wp = jnp.pad(warped, ((0, 0), (md, md), (0, 0)))   # zero-pad columns
    for ti in range(ND):
        col = wp[:, ti:ti + w]
        for tj in range(ND):
            sl = col[tj:tj + th]
            out_ref[0, tj * ND + ti] = (
                jnp.sum(f1 * sl, axis=-1) * inv_c).astype(out_ref.dtype)


def fused_warp_corr(f1, f2, flow, th=8, interpret=False):
    """corr(f1, warp_with_mask(f2, flow)) in one Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1.shape
    idx, wv = _prep_gather(flow, h, w)

    # packed corners over the 1-px zero-padded image, flattened rows,
    # padded to an 8-multiple row count and folded to 2-D so each batch
    # item is one 8-aligned block of an (b·rows8, 4c) array
    pimg = jnp.pad(f2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jnp.concatenate([
        pimg[:, :-1, :-1], pimg[:, :-1, 1:],
        pimg[:, 1:, :-1], pimg[:, 1:, 1:]], axis=-1)          # (b,h+1,w+1,4c)
    nrow = (h + 1) * (w + 1)
    rows8 = -(-nrow // 8) * 8
    z = jnp.pad(z.reshape(b, nrow, 4 * c),
                ((0, 0), (0, rows8 - nrow), (0, 0)))
    # f32 rows: Mosaic's alignment prover rejects width-1 dynamic sublane
    # slices on bf16 refs (the (2,1)-packed tiling has no provable
    # row-granular alignment) — f32 is the only gatherable element type.
    # This DOUBLES the resident-table bytes: at the L2 shape (112×256,
    # 4c=128) the f32 table is 14.9 MB and no longer fits VMEM — the
    # fused kernel is structurally infeasible there; measure at L3.
    # Lanes pad to a 128-multiple (HBM→VMEM DMA slices need it).
    cl = -(-4 * c // 128) * 128
    z = z.reshape(b, rows8, 4 * c).astype(jnp.float32)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, cl - 4 * c)))
    z = z.reshape(b * rows8, cl)

    kernel = functools.partial(_fused_kernel, MD, th, h, w, c, rows8, cl)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            # per-pixel gather indices live in SMEM: the gather loop reads
            # them as scalars at (row, col) — dynamic LANE indexing of a
            # VMEM vector does not lower in Mosaic
            pl.BlockSpec((1, h + 2 * MD, w), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h + 2 * MD, w, 4), lambda bb, ii: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ND2, th, w),
                               lambda bb, ii: (bb, 0, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ND2, h, w), f1.dtype),
        scratch_shapes=[pltpu.VMEM((rows8, cl), jnp.float32),
                        pltpu.VMEM(((th + 2 * MD) * w, cl), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(f1, z, idx, wv)
    return jnp.transpose(out, (0, 2, 3, 1))


def composed(f1, f2, flow):
    """The production path: packed XLA warp gather → Pallas correlation."""
    from opticalflow_tpu.ops.pallas_corr import correlation_pallas
    from opticalflow_tpu.ops.warp import warp_with_mask

    return correlation_pallas(f1, warp_with_mask(f2, flow), MD)


def composed_lax(f1, f2, flow):
    from opticalflow_tpu.ops.correlation import correlation_lax
    from opticalflow_tpu.ops.warp import warp_with_mask

    return correlation_lax(f1, warp_with_mask(f2, flow), max_displacement=MD)


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 112
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    C = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    rng = np.random.RandomState(0)
    on_tpu = jax.default_backend() == "tpu"

    # ---- correctness (small shape; interpret off-TPU, compiled on-TPU)
    fs, gs, hs, cs = 2, 16, 32, 8
    tf1 = jnp.asarray(rng.randn(fs, gs, hs, cs), jnp.float32)
    tf2 = jnp.asarray(rng.randn(fs, gs, hs, cs), jnp.float32)
    tfl = jnp.asarray(rng.randn(fs, gs, hs, 2) * 2, jnp.float32)
    got = np.asarray(fused_warp_corr(tf1, tf2, tfl, th=8,
                                     interpret=not on_tpu))
    want = np.asarray(composed_lax(tf1, tf2, tfl))
    err = np.abs(got - want).max()
    print(f"correctness vs composed lax (tiny f32): max abs err {err:.2e}",
          flush=True)
    assert err < 1e-4, err

    if not on_tpu:
        print("not on TPU — timing skipped")
        return

    # ---- timing at the L2 headline shape, bf16 features (the model's
    # fast-mode dtype; f32 z would blow the VMEM budget at this shape)
    f1 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    flow = jnp.asarray(rng.randn(B, H, W, 2) * 3, jnp.float32)

    got = np.asarray(fused_warp_corr(f1, f2, flow), np.float32)
    want = np.asarray(composed(f1, f2, flow), np.float32)
    print(f"full-shape fused-vs-composed max abs err: "
          f"{np.abs(got - want).max():.2e} (bf16 rounding)", flush=True)

    def timed(fn, f1, f2, flow, n=20):
        def loop(f1, f2, flow):
            def body(i, acc):
                # perturb the flow per iteration so XLA's loop-invariant
                # code motion cannot hoist the body (bench.py methodology)
                out = fn(f1, f2, flow + i.astype(jnp.float32) * 1e-6)
                return acc + jnp.float32(jnp.sum(out[:, ::16, ::16, 0]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        # the fused kernel's VMEM footprint + the while wrapper's buffers
        # exceed the default 16 MiB scoped-vmem limit by ~1.5 MB; raise it
        # (physically fine — bench_copts ran the full model at 96 MiB)
        compiled = (jax.jit(loop)
                    .lower(f1, f2, flow)
                    .compile(compiler_options={
                        "xla_tpu_scoped_vmem_limit_kib": "24576"}))
        float(compiled(f1, f2, flow))  # warm
        t0 = time.perf_counter()
        float(compiled(f1, f2, flow))
        return (time.perf_counter() - t0) / n

    t_comp = timed(composed, f1, f2, flow)
    print(f"composed (XLA warp + Pallas corr): {t_comp * 1e3:.2f} ms",
          flush=True)
    t_fuse = timed(fused_warp_corr, f1, f2, flow)
    print(f"fused Pallas warp-in-corr:         {t_fuse * 1e3:.2f} ms "
          f"(composed/fused = {t_comp / t_fuse:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
