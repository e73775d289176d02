"""PWC-DC optical-flow network, TPU-native (flax / NHWC).

A from-scratch reimplementation of the reference architecture
(``models/PWCNet.py:40-273`` for ``PWCDCNet``, ``:277-492`` for
``PWCDCNet_old``): a 6-level siamese feature pyramid, per-level bilinear
backward warp of image-2 features, a max-displacement-4 correlation cost
volume, DenseNet-style flow estimators, and a dilated context network whose
residual refines the finest flow.

Design differences from the reference (TPU-first, not a translation):

  * NHWC activations everywhere — the layout TPU convs want; the reference's
    CUDA correlation repacked NCHW→NHWC internally on every call
    (``correlation_cuda_kernel.cu:46-70``), here we simply never leave NHWC;
  * the cost volume is a Pallas TPU kernel / fused lax program instead of a
    custom CUDA extension (see ``opticalflow_tpu.ops.correlation``);
  * the whole forward is one jit-traceable function: no Python-side
    data-dependent control flow, so XLA fuses warp+corr+dense blocks freely;
  * optional bfloat16 compute with float32 accumulation for MXU throughput.

Numeric contract preserved exactly (gates checkpoint fidelity):

  * feature channels 3→16→32→64→96→128→196, LeakyReLU(0.1) after every
    pyramid/estimator conv (``models/PWCNet.py:52-69``);
  * per-level warp flow scaling 0.625 / 1.25 / 2.5 / 5.0 = 20/2^l
    (``models/PWCNet.py:212,226,240,256``);
  * warp validity-mask thresholds 0.9999 (new) / 0.999 (old variant);
  * correlation: 81 channels, channel-mean of products, zero-pad 4;
  * model flow output is at 1/4 input resolution, scaled by 20 downstream
    (``script_pwc.py:72``; README "Flow values need ×20").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from opticalflow_tpu.ops.convops import conv2d, deconv2d, leaky_relu
from opticalflow_tpu.ops.correlation import correlation
from opticalflow_tpu.ops.warp import warp_with_mask

__all__ = ["PWCDCNet", "pwc_dc_net", "pwc_dc_net_old",
           "PYRAMID_CHANNELS", "ESTIMATOR_CHANNELS", "FLOW_SCALE"]

# Feature channels at pyramid levels 1..6 (index 0 = input RGB).
PYRAMID_CHANNELS = (3, 16, 32, 64, 96, 128, 196)
# Dense-estimator conv widths (reference dd = cumsum([128,128,96,64,32])).
ESTIMATOR_CHANNELS = (128, 128, 96, 64, 32)
# Ground-truth flow was divided by 20 during the reference training
# (README:31); model outputs are multiplied back by this downstream.
FLOW_SCALE = 20.0
# up_flowℓ₊₁ → pixel units at level ℓ: 20 / 2^ℓ for ℓ = 5, 4, 3, 2.
_WARP_SCALES = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}

# use_blocked_lvl1="auto" crossover: blocked space-to-depth level-1/2 wins
# below this pair-batch, the plain layout at or above it (448×1024 sweep,
# PERF.md round-3 log).
_BLOCKED_AUTO_MAX_BATCH = 32


def resolve_blocked_lvl1(flag, pair_batch: int) -> bool:
    """Resolve ``use_blocked_lvl1`` ("auto" | bool) for a given pair-batch.

    Static per-shape decision: each batch size is a separate XLA program,
    so "auto" costs nothing at runtime."""
    if flag == "auto":
        return pair_batch < _BLOCKED_AUTO_MAX_BATCH
    return bool(flag)


# fuse_up_deconvs="auto" crossover: the fused 4-lane [deconv|upfeat] write
# wins (slightly) at pair-batch >= this, but its padded T(2,128) output
# tiles dominate the tiny-batch step — at B=1 it is the single largest op
# in the device profile.  448×1024 sweep (PERF.md round-5): unfused is
# +9% at B=1, +5.6% at B=2, neutral at B=4, −1.2% at B=8.
_FUSE_UP_AUTO_MIN_BATCH = 4


def resolve_fuse_up(flag, pair_batch: int) -> bool:
    """Resolve ``fuse_up_deconvs`` ("auto" | bool) for a given pair-batch
    (static per-shape decision, like :func:`resolve_blocked_lvl1`).

    Under a SYMBOLIC batch (``jax.export`` shape polymorphism) the
    comparison is inconclusive; unlike blocked-lvl1 — whose two graphs
    differ structurally, so the export caller must pin the flag — the
    fused form is exact and batch-generic, so "auto" falls back to fused
    there and the artifact stays usable at every batch size."""
    if flag == "auto":
        from jax.core import InconclusiveDimensionOperation
        try:
            return bool(pair_batch >= _FUSE_UP_AUTO_MIN_BATCH)
        except InconclusiveDimensionOperation:
            return True
    return bool(flag)

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _prec(dtype, mode: str = "highest"):
    """Conv precision policy: "highest" float32 compute gets exact multi-pass
    accumulation (checkpoint-fidelity parity); "fast" or bf16 compute rides
    the single-pass MXU path (training / throughput)."""
    if mode == "fast" or dtype != jnp.float32:
        return None
    return jax.lax.Precision.HIGHEST


class ConvLR(nn.Module):
    """Conv2d + LeakyReLU(0.1) — the reference's ``conv()`` helper."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", _kaiming,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        fast = self.precision == "fast" and self.dtype != jnp.float32
        # Dilated convs (the context net) go through XLA's own lowering on
        # purpose: every alternative measured slower — per-conv and
        # whole-chain space-to-depth phase decomposition, 9-tap shifted
        # sums, and Pallas windowed-DMA kernels (which win standalone but
        # force relayouts at the custom-call boundary).  Each ≤128-channel
        # conv costs a flat ~2.35 ms at the L2 shape regardless of dilation
        # — lane padding, not schedule (PERF.md round-2/round-3 logs).
        y = conv2d(x.astype(self.dtype), k.astype(self.dtype),
                   b.astype(self.dtype) if fast else b,
                   stride=self.stride, padding=self.padding,
                   dilation=self.dilation,
                   precision=_prec(self.dtype, self.precision),
                   out_dtype=self.dtype if fast else jnp.float32)
        return leaky_relu(y).astype(self.dtype)


class PredictFlow(nn.Module):
    """3×3 conv to 2 channels, no activation (reference ``predict_flow``)."""
    dtype: Any = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming, (3, 3, x.shape[-1], 2), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (2,), jnp.float32)
        # Fast mode: conv in the compute dtype (upcasting the 500+-channel
        # input would cost a huge copy), emitting the compute dtype so the
        # conv transpose under AD sees matching dtypes; the f32 bias-add
        # promotes the flow back to float32.  Highest mode stays f32 exact.
        fast = self.precision == "fast" and self.dtype != jnp.float32
        y = conv2d(x.astype(self.dtype), k.astype(self.dtype), None,
                   stride=1, padding=1,
                   precision=_prec(self.dtype, self.precision),
                   out_dtype=self.dtype if fast else jnp.float32)
        return y.astype(jnp.float32) + b


class Deconv(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) equivalent (reference ``deconv``).

    The kernel is stored as the HWIO weight of the equivalent forward conv
    over the 2×-dilated input (flipped/transposed once at checkpoint-import
    time), so runtime is a single ``conv_general_dilated``.
    """
    features: int
    dtype: Any = jnp.float32
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _kaiming, (4, 4, x.shape[-1], self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        fast = self.precision == "fast" and self.dtype != jnp.float32
        y = deconv2d(x.astype(self.dtype), k.astype(self.dtype), None,
                     precision=_prec(self.dtype, self.precision),
                     out_dtype=self.dtype if fast else jnp.float32)
        return y.astype(jnp.float32) + b


class _RawParams(nn.Module):
    """Declares a conv's kernel+bias without applying it — keeps the param
    tree identical when an optimized execution path (blocked convs, fused
    estimator) consumes the weights directly."""
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _kaiming, self.kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                       jnp.float32)
        return k, b


class PWCDCNet(nn.Module):
    """PWC-DC network (both the current and the ``_old`` reference variants).

    Input  ``x``: (B, H, W, 6) — im1 ‖ im2 stacked channel-wise, values in
    [0, 1]; H and W must be multiples of 64 (six stride-2 levels).
    Output: ``flow2`` (B, H/4, W/4, 2) in eval, or the tuple
    ``(flow2, flow3, flow4, flow5, flow6)`` when ``train=True`` — matching
    the reference forward (``models/PWCNet.py:270-273``).
    """
    md: int = 4
    variant: str = "new"  # "new" = PWCDCNet, "old" = PWCDCNet_old
    dtype: Any = jnp.float32
    # "highest": exact f32 conv accumulation (checkpoint parity);
    # "fast": backend-default single-pass math (training / throughput).
    precision: str = "highest"
    use_pallas_corr: bool = True
    # space-to-depth execution of the lane-starved level-1 + level-2
    # pyramid convs (fast mode only; needs H, W % 8 == 0 — true for all
    # /64-padded inputs). Exact re-indexing — disabled automatically in
    # "highest" mode and for the old variant.  "auto" (default) picks by
    # batch size at trace time: blocked wins at small batch where the
    # lane-starved 16/32-channel convs dominate (+16% at B=8), loses at
    # large batch where its block/unblock boundary copies cost more than
    # the lane win (-2% at B=64) — measured sweep in PERF.md round-3 log.
    use_blocked_lvl1: Any = "auto"
    # fast mode, new variant: dense blocks + level-2 heads in producer-piece
    # form (see _piece_dense_l2/_piece_dense_upper) — no running concats,
    # every conv ≥34 output lanes. Default ON: measured 291.5 vs 246.9
    # pairs/s at B=32 (PERF.md round-2 log); exact (tested vs plain path).
    use_piece_dense: bool = True
    # fast mode: each level's flow deconv + upfeat deconv as ONE 4-lane
    # deconv over [flow | xfeat] with a block kernel — halves the 2-lane
    # T(2,128) writes and the [up_flow|up_feat] block enters the next
    # level's input concat unsliced. Exact; param tree unchanged.
    # "auto" (default) fuses at pair-batch >= 4: at tiny batch the fused
    # write's padded output tiles are the profile's largest op (unfused is
    # +9% at B=1, +5.6% at B=2; neutral at 4, −1.2% at 8 — PERF.md r5).
    fuse_up_deconvs: Any = "auto"

    def _corr(self, a, b):
        # the kernel accumulates in f32 internally; bf16 inputs ride as-is
        cd = self.dtype if self.precision == "fast" else jnp.float32
        out = correlation(
            a.astype(cd), b.astype(cd),
            pad_size=self.md, kernel_size=1, max_displacement=self.md,
            stride1=1, stride2=1, use_pallas=self.use_pallas_corr)
        return leaky_relu(out).astype(self.dtype)

    def _dense_block(self, x, level: int):
        """DenseNet estimator: 5 convs with dense concatenation.

        The two variants concatenate in different orders
        (``models/PWCNet.py:202-206`` vs ``:426-443``): entries are True when
        the conv output is concatenated *before* the running features.
        """
        if self.variant == "new":
            conv_first = (True, True, True, True, True)
        else:
            conv_first = (False, True, False, False, False)
        for i, (feats, cf) in enumerate(zip(ESTIMATOR_CHANNELS, conv_first)):
            y = ConvLR(feats, dtype=self.dtype, precision=self.precision,
                       name=f"conv{level}_{i}")(x)
            x = jnp.concatenate((y, x) if cf else (x, y), axis=-1)
        return x

    def _blocked_lvl1(self, im):
        """Level-1 trio + the whole level-2 trio in 2×2-block
        (space-to-depth) form: the 16-channel level-1 convs run with 64
        output lanes at 1/4 the spatial positions and the 32-channel
        level-2 convs with 128 lanes; the un-blocked level-1 tensor never
        materializes and level 2 is unblocked exactly once, after conv2b."""
        from opticalflow_tpu.ops import blocked as BL
        dt = self.dtype
        k1a, b1a = _RawParams((3, 3, 3, 16), name="conv1a")()
        k1aa, b1aa = _RawParams((3, 3, 16, 16), name="conv1aa")()
        k1b, b1b = _RawParams((3, 3, 16, 16), name="conv1b")()
        k2a, b2a = _RawParams((3, 3, 16, 32), name="conv2a")()
        k2aa, b2aa = _RawParams((3, 3, 32, 32), name="conv2aa")()
        k2b, b2b = _RawParams((3, 3, 32, 32), name="conv2b")()
        # out_dtype == compute dtype (ConvLR fast-mode convention): XLA still
        # accumulates f32 in the MXU, and a mixed f32-out/bf16-kernel conv
        # has no transpose rule — bf16 *training* through this path fails
        # with "conv_general_dilated requires arguments to have the same
        # dtypes" (caught by scripts/bench_train.py).
        y = BL.conv_blocked_s2(im.astype(dt),
                               BL.blocked_s2_kernel(k1a).astype(dt),
                               out_dtype=dt)
        y = leaky_relu(y + BL.to_blocked_bias(b1a).astype(dt)).astype(dt)
        y = leaky_relu(
            BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1aa).astype(dt),
                               out_dtype=dt)
            + BL.to_blocked_bias(b1aa).astype(dt)).astype(dt)
        y = leaky_relu(
            BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1b).astype(dt),
                               out_dtype=dt)
            + BL.to_blocked_bias(b1b).astype(dt)).astype(dt)
        y = leaky_relu(
            BL.conv_blocked_s2_to_blocked(
                y, BL.blocked_s2_to_blocked_kernel(k2a).astype(dt),
                out_dtype=dt)
            + BL.to_blocked_bias(b2a).astype(dt)).astype(dt)
        for k, b in ((k2aa, b2aa), (k2b, b2b)):
            y = leaky_relu(
                BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k).astype(dt),
                                   out_dtype=dt)
                + BL.to_blocked_bias(b).astype(dt)).astype(dt)
        return BL.depth_to_space(y)

    def _piece_dense_l2(self, xin):
        """Level-2 dense block + heads in producer-piece form.

        The concat form re-reads every earlier piece per consumer conv and
        re-writes the running concat five times (device profile at B=32:
        ~19 ms of concatenates + lane-starved 469→64 / 533→32 / 565→2 tail
        convs — PERF.md round-2).  By linearity of convolution, restructure
        per PRODUCER: for each piece p ∈ {xin, y0..y4}, ONE conv computes
        p's contribution to every downstream output at once
        ([y_{k+1} | … | y4 | dc_conv1 | predict_flow2] — ≥130 output lanes),
        so each piece is read exactly once and no concat is materialized.
        y_i = LeakyReLU(Σ_p part_p[y_i] + b_i) reproduces the dense block
        exactly (conv distributes over the input concat).  The kernels are
        runtime slices of the UNCHANGED conv2_*/predict_flow2/dc_conv1
        params — checkpoints and the param tree are untouched.  Fast mode
        only: partial sums accumulate in the compute dtype.
        """
        dt = self.dtype
        w = list(ESTIMATOR_CHANNELS)               # y0..y4 widths
        n = len(w)
        cin0 = xin.shape[-1]
        cins = [cin0]
        for wi in w:
            cins.append(cins[-1] + wi)             # cins[i] = Cin of conv2_i
        Ws, Bs = [], []
        for i in range(n):
            k, b = _RawParams((3, 3, cins[i], w[i]), name=f"conv2_{i}")()
            Ws.append(k)
            Bs.append(b)
        kpf, bpf = _RawParams((3, 3, cins[n], 2), name="predict_flow2")()
        kdc, bdc = _RawParams((3, 3, cins[n], 128), name="dc_conv1")()
        Ws += [kdc, kpf]                           # consumer n = dc, n+1 = pf

        def in_off(i, p):
            """Offset of piece p in consumer i's input
            x_i = [y_{i-1}, …, y_0, xin] (piece 0 = xin, p ≥ 1 = y_{p-1})."""
            if p == 0:
                return cins[min(i, n)] - cin0
            return sum(w[p:min(i, n)])

        def out_off(p, i):
            """Offset of consumer i inside piece p's partial output, ordered
            [y_p-part … y4-part | dc(128) | pf(2)] — the y-part offsets land
            where the consumer convs want them.  (A head-first [dc|pf|y]
            order that aligns the dc/pf accumulation slices to lane-tile
            boundaries measured neutral — the +130-offset misaligned y-part
            reads repay the aligned head slices; PERF.md round-2 log.)"""
            return sum(w[p:min(i, n)]) + (128 if i == n + 1 else 0)

        pieces = [xin.astype(dt)]
        zs = []
        for p in range(n + 1):
            pw = pieces[p].shape[-1]
            order = list(range(p, n)) + [n, n + 1]
            kj = jnp.concatenate(
                [Ws[i][:, :, in_off(i, p):in_off(i, p) + pw, :]
                 for i in order],
                axis=-1).astype(dt)
            # named for selective remat: TrainConfig(remat="l2") recomputes
            # these ≥130-lane quarter-res partials in the backward pass
            # instead of storing them (the single largest activation group)
            zs.append(checkpoint_name(
                conv2d(pieces[p], kj, None, stride=1, padding=1,
                       out_dtype=dt), "l2_piece_out"))
            if p < n:
                acc = zs[0][..., out_off(0, p):out_off(0, p) + w[p]]
                for q in range(1, p + 1):
                    acc = acc + zs[q][..., out_off(q, p):out_off(q, p) + w[p]]
                pieces.append(leaky_relu(acc + Bs[p].astype(dt)).astype(dt))
        # dc and pf accumulate as separate slice-add chains.  (Fusing them
        # into one 130-wide slice-add was measured SLOWER — 239.5 vs 291.5
        # pairs/s at B=32: the 130-lane windows start at non-128-aligned
        # offsets in every z, and the misaligned wide slices cost more than
        # the six narrow 2-lane pf writes they replace; PERF.md round-2.)
        dc = zs[0][..., out_off(0, n):out_off(0, n) + 128]
        pf = zs[0][..., out_off(0, n + 1):out_off(0, n + 1) + 2]
        for q in range(1, n + 1):
            dc = dc + zs[q][..., out_off(q, n):out_off(q, n) + 128]
            pf = pf + zs[q][..., out_off(q, n + 1):out_off(q, n + 1) + 2]
        dc1 = leaky_relu(dc + bdc.astype(dt)).astype(dt)
        flow = pf.astype(jnp.float32) + bpf
        return flow, dc1

    def _piece_dense_upper(self, xin, lvl):
        """Producer-piece dense block for levels 3-6 (same restructure as
        :meth:`_piece_dense_l2`): piece convs emit [y-parts | predict_flow
        partial], so the five incremental concats disappear and every conv
        keeps ≥34 output lanes.  ``xfeat`` is assembled ONCE at the end —
        the upfeat deconv still needs it — replacing five growing concat
        writes with one.  Returns (flow, xfeat)."""
        dt = self.dtype
        w = list(ESTIMATOR_CHANNELS)
        n = len(w)
        cin0 = xin.shape[-1]
        cins = [cin0]
        for wi in w:
            cins.append(cins[-1] + wi)
        Ws, Bs = [], []
        for i in range(n):
            k, b = _RawParams((3, 3, cins[i], w[i]), name=f"conv{lvl}_{i}")()
            Ws.append(k)
            Bs.append(b)
        kpf, bpf = _RawParams((3, 3, cins[n], 2),
                              name=f"predict_flow{lvl}")()

        def in_off(i, p):
            if p == 0:
                return cins[min(i, n)] - cin0
            return sum(w[p:min(i, n)])

        def out_off(p, i):
            return sum(w[p:min(i, n)])

        pieces = [xin.astype(dt)]
        zs = []
        for p in range(n + 1):
            pw = pieces[p].shape[-1]
            kj = jnp.concatenate(
                [Ws[i][:, :, in_off(i, p):in_off(i, p) + pw, :]
                 for i in range(p, n)]
                + [kpf[:, :, in_off(n, p):in_off(n, p) + pw, :]],
                axis=-1).astype(dt)
            zs.append(conv2d(pieces[p], kj, None, stride=1, padding=1,
                             out_dtype=dt))
            if p < n:
                acc = zs[0][..., out_off(0, p):out_off(0, p) + w[p]]
                for q in range(1, p + 1):
                    acc = acc + zs[q][..., out_off(q, p):out_off(q, p) + w[p]]
                pieces.append(leaky_relu(acc + Bs[p].astype(dt)).astype(dt))
        pf = zs[0][..., out_off(0, n):out_off(0, n) + 2]
        for q in range(1, n + 1):
            pf = pf + zs[q][..., out_off(q, n):out_off(q, n) + 2]
        flow = pf.astype(jnp.float32) + bpf
        xfeat = jnp.concatenate(pieces[::-1], axis=-1)  # [y4..y0, xin]
        return flow, xfeat

    def _fused_up_deconv(self, flow, xfeat, lvl):
        """Both upsampling deconvs of a level as ONE 4-lane deconv.

        ``deconv{lvl}`` (flow, 2→2) and ``upfeat{lvl}`` (xfeat, C→2) write
        2-lane outputs — each materializes in T(2,128) tiles padded to full
        128-lane writes (the same pathology as the pf partial slices;
        PERF.md round-2).  A block kernel over [flow | xfeat] emits
        [up_flow | up_feat] in one deconv, and the 4-ch block feeds the
        next level's input concat unsliced.  Exact: deconvolution is linear
        in the input channels; params are runtime slices of the unchanged
        deconv/upfeat kernels.  Returns (up_flow_f32, up_block_dt)."""
        dt = self.dtype
        cin = xfeat.shape[-1]
        kd, bd = _RawParams((4, 4, 2, 2), name=f"deconv{lvl}")()
        ku, bu = _RawParams((4, 4, cin, 2), name=f"upfeat{lvl}")()
        kcomb = jnp.concatenate([
            jnp.concatenate([kd, jnp.zeros_like(kd)], axis=-1),
            jnp.concatenate([jnp.zeros((4, 4, cin, 2), ku.dtype), ku],
                            axis=-1),
        ], axis=2).astype(dt)
        cat = jnp.concatenate([flow.astype(dt), xfeat.astype(dt)], axis=-1)
        y = deconv2d(cat, kcomb, None, out_dtype=dt).astype(jnp.float32)
        b4 = jnp.concatenate([bd, bu])
        up_flow = y[..., :2] + bd          # f32, bit-matches Deconv's output
        up_block = (y + b4).astype(dt)     # [up_flow | up_feat] for xin
        return up_flow, up_block

    def _pyramid(self, im):
        """Siamese feature pyramid; returns features at levels 1..6
        (level-1 entry is None on the blocked fast path — nothing reads it)."""
        feats = []
        # im carries both siamese images (2B); gate on the pair batch.
        want = resolve_blocked_lvl1(self.use_blocked_lvl1, im.shape[0] // 2)
        blocked = (self.variant == "new" and self.precision == "fast"
                   and want
                   and im.shape[1] % 8 == 0 and im.shape[2] % 8 == 0)
        if blocked:
            x = self._blocked_lvl1(im)
            feats.append(None)
            feats.append(x)
            start = 3
        else:
            x = im
            start = 1
        for lvl in range(start, 7):
            ch = PYRAMID_CHANNELS[lvl]
            if self.variant == "new":
                # level 6 names its stride-2 conv "conv6aa" (reference :67-69)
                names = ([f"conv{lvl}a", f"conv{lvl}aa", f"conv{lvl}b"]
                         if lvl < 6 else ["conv6aa", "conv6a", "conv6b"])
                strides = (2, 1, 1)
            else:
                names = [f"conv{lvl}a", f"conv{lvl}b"]
                strides = (2, 1)
            for name, s in zip(names, strides):
                x = ConvLR(ch, stride=s, dtype=self.dtype,
                           precision=self.precision, name=name)(x)
            feats.append(x)
        return feats

    @nn.compact
    def __call__(self, x, train: bool = False):
        mask_thr = 0.9999 if self.variant == "new" else 0.999
        im1 = x[..., :3].astype(self.dtype)
        im2 = x[..., 3:].astype(self.dtype)

        # Siamese pyramid: one set of weights applied to both images.  Batch
        # the two images together so each conv runs once at 2B batch (better
        # MXU utilization than two B-sized launches).
        both = jnp.concatenate([im1, im2], axis=0)
        feats = self._pyramid(both)
        bsz = im1.shape[0]
        c1 = {lvl: f[:bsz] for lvl, f in zip(range(1, 7), feats)
              if f is not None}
        c2 = {lvl: f[bsz:] for lvl, f in zip(range(1, 7), feats)
              if f is not None}

        fuse_up = (resolve_fuse_up(self.fuse_up_deconvs, bsz)
                   and self.precision == "fast")
        flows = {}
        up_flow = None
        up_feat = None
        up_block = None    # fused [up_flow | up_feat] (see _fused_up_deconv)
        xfeat = None
        dc = None
        dc_start = 1
        for lvl in (6, 5, 4, 3, 2):
            if lvl == 6:
                corr = self._corr(c1[6], c2[6])
                xin = corr
            else:
                warped = warp_with_mask(
                    c2[lvl], up_flow * _WARP_SCALES[lvl],
                    mask_threshold=mask_thr).astype(self.dtype)
                corr = self._corr(c1[lvl], warped)
                tail = ([up_block] if up_block is not None else
                        [up_flow.astype(self.dtype),
                         up_feat.astype(self.dtype)])
                xin = jnp.concatenate([corr, c1[lvl]] + tail, axis=-1)
            piece = (self.use_piece_dense and self.variant == "new"
                     and self.precision == "fast")
            if lvl == 2 and piece:
                flows[2], dc = self._piece_dense_l2(xin)
                dc_start = 2   # dc_conv1 came out of the piece form
                break
            if piece:
                flow, xfeat = self._piece_dense_upper(xin, lvl)
                flows[lvl] = flow
            else:
                xfeat = self._dense_block(xin, lvl)
                flow = PredictFlow(dtype=self.dtype,
                                   precision=self.precision,
                                   name=f"predict_flow{lvl}")(xfeat)
                flows[lvl] = flow
            if lvl > 2:
                if fuse_up:
                    up_flow, up_block = self._fused_up_deconv(
                        flow, xfeat, lvl)
                else:
                    up_flow = Deconv(2, dtype=self.dtype,
                                     precision=self.precision,
                                     name=f"deconv{lvl}")(flow)
                    up_feat = Deconv(2, dtype=self.dtype,
                                     precision=self.precision,
                                     name=f"upfeat{lvl}")(xfeat)

        # Context network: 7 dilated convs, residual added to flow2
        # (reference models/PWCNet.py:126-132, :267-268).
        if dc is None:
            dc = xfeat
        dc_specs = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))
        for i, (feats_n, dil) in enumerate(dc_specs, start=1):
            if i < dc_start:
                continue
            dc = checkpoint_name(
                ConvLR(feats_n, padding=dil, dilation=dil, dtype=self.dtype,
                       precision=self.precision,
                       name=f"dc_conv{i}")(dc), "l2_ctx")
        flows[2] = flows[2] + PredictFlow(dtype=self.dtype,
                                          precision=self.precision,
                                          name="dc_conv7")(dc)

        if train:
            return tuple(flows[l] for l in (2, 3, 4, 5, 6))
        return flows[2]


def pwc_dc_net(path: str | None = None, **kwargs):
    """Build the current-variant PWCDCNet; optionally load weights.

    Returns ``(module, params)`` — params are freshly initialized when
    ``path`` is None.  Mirrors reference ``pwc_dc_net``
    (``models/PWCNet.py:497-506``).
    """
    model = PWCDCNet(variant="new", **kwargs)
    params = _init_or_load(model, path)
    return model, params


def pwc_dc_net_old(path: str | None = None, **kwargs):
    """Legacy 2-conv-per-level variant (``models/PWCNet.py:511-520``)."""
    model = PWCDCNet(variant="old", **kwargs)
    params = _init_or_load(model, path)
    return model, params


def _init_or_load(model: PWCDCNet, path: str | None):
    if path is not None:
        from opticalflow_tpu.models import torch_import
        return torch_import.import_checkpoint(path, variant=model.variant)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 6), jnp.float32)
    # jitted: eager flax init is thousands of tiny dispatches — minutes of
    # pure round-trip latency on relay-attached TPUs.
    return jax.jit(model.init)(rng, dummy)["params"]
