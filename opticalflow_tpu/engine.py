"""FlowEngine — the jit-compiled inference pipeline.

Replaces the reference's host-side numpy/cv2 glue (``script_pwc.py:43-81``,
``inference_kitti.py:208-224``) with a single XLA program per input shape:
network forward + ×FLOW_SCALE descale + bilinear flow upsampling all run on
device; only image decode and file I/O stay on host.

Shape policy: XLA compiles per static shape, so the engine's jitted callables
are cached per (padded) input shape by JAX — for video streams and dataset
evaluation that is one compile for the whole run.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from opticalflow_tpu.models.pwcnet import PWCDCNet, FLOW_SCALE
from opticalflow_tpu.ops.resize import flow_resize, upsample_flow_to
from opticalflow_tpu.io import images as imio

__all__ = ["FlowEngine"]


def _as_uint8_frame(im, what: str) -> np.ndarray:
    """Validate/convert one frame for the u8 upload path.

    The device program quantizes to uint8 before /255; silently truncating
    a float frame (e.g. one already normalized to [0,1]) would return
    plausible-looking garbage flow.  Exactly-integral [0,255] inputs of any
    dtype convert losslessly; anything else fails loudly."""
    a = np.asarray(im)
    if a.dtype == np.uint8:
        return a
    if (np.issubdtype(a.dtype, np.integer)
            or (np.issubdtype(a.dtype, np.floating)
                and np.all(a == np.rint(a)))):
        if a.size and (a.min() < 0 or a.max() > 255):
            raise TypeError(f"{what} has values outside [0, 255] "
                            f"(dtype {a.dtype}) — pass uint8 frames")
        return a.astype(np.uint8)
    raise TypeError(
        f"{what} must be uint8 (or exactly-integral [0, 255]) — got "
        f"non-integral {a.dtype} values; if the frames were normalized to "
        f"[0, 1], multiply by 255 and round, or decode to uint8 directly")


class FlowEngine:
    """Batched optical-flow inference on TPU.

    Args:
      model: a PWCDCNet (or compatible) flax module.
      params: its parameter pytree.
      flow_scale: multiplier applied to the raw network output.  20.0 for the
        canonical Sintel weights (``script_pwc.py:72``); the reference's own
        fine-tuned checkpoints are trained against unscaled GT
        (``train.py:71-72``) and need 1.0.
      mesh: optional ``jax.sharding.Mesh`` with a "data" axis for multi-chip
        data-parallel inference.  :meth:`flow_from_pairs` pads ragged
        batches to a multiple of the axis size transparently;
        :meth:`flow_from_batch` callers must pass a divisible batch
        (device arrays are not repadded on host).
      dispatch_chunk: optional sub-batch size.  When set, any forward over a
        batch larger than (and divisible by) it runs as ``lax.map`` over
        B/chunk sub-batches *inside* the same jitted program.  XLA's
        schedule for this model peaks sharply at batch 8 (329 pairs/s/chip
        vs 226–298 at B=10..64, OOM at B≥96 — PERF.md round-3 sweep);
        ``dispatch_chunk=8`` keeps that peak schedule at any multiple-of-8
        batch and flattens the memory knee (measured: B=32 chunked matches
        the B=8 peak within noise).  Batches not divisible by the chunk
        fall back to the monolithic program.  Single-chip lever: mutually
        exclusive with ``mesh`` (there the data axis already splits the
        batch per chip).
    """

    def __init__(self, model: PWCDCNet, params, *,
                 flow_scale: float = FLOW_SCALE,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 dispatch_chunk: Optional[int] = None):
        self.model = model
        self.flow_scale = float(flow_scale)
        self.mesh = mesh
        if dispatch_chunk is not None:
            dispatch_chunk = int(dispatch_chunk)
            if dispatch_chunk < 1:
                raise ValueError(
                    f"dispatch_chunk must be >= 1, got {dispatch_chunk}")
            if mesh is not None:
                raise ValueError(
                    "dispatch_chunk is a single-chip scheduling lever; with "
                    "a mesh the data axis already splits each batch — use "
                    "one or the other")
        self.dispatch_chunk = dispatch_chunk
        self._x_sharding = None
        self._replicate_out = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._x_sharding = NamedSharding(mesh, P("data"))
            # process-aware replication: multi-process placement assembles
            # each host's replica locally (jax.device_put would assert
            # cross-process equality via a Gloo allgather whose 30 s
            # context-init window is blown by checkpoint-load/compile skew)
            # and instead verifies equality through the coordination
            # service, failing loudly on divergent checkpoints.
            from opticalflow_tpu.parallel.mesh import replicate
            params = replicate(params, mesh)
            # multi-PROCESS fetch: a batch-sharded output spans devices this
            # process cannot address, so np.asarray would raise.  An identity
            # program with a replicated out_sharding makes XLA emit the
            # all-gather (Gloo over DCN between hosts, ICI inside a slice) and
            # every process reads its full local replica.  Single-process
            # meshes skip this (all shards already addressable).
            self._replicate_out = jax.jit(
                lambda a: a, out_shardings=NamedSharding(mesh, P()))
        self.params = jax.tree.map(jnp.asarray, params)

        scale = self.flow_scale
        chunk = self.dispatch_chunk

        def _chunked(fn, x):
            # lax.map over B/chunk sub-batches: one compiled body at the
            # peak-schedule chunk size, sequenced on device (no host
            # round-trips between chunks, memory stays flat at the chunk's
            # working set).  Trace-time decision — `chunk` is static.
            b = x.shape[0]
            if not chunk or b <= chunk or b % chunk:
                return fn(x)
            xs = x.reshape(b // chunk, chunk, *x.shape[1:])
            out = jax.lax.map(fn, xs)
            return out.reshape(b, *out.shape[2:])

        def quarter_flow(params, x):
            return _chunked(
                lambda s: model.apply({"params": params}, s), x) * scale

        def quarter_flow_u8(params, xu8, preset):
            # uint8 (B, H64, W64, 6) in, preprocessing on device: the host
            # uploads a quarter of the bytes a float32 batch would cost
            # (H2D is the binding link on PCIe/relay-attached hosts).  Same
            # f32 elementwise math as io.images.preprocess_pair — bit-equal
            # on CPU (tests/test_real_golden.py); on TPU the compiler may
            # strength-reduce /255 to a reciprocal multiply (≤1 ULP,
            # measured mean EPE delta 1.6e-9 on the canonical CLI).
            def one(xu8c):
                x = xu8c.astype(jnp.float32) / 255.0
                if preset == "bgr_unit":
                    x = x[..., jnp.array([2, 1, 0, 5, 4, 3])]
                elif preset == "rgb_imagenet":
                    mean = jnp.tile(jnp.asarray(imio._IMAGENET_MEAN), 2)
                    std = jnp.tile(jnp.asarray(imio._IMAGENET_STD), 2)
                    x = (x - mean) / std
                elif preset != "rgb_unit":
                    raise ValueError(
                        f"unknown preprocessing preset {preset!r}; "
                        f"choose from {imio.PREPROC_PRESETS}")
                return model.apply({"params": params}, x)

            # preprocess chunks with the forward so the f32 working set
            # never exceeds one chunk
            return _chunked(one, xu8) * scale

        def full_resize_u8(params, xu8, hscale, wscale, preset, height,
                           width):
            # ONE program: u8 preprocess → forward → straight quarter →
            # original-size resize (half-pixel, matching cv2.resize in
            # script_pwc.py:76-81) → vector rescale by the /64 distortion.
            # A single dispatch per batch — per-call overhead is ~30 ms on
            # relay-attached hosts, so fusing pre/net/post halves it.
            # cv2 parity boundary: jax.image.resize antialiases when
            # DOWNsampling, which only happens if a frame side is < 16 px
            # (quarter of the /64 ceiling exceeds the original) — a
            # degenerate input; every realistic size is an upsample here,
            # where linear/half-pixel matches cv2 exactly.
            q = quarter_flow_u8(params, xu8, preset)
            b = q.shape[0]
            flow = jax.image.resize(q, (b, height, width, 2), method="linear")
            return flow * jnp.stack([wscale, hscale])

        def full_pad_u8(params, xu8, preset, height, width):
            # ONE program: u8 preprocess → forward → upsample to the padded
            # size (align_corners=True like flow_resize); crop stays on host
            q = quarter_flow_u8(params, xu8, preset)
            return flow_resize(q, height, width)

        def full_padref_u8(params, xu8, preset, ph, pw, height, width):
            # EXACT transcription of the reference's pad path
            # (``inference_kitti.py:216-224``): the quarter-res flow is
            # unpadded by the FULL-res pad counts (``unpad(flow, ph, pw)``
            # on a (Hp/4, Wp/4) map — 4× too many rows/cols, e.g. KITTI
            # 375×1242: 96×320 → 87×282) and then resized to the original
            # size with an anisotropic align_corners=True vector rescale
            # (×375/87 ≈ 4.31 instead of 4).  Numerically different from
            # the corrected "pad" mode everywhere, kept for bit-parity
            # with reference-computed metrics.
            q = quarter_flow_u8(params, xu8, preset)
            q = q[:, : q.shape[1] - ph, : q.shape[2] - pw]
            return flow_resize(q, height, width)

        if mesh is not None:
            self._quarter_flow = jax.jit(
                quarter_flow, in_shardings=(None, self._x_sharding))
            # positional statics: pjit rejects kwargs with in_shardings
            self._full_resize_u8 = jax.jit(
                full_resize_u8, static_argnums=(4, 5, 6),
                in_shardings=(None, self._x_sharding, None, None))
            self._full_pad_u8 = jax.jit(
                full_pad_u8, static_argnums=(2, 3, 4),
                in_shardings=(None, self._x_sharding))
            self._full_padref_u8 = jax.jit(
                full_padref_u8, static_argnums=(2, 3, 4, 5, 6),
                in_shardings=(None, self._x_sharding))
            self._quarter_u8 = jax.jit(
                quarter_flow_u8, static_argnums=(2,),
                in_shardings=(None, self._x_sharding))
        else:
            self._quarter_flow = jax.jit(quarter_flow)
            self._full_resize_u8 = jax.jit(full_resize_u8,
                                           static_argnums=(4, 5, 6))
            self._full_pad_u8 = jax.jit(full_pad_u8,
                                        static_argnums=(2, 3, 4))
            self._full_padref_u8 = jax.jit(full_padref_u8,
                                           static_argnums=(2, 3, 4, 5, 6))
            self._quarter_u8 = jax.jit(quarter_flow_u8, static_argnums=(2,))

        @functools.partial(jax.jit,
                           static_argnames=("height", "width", "align_corners"))
        def quarter_to_full(q, *, height, width, align_corners):
            if align_corners:
                return flow_resize(q, height, width)
            return upsample_flow_to(q, height, width)

        self._quarter_to_full = quarter_to_full

    def _fetch(self, arr) -> np.ndarray:
        """Device → host for a (possibly multi-process-sharded) output."""
        if self._replicate_out is not None and jax.process_count() > 1:
            arr = self._replicate_out(arr)
        return np.asarray(arr)

    # ---------------------------------------------------------- public API

    def flow_from_batch(self, x, out_size: Optional[Tuple[int, int]] = None,
                        align_corners: bool = False) -> jax.Array:
        """x: (B, H64, W64, 6) preprocessed input → flow at out_size
        (default: (H64, W64))."""
        q = self._quarter_flow(self.params, jnp.asarray(x))
        h, w = out_size if out_size is not None else x.shape[1:3]
        return self._quarter_to_full(q, height=int(h), width=int(w),
                                     align_corners=align_corners)

    def flow_from_pair(self, im1: np.ndarray, im2: np.ndarray, *,
                       preset: str = "bgr_unit",
                       size_mode: str = "resize",
                       image_size: Optional[Tuple[int, int]] = None
                       ) -> np.ndarray:
        """uint8 RGB frame pair → (H, W, 2) flow at the original resolution.

        ``size_mode="resize"`` follows the canonical CLI
        (``script_pwc.py:47-81``): distorting resize to /64, infer, resize the
        quarter-res flow straight back to (H, W), then scale u by W/W64 and v
        by H/H64.

        ``size_mode="pad"`` is the *corrected* evaluation-driver path:
        replicate-pad to /64, infer, upsample the quarter-res flow to the
        padded size (align_corners=True), crop to (H, W).  **Intentional
        divergence from the reference** (like the topview ×4 fix,
        ``viz/topview.py``): ``inference_kitti.py:216-224`` unpads the
        *quarter-res* flow by the *full-res* pad counts — removing 4× too
        many rows/cols — and then stretches what is left back over (H, W)
        with an anisotropic vector rescale, which distorts the flow field
        everywhere, not just at the border.  That looks like a pad-units
        bug, so it is not the default here.

        ``size_mode="pad_ref"`` reproduces the reference's order **exactly**
        (unpad-quarter-then-rescale) for bit-parity with metrics computed by
        ``inference_kitti.py`` itself.

        ``size_mode="resize_fixed"`` follows the v1 driver
        (``inference.py:296-324``): PIL-bilinear resize of the frames to the
        fixed ``image_size`` (default 384×1280 there), infer, PIL-bilinear
        resize of the quarter-res flow straight to (H, W) with vector
        rescale (``inference.py:162-190``).  ``image_size`` must be /64.
        """
        return self.flow_from_pairs([im1], [im2], preset=preset,
                                    size_mode=size_mode,
                                    image_size=image_size)[0]

    def flow_from_pairs(self, im1s, im2s, *, preset: str = "bgr_unit",
                        size_mode: str = "resize",
                        image_size: Optional[Tuple[int, int]] = None
                        ) -> np.ndarray:
        """Batched :meth:`flow_from_pair`: N frame pairs of ONE common
        original shape → (N, H, W, 2), through a single jitted program per
        (N, shape).  Constant-shape datasets (KITTI 1242×375, Sintel
        436×1024) evaluate as full batches instead of the reference's
        per-pair batch-1 loop (``inference_kitti.py:227-263``).  With a mesh,
        N is padded up to a multiple of the ``data`` axis size (repeating
        the last pair) and the padding rows are dropped from the output —
        dataset tails and single pairs shard transparently.
        """
        if len(im1s) != len(im2s) or not im1s:
            raise ValueError("im1s/im2s must be equal-length, non-empty")
        n = len(im1s)
        if self.mesh is not None:
            pad = -n % self.mesh.shape["data"]
            if pad:
                im1s = list(im1s) + [im1s[-1]] * pad
                im2s = list(im2s) + [im2s[-1]] * pad
        h, w = im1s[0].shape[:2]
        for im in (*im1s, *im2s):
            if im.shape[:2] != (h, w):
                raise ValueError(
                    "flow_from_pairs needs one common frame shape per call; "
                    f"got {im.shape[:2]} vs {(h, w)} — group by shape first")
        im1s = [_as_uint8_frame(im, "im1") for im in im1s]
        im2s = [_as_uint8_frame(im, "im2") for im in im2s]
        if size_mode == "resize":
            r1s = [imio.resize_to_multiple_of_64(im)[0] for im in im1s]
            r2s = [imio.resize_to_multiple_of_64(im)[0] for im in im2s]
            h64, w64 = r1s[0].shape[:2]
            # uint8 up, preprocess on device (4× less H2D than float32)
            x = np.stack([np.concatenate((a, b), axis=-1)
                          for a, b in zip(r1s, r2s)])
            flow = self._full_resize_u8(
                self.params, jnp.asarray(x),
                jnp.float32(h / float(h64)), jnp.float32(w / float(w64)),
                preset, h, w)
            return self._fetch(flow)[:n]
        if size_mode in ("pad", "pad_ref"):
            x = np.stack([np.concatenate((a, b), axis=-1)
                          for a, b in zip(im1s, im2s)])
            xp, ph, pw = imio.pad_to_multiple_of_64(x)
            hp, wp = xp.shape[1:3]
            if size_mode == "pad_ref":
                if ph >= hp // 4 or pw >= wp // 4:
                    raise ValueError(
                        "pad_ref (the reference's unpad-quarter-by-full-pad "
                        f"order) slices the quarter-res flow {hp // 4}x"
                        f"{wp // 4} by ({ph}, {pw}) — empty result for this "
                        "frame size; use size_mode='pad'")
                full = self._full_padref_u8(self.params, jnp.asarray(xp),
                                            preset, ph, pw, h, w)
                return self._fetch(full)[:n]
            full = self._full_pad_u8(self.params, jnp.asarray(xp), preset,
                                     hp, wp)
            return self._fetch(full[:, :h, :w])[:n]
        if size_mode == "resize_fixed":
            return self._flow_resize_fixed(im1s, im2s, preset, image_size,
                                           h, w)[:n]
        raise ValueError("size_mode must be 'resize', 'pad', 'pad_ref' or "
                         f"'resize_fixed', got {size_mode!r}")

    def _flow_resize_fixed(self, im1s, im2s, preset, image_size, h, w):
        """v1-driver semantics (``inference.py:296-324``): frames PIL-resized
        to a fixed /64 size on host (``transforms.Resize`` acts on the PIL
        image, so this is exact by construction), one u8 quarter-flow device
        program, then the reference's ``resize_flow`` (``inference.py:
        162-190``): per-channel PIL-bilinear resize of the quarter-res flow
        straight to the original (H, W) plus W/Wq, H/Hq vector rescale."""
        from PIL import Image
        if image_size is None:
            raise ValueError("size_mode='resize_fixed' needs image_size=(H, W)")
        fh, fw = (int(v) for v in image_size)
        if fh % 64 or fw % 64:
            raise ValueError(
                f"image_size must be a multiple of 64 (six stride-2 levels); "
                f"got {(fh, fw)} — the reference crashes on non-/64 sizes")
        def rs(im):
            return np.asarray(Image.fromarray(im).resize((fw, fh),
                                                         Image.BILINEAR))
        x = np.stack([np.concatenate((rs(a), rs(b)), axis=-1)
                      for a, b in zip(im1s, im2s)])
        q = self._fetch(self._quarter_u8(self.params, jnp.asarray(x), preset))
        qh, qw = q.shape[1:3]
        out = np.empty((q.shape[0], h, w, 2), np.float32)
        for i in range(q.shape[0]):
            u = Image.fromarray(q[i, :, :, 0]).resize((w, h), Image.BILINEAR)
            v = Image.fromarray(q[i, :, :, 1]).resize((w, h), Image.BILINEAR)
            out[i, :, :, 0] = np.asarray(u) * (w / float(qw))
            out[i, :, :, 1] = np.asarray(v) * (h / float(qh))
        return out

    def warmup(self, height: int, width: int, batch: int = 1,
               size_modes=("resize", "pad"), preset: str = "bgr_unit",
               quarter: bool = False,
               image_size: Optional[Tuple[int, int]] = None) -> None:
        """Pre-compile the programs :meth:`flow_from_pairs` will actually
        run for ``batch`` frames of this ORIGINAL (pre-/64) size — the
        fused u8 preprocess/forward/upsample pipelines, one per size mode.
        (Compiling only the float32 quarter-flow program, as this method
        once did, left the first real request to pay the full serving-path
        compile.)  ``quarter=True`` additionally compiles that float32
        program for :meth:`flow_from_batch` callers — each full-model
        compile is minutes on a cold cache, so it is opt-in."""
        z = np.zeros((height, width, 3), np.uint8)
        for mode in size_modes:
            self.flow_from_pairs([z] * batch, [z] * batch, preset=preset,
                                 size_mode=mode, image_size=image_size)
        if quarter:
            h64 = -(-height // 64) * 64
            w64 = -(-width // 64) * 64
            x = jnp.zeros((batch, h64, w64, 6), jnp.float32)
            jax.block_until_ready(self._quarter_flow(self.params, x))
