"""Streaming video → flow pipeline with host-decode / device-compute overlap.

Replaces the reference's fully serial loop (``pwc_extract_flow_video.py:219-
308``: decode → H2D → forward → D2H → draw → encode one pair at a time) with
a pipelined runner:

  * a decode thread fills a frame queue (cv2.VideoCapture stays on host);
  * each frame is decoded AND uploaded once: the device step takes a window
    of B+1 consecutive uint8 frames and forms the B pairs on device (the
    reference — and a naive pair-tensor batching — transfers every interior
    frame twice; halving H2D matters on any PCIe/relay-attached host);
  * preprocessing (/255, channel order, optional ImageNet norm) runs *inside*
    the jitted program on device;
  * JAX's async dispatch keeps ``depth`` batches in flight: the host draws
    overlays for batch k while the TPU computes batch k+1;
  * the device returns quarter-resolution flow (16× less D2H traffic); the
    overlay helpers rescale vectors on host exactly like the reference's
    ``create_quiver_frame`` resize.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from opticalflow_tpu.models.pwcnet import PWCDCNet

__all__ = ["VideoFlowRunner", "frame_pairs_from_video", "decimate_flow",
           "yuv_i420_to_rgb_u8"]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def yuv_i420_to_rgb_u8(yuv: jnp.ndarray) -> jnp.ndarray:
    """On-device I420 → RGB, bit-exact to ``cv2.COLOR_YUV2BGR_I420``.

    ``yuv`` is (B, H·3/2, W) uint8 — the packed planar layout
    ``cv2.cvtColor(..., COLOR_BGR2YUV_I420)`` emits (full-res Y plane, then
    the 2×-subsampled U and V planes each reshaped to H/4 rows of W).
    Replicates OpenCV's integer math exactly: BT.601 video-range constants
    at shift 20 with round-half-up descale and 2×2 nearest chroma
    upsampling, so a host cv2 round-trip and this kernel produce identical
    uint8 frames (``tests/test_i420.py``).  H and W must be even (the
    runner pads odd frames by one edge px before converting).
    """
    b, h32, w = yuv.shape
    if h32 % 3 or (h32 * 2 // 3) % 2 or w % 2:
        raise ValueError(
            f"bad I420 packed shape {yuv.shape}: rows must be H*3/2 with "
            f"H and W even (got packed rows {h32}, width {w})")
    h = h32 * 2 // 3
    y = jnp.maximum(yuv[:, :h].astype(jnp.int32) - 16, 0) * 1220542
    # the chroma region packs U then V contiguously; when h % 4 != 0 the
    # U/V boundary falls mid-row, so slice by ELEMENT count, not rows
    # (h=70: U is 17.5 rows of w — a row slice would crash the reshape)
    ce = (h // 2) * (w // 2)
    chroma = yuv[:, h:].reshape(b, 2 * ce)
    u = chroma[:, :ce].reshape(b, h // 2, w // 2).astype(jnp.int32) - 128
    v = chroma[:, ce:].reshape(b, h // 2, w // 2).astype(jnp.int32) - 128
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    half = 1 << 19
    r = (y + 1673527 * v + half) >> 20
    g = (y - 852492 * v - 409993 * u + half) >> 20
    bl = (y + 2116026 * u + half) >> 20
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0, 255).astype(jnp.uint8)


def decimate_flow(flow: jnp.ndarray, grid_step: int, frame_h: int,
                  frame_w: int) -> jnp.ndarray:
    """On-device grid decimation of quarter-res flow before D2H.

    Replicates the host path exactly — ``resize_flow_np(flow, frame_h,
    frame_w)`` (cv2 INTER_LINEAR half-pixel mapping + vector rescale
    ``frame_w/Wq``, ``frame_h/Hq``) read at every ``grid_step``-th full-res
    pixel — but samples the (B, Hq, Wq, 2) field directly on device.  The
    arrow/vanish overlays read only every 16th pixel, so shipping the grid
    instead of the quarter field cuts the readback ~16× (~256× vs full-res;
    VERDICT round-2 task 3).  Output ``g[b, i, j]`` is the full-res-pixel-
    units flow vector at frame pixel ``(j*grid_step, i*grid_step)``.
    """
    b, hq, wq, _ = flow.shape
    gy = jnp.arange(0, frame_h, grid_step, dtype=jnp.float32)
    gx = jnp.arange(0, frame_w, grid_step, dtype=jnp.float32)
    fy = jnp.clip((gy + 0.5) * (hq / frame_h) - 0.5, 0.0, hq - 1.0)
    fx = jnp.clip((gx + 0.5) * (wq / frame_w) - 0.5, 0.0, wq - 1.0)
    y0 = jnp.minimum(jnp.floor(fy).astype(jnp.int32), max(hq - 2, 0))
    x0 = jnp.minimum(jnp.floor(fx).astype(jnp.int32), max(wq - 2, 0))
    wy = (fy - y0)[None, :, None, None]
    wx = (fx - x0)[None, None, :, None]
    r0 = flow[:, y0]
    r1 = flow[:, jnp.minimum(y0 + 1, hq - 1)]
    x1 = jnp.minimum(x0 + 1, wq - 1)
    top = r0[:, :, x0] * (1 - wx) + r0[:, :, x1] * wx
    bot = r1[:, :, x0] * (1 - wx) + r1[:, :, x1] * wx
    out = top * (1 - wy) + bot * wy
    return out * jnp.array([frame_w / wq, frame_h / hq], out.dtype)


def frame_pairs_from_video(path: str, max_frames: Optional[int] = None,
                           stride: int = 1) -> Iterator[np.ndarray]:
    """Yield BGR frames from a video file (decode thread feeds a queue)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {path}")
    q: "queue.Queue" = queue.Queue(maxsize=64)

    def decode():
        n = 0
        while max_frames is None or n < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if n % stride == 0:
                q.put(frame)
            n += 1
        cap.release()
        q.put(None)

    threading.Thread(target=decode, daemon=True).start()
    while True:
        f = q.get()
        if f is None:
            return
        yield f


class VideoFlowRunner:
    """Batched streaming flow over consecutive frame pairs.

    Args:
      model/params: the network (flow in network units).
      preset: "rgb_unit" (video drivers' convention,
        ``pwc_extract_flow_video.py:27-34``), "bgr_unit", or "rgb_imagenet".
      flow_scale: 1.0 for the repo's self-trained checkpoints, 20.0 for the
        canonical Sintel weights.
      batch: frame pairs per device step.  depth: in-flight batches.
      upload: "bgr" ships full RGB uint8 windows; "i420" converts each
        padded frame to planar YUV 4:2:0 on host (cv2, ~0.4 ms/frame) and
        unpacks on device with a cv2-bit-exact integer kernel — half the
        H2D bytes, which is the end-to-end wall on bandwidth-starved
        (PCIe/relay) hosts.  The only fidelity cost is the 4:2:0 chroma
        subsample itself; for video inputs that is usually nothing new —
        mp4/h264 content is already chroma-subsampled by the encoder.
    """

    def __init__(self, model: PWCDCNet, params, *, preset: str = "rgb_unit",
                 flow_scale: float = 1.0, batch: int = 4, depth: int = 2,
                 mesh=None, grid_step: Optional[int] = None,
                 upload: str = "bgr"):
        if preset not in ("rgb_unit", "bgr_unit", "rgb_imagenet"):
            raise ValueError(f"unknown preprocessing preset {preset!r}")
        if upload not in ("bgr", "i420"):
            raise ValueError(f"unknown upload mode {upload!r}")
        self.upload = upload
        self.model = model
        self.preset = preset
        self.flow_scale = float(flow_scale)
        self.batch = batch
        self.depth = depth
        self.mesh = mesh
        self.grid_step = grid_step
        pair_sharding = None
        self._frames_sharding = None
        if mesh is not None:
            from opticalflow_tpu.parallel.mesh import (batch_sharding,
                                                       replicated)
            if batch % mesh.devices.size:
                raise ValueError(
                    f"batch {batch} not divisible by mesh size "
                    f"{mesh.devices.size}")
            pair_sharding = batch_sharding(mesh)
            params = jax.device_put(params, replicated(mesh))
            # Frames upload exactly once: H-sharded across the mesh, each
            # device receives its stripe so total H2D equals the array size;
            # the pair reshard below then rides the device interconnect.  An
            # uncommitted numpy arg would let GSPMD replicate it host-side —
            # one H2D per device, ruinous on a PCIe/relay-attached host.
            # (Same device set as the replicated params, which a
            # SingleDeviceSharding would violate inside jit.)
            axis = mesh.axis_names[0]
            self._frames_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, axis))
            self._frames_replicated = replicated(mesh)
        self.params = jax.tree.map(jnp.asarray, params)

        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        scale = self.flow_scale

        def step(params, frames_u8, frame_h, frame_w):
            # frames_u8: (B+1, H64, W64, 3) RGB — B pairs formed on device —
            # or (B+1, He·3/2, We) planar I420 at the UNPADDED (even) frame
            # size: half the H2D bytes AND no padding bytes on the wire;
            # the device unpacks with the cv2-bit-exact integer kernel
            # above, then edge-pads to /64 (what the host did in bgr mode)
            if upload == "i420":
                frames_u8 = yuv_i420_to_rgb_u8(frames_u8)
                he, we = frames_u8.shape[1], frames_u8.shape[2]
                ph, pw = (64 - he % 64) % 64, (64 - we % 64) % 64
                if ph or pw:
                    frames_u8 = jnp.pad(frames_u8,
                                        ((0, 0), (0, ph), (0, pw), (0, 0)),
                                        mode="edge")
            x = frames_u8.astype(jnp.float32) / 255.0
            if preset == "bgr_unit":
                x = x[..., ::-1]
            elif preset == "rgb_imagenet":
                x = (x - mean) / std
            pairs = jnp.concatenate([x[:-1], x[1:]], axis=-1)
            if pair_sharding is not None:
                pairs = jax.lax.with_sharding_constraint(pairs, pair_sharding)
            flow = self.model.apply({"params": params}, pairs) * scale
            if grid_step is not None:
                flow = decimate_flow(flow, grid_step, frame_h, frame_w)
            return flow

        # frame_h/frame_w static: constant per stream, one trace per size
        self._step = jax.jit(step, static_argnums=(2, 3))

    def _pad(self, frame: np.ndarray) -> np.ndarray:
        h, w = frame.shape[:2]
        ph, pw = (64 - h % 64) % 64, (64 - w % 64) % 64
        if ph or pw:
            frame = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")
        return frame

    def run(self, frames: Iterator[np.ndarray],
            channel_order: str = "bgr"
            ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (frame_t, frame_t1, quarter_flow) per consecutive pair —
        both original frames, so consumers (e.g. the OpenCV-flow comparison
        mode) see the exact pair the flow belongs to.

        ``quarter_flow`` is (H64/4, W64/4, 2) in pixel units at that scale —
        pass through ``viz.overlay.resize_flow_np`` (done by the overlay
        helpers) to draw at frame resolution.  With ``grid_step`` set the
        third element is instead the device-decimated (gh, gw, 2) grid in
        full-res pixel units (see :func:`decimate_flow`) — pass it to the
        overlay helpers with the same ``grid_step``.
        """
        inflight = collections.deque()
        buf = []          # padded frames in the current window (B+1 of them)
        metas = []        # original frames per pair, for overlay
        prev = None

        def submit():
            nonlocal buf, metas
            if not metas:
                return
            n_real = len(metas)
            carry = buf[-1]
            # pad a final partial window up to the compiled B+1 frames: one
            # XLA program for the whole stream instead of a second compile
            while len(buf) < self.batch + 1:
                buf.append(buf[-1])
            arr = np.stack(buf)  # (B+1, H64, W64, 3) uint8, each frame once
            if self._frames_sharding is not None:
                sh = (self._frames_sharding
                      if arr.shape[1] % self.mesh.devices.size == 0
                      else self._frames_replicated)
                arr = jax.device_put(arr, sh)
            fh, fw = metas[0][0].shape[:2]  # real (unpadded) frame size
            out = self._step(self.params, arr, fh, fw)
            inflight.append((out, n_real, metas))
            # the window boundary frame opens the next window (it is the
            # first element of that window's first pair) — re-uploaded once
            # per window, not once per pair
            buf, metas = [carry], []

        to_i420 = None
        if self.upload == "i420":
            import cv2

            def to_i420(f):
                # I420 needs even dims: edge-pad at most 1 px here, ship the
                # frame otherwise UNPADDED (the /64 edge-pad happens on
                # device — padding bytes never cross the host↔device link);
                # ~0.4 ms/frame host cost vs ~halving the H2D bytes
                h, w = f.shape[:2]
                if h % 2 or w % 2:
                    f = np.pad(f, ((0, h % 2), (0, w % 2), (0, 0)),
                               mode="edge")
                return cv2.cvtColor(np.ascontiguousarray(f),
                                    cv2.COLOR_RGB2YUV_I420)

        for frame in frames:
            rgb = frame[..., ::-1] if channel_order == "bgr" else frame
            buf.append(to_i420(rgb) if to_i420 else self._pad(rgb))
            if prev is not None:
                metas.append((prev, frame))
                if len(metas) == self.batch:
                    submit()
            prev = frame
            while len(inflight) > self.depth:
                yield from _drain(inflight.popleft())
        submit()
        while inflight:
            yield from _drain(inflight.popleft())


def _drain(entry):
    """One host readback per window: ``np.asarray(out)`` transfers the whole
    batch in a single D2H; per-pair ``np.asarray(out[k])`` readbacks cost a
    full device round-trip each (~30 ms behind a relay — they dominated the
    streaming loop at 8 round-trips per window; PERF.md round-2 log)."""
    out, n_real, ms = entry
    out_np = np.asarray(out)[:n_real]
    for k, (m0, m1) in enumerate(ms):
        yield m0, m1, out_np[k]
