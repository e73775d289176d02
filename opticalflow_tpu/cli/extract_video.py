"""Streaming video flow extraction CLI (the ``pwc_extract_flow_video.py`` /
``..._vanishpoint.py`` equivalent): video in → overlay video out.

Overlay modes:
  * ``arrows``      — cv2 arrow quiver (default)
  * ``color``       — Middlebury color-wheel side
  * ``vanish``      — arrows + vanishing-point marker
  * ``compare``     — side-by-side with an OpenCV flow baseline
  * ``topview``     — perspective-warp to top view, dominant-direction arrows
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description="Video optical-flow extraction (TPU)")
    p.add_argument("video")
    p.add_argument("out", help="output video path (.mp4)")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--mode", default="arrows",
                   choices=("arrows", "color", "vanish", "compare", "topview"))
    p.add_argument("--preset", default="rgb_unit")
    p.add_argument("--flow-scale", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--step", type=int, default=16, help="arrow grid stride")
    p.add_argument("--arrow-scale", type=float, default=1.0)
    p.add_argument("--shrink", type=float, default=1.0,
                   help="vanish mode: shrink-to-center canvas ratio (<1 "
                        "shows off-frame vanishing points on black margin)")
    p.add_argument("--compare-method", default="farneback",
                   choices=("farneback", "dis", "lucaskanade_dense"))
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--no-decimate", action="store_true",
                   help="arrows/vanish: ship the full quarter-res flow "
                        "instead of the device-decimated arrow grid "
                        "(debugging aid; ~16x more D2H)")
    p.add_argument("--upload", choices=("bgr", "i420"), default="bgr",
                   help="i420: upload planar YUV 4:2:0 windows (half the "
                        "H2D bytes, decoded on device bit-exactly to cv2); "
                        "only approximation is the 4:2:0 chroma subsample "
                        "mp4/h264 sources already carry")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="bfloat16")
    p.add_argument("--complexity", action="store_true",
                   help="print the per-layer params/FLOPs table at model "
                        "load (the reference's ptflops print)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import cv2
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.checkpoints import load_params
    from opticalflow_tpu.video import VideoFlowRunner, frame_pairs_from_video
    from opticalflow_tpu.viz import overlay as ov
    from opticalflow_tpu.runtime.flowviz import (flow_to_color_native,
                                                 resize_flow_native)
    from opticalflow_tpu.viz.vanishing import (estimate_vanishing_point,
                                               draw_vanishing_point,
                                               vanish_frame)
    from opticalflow_tpu.viz import topview as tv

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = PWCDCNet(variant=args.variant, dtype=dtype,
                     precision="fast" if args.dtype == "bfloat16"
                     else "highest")
    params = load_params(args.ckpt, variant=args.variant)
    if args.complexity:
        from opticalflow_tpu.utils.profiling import (model_complexity,
                                                     per_layer_complexity)
        print(per_layer_complexity(PWCDCNet(variant=args.variant,
                                            use_pallas_corr=False)))
        rep = model_complexity(PWCDCNet(variant=args.variant,
                                        use_pallas_corr=False), params)
        print(f"params: {rep['params_m']:.2f} M"
              + (f"   {rep['gmacs']:.1f} GMac @ {rep['input_shape']}"
                 if 'gmacs' in rep else ""))
    from opticalflow_tpu.utils.profiling import param_count
    print(f"model: PWCDCNet[{args.variant}] {param_count(params)/1e6:.2f}M "
          f"params, {args.dtype}")  # the reference prints ptflops at load
    # arrows/vanish read only every --step-th pixel: decimate on device so
    # the D2H ships the arrow grid, not the quarter-res field (~16x less)
    gstep = (args.step if args.mode in ("arrows", "vanish")
             and not args.no_decimate else None)
    runner = VideoFlowRunner(model, params, preset=args.preset,
                             flow_scale=args.flow_scale, batch=args.batch,
                             grid_step=gstep, upload=args.upload)

    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    out_w = w * 2 if args.mode in ("color", "compare") else w
    from opticalflow_tpu.io.video import AsyncVideoWriter
    writer = AsyncVideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (out_w, h))

    tv_matrix = tv.perspective_matrix(w, h) if args.mode == "topview" else None
    frames = frame_pairs_from_video(args.video, max_frames=args.max_frames)
    if args.mode == "topview":
        frames = (tv.warp_topview(f, tv_matrix) for f in frames)

    n = 0
    t0 = None  # start timing after the first (compile-laden) result
    for frame, frame2, qflow in runner.run(frames):
        if t0 is None:
            t0 = time.perf_counter()
        if args.mode == "arrows":
            out = ov.arrow_overlay(frame, qflow, step=args.step,
                                   scale=args.arrow_scale,
                                   title="PWC-Net (TPU)", grid_step=gstep)
        elif args.mode == "color":
            full = resize_flow_native(qflow, h, w)
            out = ov.side_by_side(frame,
                                  flow_to_color_native(full)[..., ::-1])
        elif args.mode == "vanish":
            if args.shrink < 1.0:
                out = vanish_frame(frame, qflow, step=args.step,
                                   scale=args.arrow_scale,
                                   shrink_ratio=args.shrink,
                                   title="PWC-Net VP (TPU)",
                                   grid_step=gstep)
            else:
                if gstep is None:  # --no-decimate: full-res field on host
                    qflow = resize_flow_native(qflow, h, w)
                out = ov.arrow_overlay(frame, qflow, step=args.step,
                                       scale=args.arrow_scale,
                                       grid_step=gstep)
                out = draw_vanishing_point(
                    out, estimate_vanishing_point(
                        qflow, step=args.step, grid_step=gstep,
                        frame_hw=(h, w)))
        elif args.mode == "compare":
            left = ov.arrow_overlay(frame, qflow, step=args.step,
                                    scale=args.arrow_scale, title="PWC-Net")
            base = ov.opencv_flow(frame, frame2, args.compare_method)
            right = ov.arrow_overlay(frame, base, step=args.step,
                                     scale=args.arrow_scale,
                                     title=args.compare_method, color="lime")
            out = ov.side_by_side(left, right)
        else:  # topview
            full = ov.resize_flow_np(qflow, h, w)
            dom = tv.dominant_direction(full)
            out = tv.draw_direction_arrows(frame, full, step=20,
                                           scale=5.0, dominant=dom)
        writer.write(out[:h, :out_w])
        n += 1
    writer.release()
    dt = (time.perf_counter() - t0) if t0 is not None else 0.0
    fps_out = (n - 1) / dt if (n > 1 and dt > 0) else float("nan")
    print(f"{n} frame pairs -> {args.out}  ({fps_out:.1f} fps steady-state)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
