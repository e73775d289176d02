"""Single-pair flow extractor with visual outputs (the ``pwc_extract_flow.py``
equivalent): pad-to-/64 inference, saves ``.npy`` + ``.flo`` + Middlebury
color-wheel PNG + a quiver overlay figure."""

from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(
        description="Extract flow for one frame pair with visualizations")
    p.add_argument("im1")
    p.add_argument("im2")
    p.add_argument("--out-dir", default="flow_out")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--preset", default="rgb_unit",
                   help="the reference extractor feeds RGB /255 "
                        "(pwc_extract_flow.py:141-180)")
    p.add_argument("--flow-scale", type=float, default=1.0)
    p.add_argument("--step", type=int, default=16)
    p.add_argument("--quiver-scale", type=float, default=1.0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import numpy as np
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.io.flo import write_flo
    from opticalflow_tpu.io.images import load_image
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.checkpoints import load_params
    from opticalflow_tpu.runtime.flowviz import flow_to_color_native
    from opticalflow_tpu.viz.overlay import quiver_figure

    model = PWCDCNet(variant=args.variant)
    params = load_params(args.ckpt, variant=args.variant)
    engine = FlowEngine(model, params, flow_scale=args.flow_scale)

    im1 = load_image(args.im1)
    im2 = load_image(args.im2)
    flow = engine.flow_from_pair(im1, im2, preset=args.preset,
                                 size_mode="pad")

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.im1))[0]
    np.save(os.path.join(args.out_dir, f"{stem}_flow.npy"), flow)
    write_flo(os.path.join(args.out_dir, f"{stem}.flo"), flow)

    color = flow_to_color_native(flow)
    try:
        import imageio.v2 as imageio
        imageio.imwrite(os.path.join(args.out_dir, f"{stem}_color.png"),
                        color)
    except ImportError:
        from PIL import Image
        Image.fromarray(color).save(
            os.path.join(args.out_dir, f"{stem}_color.png"))
    quiver_figure(im1, flow, os.path.join(args.out_dir, f"{stem}_quiver.png"),
                  step=args.step, scale=args.quiver_scale)
    print(f"wrote {args.out_dir}/{stem}{{.flo,_flow.npy,_color.png,"
          f"_quiver.png}}  |flow| max {abs(flow).max():.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
