"""Canonical single-pair CLI: image pair in → Middlebury ``.flo`` out.

The public contract preserved from the reference (``script_pwc.py:30-83``,
README "python script_pwc.py im1 im2 out.flo"):

  * positional args: im1, im2, output .flo (all optional with the same
    defaults as the reference);
  * preprocessing: distorting resize to ceil(/64)·64, BGR order, /255;
  * model output × 20.0, resized back to the original size with u·W/W64,
    v·H/H64 vector rescale;
  * `.flo` written with tag 202021.25, W, H, interleaved float32.

TPU-native difference: everything between decode and the final write runs as
one jit-compiled XLA program (see ``opticalflow_tpu.engine.FlowEngine``).
"""

from __future__ import annotations

import argparse
import os
import sys

from opticalflow_tpu.io.flo import write_flo
from opticalflow_tpu.io.images import load_image


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="PWC-Net optical flow: frame pair -> .flo (TPU)")
    p.add_argument("im1", nargs="?", default="data/frame_0010.png")
    p.add_argument("im2", nargs="?", default="data/frame_0011.png")
    p.add_argument("out", nargs="?", default="./tmp/frame_0010.flo")
    p.add_argument("--ckpt", default="./pwc_net.pth.tar",
                   help="torch .pth(.tar) or Orbax checkpoint to load")
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--preset", default="bgr_unit",
                   help="preprocessing preset (bgr_unit for canonical weights)")
    p.add_argument("--flow-scale", type=float, default=20.0)
    p.add_argument("--size-mode", choices=("resize", "pad"), default="resize")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.checkpoints import load_params

    model = PWCDCNet(variant=args.variant,
                     dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                     else jnp.float32)
    params = load_params(args.ckpt, variant=args.variant)
    engine = FlowEngine(model, params, flow_scale=args.flow_scale)

    im1 = load_image(args.im1)
    im2 = load_image(args.im2)
    flow = engine.flow_from_pair(im1, im2, preset=args.preset,
                                 size_mode=args.size_mode)
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    write_flo(args.out, flow)
    print(f"wrote {args.out}  ({flow.shape[0]}x{flow.shape[1]}, "
          f"|flow| max {abs(flow).max():.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
