"""Export + parity harness CLI (the ``pth2onnx.py`` + ``onnx_pth_compare.py``
equivalent): serialize the model to a StableHLO artifact, run source model and
artifact on the same input, and report the full numerical-agreement metric set
with an optional 2×2 comparison image."""

from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(
        description="Export a StableHLO artifact and check numerical parity")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--artifact", default="model.stablehlo",
                   help="output/input artifact path")
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--shape", type=int, nargs=3, default=(1, 256, 256),
                   metavar=("B", "H", "W"))
    p.add_argument("--flow-scale", type=float, default=20.0)
    p.add_argument("--report-image", default=None,
                   help="write the 2x2 comparison figure here")
    p.add_argument("--skip-export", action="store_true",
                   help="reuse an existing artifact")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from opticalflow_tpu.export import export_stablehlo, parity_check
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.checkpoints import load_params

    model = PWCDCNet(variant=args.variant)
    params = load_params(args.ckpt, variant=args.variant)
    b, h, w = args.shape
    input_shape = (b, h, w, 6)
    if not args.skip_export:
        path = export_stablehlo(model, params, args.artifact,
                                input_shape=input_shape,
                                flow_scale=args.flow_scale)
        print(f"exported {path}")
    rep = parity_check(model, params, args.artifact,
                       input_shape=input_shape, flow_scale=args.flow_scale,
                       report_image=args.report_image)
    print(json.dumps(rep, indent=2))
    ok = rep.get("epe_mean", 1.0) <= 0.01
    print("PARITY:", "PASS" if ok else "FAIL", "(epe_mean <= 0.01)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
