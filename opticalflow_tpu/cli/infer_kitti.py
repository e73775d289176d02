"""KITTI evaluation CLI (the ``inference_kitti.py`` equivalent).

Example::

    python -m opticalflow_tpu.cli.infer_kitti --root /data/kitti2015 \
        --ckpt ckpt.pth.tar --year 2015 --flow flow_occ --save-dir out/
"""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(description="KITTI flow evaluation (TPU)")
    p.add_argument("--root", required=True, help="KITTI dataset root")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--year", type=int, choices=(2012, 2015), default=2015)
    p.add_argument("--flow", dest="flow_kind", default="flow_occ",
                   choices=("flow_occ", "flow_noc"))
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--preset", default="rgb_imagenet",
                   help="rgb_imagenet matches the repo's fine-tuned ckpts; "
                        "bgr_unit for the canonical weights")
    p.add_argument("--flow-scale", type=float, default=1.0,
                   help="1.0 for GT-space checkpoints, 20.0 for canonical")
    p.add_argument("--size-mode", default="pad",
                   choices=("pad", "pad_ref", "resize", "resize_fixed"),
                   help="pad = corrected v2 pipeline (default); pad_ref = "
                        "the reference's exact inference_kitti.py order; "
                        "resize_fixed = the v1 inference.py driver "
                        "(needs --image-size)")
    p.add_argument("--image-size", type=int, nargs=2, metavar=("H", "W"),
                   default=None,
                   help="fixed /64 input size for --size-mode resize_fixed "
                        "(the v1 driver's transforms.Resize, default there "
                        "384 1280 — inference.py:296-310)")
    p.add_argument("--save-dir", default=None,
                   help="optionally dump predicted flows as KITTI PNGs")
    p.add_argument("--batch", type=int, default=8,
                   help="pairs per jitted program (multiple of the mesh "
                        "data axis when sharded)")
    p.add_argument("--dispatch-chunk", type=int, default=None,
                   help="run batches as lax.map over sub-chunks of this "
                        "size inside one program; 8 keeps the peak XLA "
                        "schedule at any multiple-of-8 --batch (PERF.md "
                        "batch-cliff sweep)")
    p.add_argument("--data-parallel", default="1", metavar="N|all",
                   help="shard each evaluation batch across N chips "
                        "(data-parallel mesh; 'all' = every visible "
                        "device; --batch must divide by N; mutually "
                        "exclusive with --dispatch-chunk)")
    p.add_argument("--limit", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.evaluate import evaluate_kitti
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.parallel.mesh import (check_eval_cli_mesh_args,
                                               resolve_data_parallel)
    from opticalflow_tpu.train.checkpoints import load_params

    try:
        mesh = resolve_data_parallel(args.data_parallel)
    except ValueError as e:
        raise SystemExit(str(e))
    check_eval_cli_mesh_args(mesh, args.dispatch_chunk, args.batch)
    model = PWCDCNet(variant=args.variant)
    params = load_params(args.ckpt, variant=args.variant)
    engine = FlowEngine(model, params, flow_scale=args.flow_scale,
                        mesh=mesh, dispatch_chunk=args.dispatch_chunk)
    if args.size_mode == "resize_fixed" and args.image_size is None:
        args.image_size = [384, 1280]   # the v1 driver's default
    res = evaluate_kitti(engine, args.root, year=args.year,
                         flow_kind=args.flow_kind, preset=args.preset,
                         size_mode=args.size_mode,
                         image_size=args.image_size,
                         batch=args.batch, save_dir=args.save_dir,
                         limit=args.limit)
    return 0 if res["num_pairs"] else 1


if __name__ == "__main__":
    sys.exit(main())
