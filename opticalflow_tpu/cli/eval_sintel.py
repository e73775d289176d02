"""MPI-Sintel EPE evaluation CLI (the README:36 benchmark: clean 1.83 /
final 2.31 with the canonical weights)."""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(description="Sintel EPE evaluation (TPU)")
    p.add_argument("--root", required=True, help="MPI-Sintel root")
    p.add_argument("--render", choices=("clean", "final"), default="clean")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--preset", default="bgr_unit")
    p.add_argument("--flow-scale", type=float, default=20.0)
    p.add_argument("--save-dir", default=None,
                   help="optionally dump predicted flows as .flo files")
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
    from opticalflow_tpu.evaluate import evaluate_sintel
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
    res = evaluate_sintel(engine, args.root, render=args.render,
                          preset=args.preset, batch=args.batch,
                          save_dir=args.save_dir, limit=args.limit)
    return 0 if res["num_pairs"] else 1


if __name__ == "__main__":
    sys.exit(main())
