"""Checkpoint converter: torch ``.pth(.tar)`` ⇄ Orbax.

Forward direction imports any reference checkpoint layout into the
framework's native format; ``--to-torch`` exports a trained Orbax checkpoint
back to a reference-loadable state_dict (saved with ``torch.save``), closing
the interop loop.
"""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser(description="Convert PWC-Net checkpoints")
    p.add_argument("src", help="source checkpoint (.pth/.pth.tar or Orbax dir)")
    p.add_argument("dst", help="destination (Orbax dir, or .pth.tar with "
                               "--to-torch)")
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--to-torch", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from opticalflow_tpu.train import checkpoints as C

    if args.to_torch:
        import torch
        from opticalflow_tpu.models.torch_import import export_state_dict
        params = C.load_params(args.src, variant=args.variant)
        sd = export_state_dict(params, variant=args.variant)
        torch.save({"state_dict": {k: torch.from_numpy(v)
                                   for k, v in sd.items()}}, args.dst)
        print(f"wrote torch checkpoint {args.dst} ({len(sd)} tensors)")
        return 0

    params = C.load_params(args.src, variant=args.variant)
    path = C.save_train_state(args.dst, 0, params,
                              metadata={"source": args.src,
                                        "variant": args.variant})
    print(f"wrote Orbax checkpoint {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
