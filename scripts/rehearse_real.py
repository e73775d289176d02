"""Turnkey real-data fidelity rehearsal (VERDICT r4 task 5).

No real weights or datasets exist in the build environment, so the north
star — mean EPE delta ≤0.01 vs the reference running ``pwc_net.pth.tar``,
and Sintel clean/final 1.83/2.31 (``/root/reference/README.md:36``) — is
demonstrated there only against torch-oracle transcriptions.  This script
makes the final check a single command for anyone who *does* have the data:

    python scripts/rehearse_real.py --ckpt pwc_net.pth.tar \
        --sintel-root /data/MPI-Sintel [--kitti-root /data/KITTI2015] \
        [--limit N] [--expect-published]

Steps (each prints a PASS/FAIL row):
  1. checkpoint import   — torch state_dict → param tree, validated;
  2. canonical-pair EPE delta — one Sintel pair through BOTH the
     torch-CPU oracle running the reference's exact ``script_pwc.py:43-81``
     pipeline AND this framework's engine (float32/"highest"); the delta
     must be ≤ 0.01 px (north star; measured 1e-6-class on fake weights);
  3. Sintel clean / final EPE over the training split vs the published
     1.83 / 2.31 (``inference_kitti.py:227-263`` metric semantics);
  4. optional KITTI epe/Fl-all (no published target in the reference).

Exit code: 0 if every *fidelity* gate passes (import + EPE delta); the
published-EPE rows additionally gate the exit code only under
``--expect-published`` (with partial ``--limit`` runs or re-trained
weights the published averages don't apply).  The harness itself is
exercised against a synthetic fixture tree in
``tests/test_rehearse_real.py``, so the one command that matters on a
real-data host is known to run end-to-end.
"""

import argparse
import os
import sys
from math import ceil

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SINTEL_PUBLISHED = {"clean": 1.83, "final": 2.31}  # reference README.md:36
EPE_DELTA_BUDGET = 0.01                            # BASELINE.json north star
PUBLISHED_TOL = 0.01


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, help="pwc_net.pth.tar")
    p.add_argument("--sintel-root", default=None, help="MPI-Sintel root "
                   "(contains training/{clean,final,flow})")
    p.add_argument("--kitti-root", default=None,
                   help="KITTI scene-flow root (training/{image_2,flow_occ})")
    p.add_argument("--kitti-year", type=int, default=2015)
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N pairs per split")
    p.add_argument("--renders", nargs="+", default=["clean", "final"],
                   choices=("clean", "final"))
    p.add_argument("--expect-published", action="store_true",
                   help="gate the exit code on matching the published "
                   "Sintel 1.83/2.31 averages (full split, canonical "
                   "weights only)")
    p.add_argument("--skip-oracle", action="store_true",
                   help="skip the torch-oracle canonical-pair delta "
                   "(e.g. no torch on the eval host)")
    return p


def canonical_pair(sintel_root: str, render: str):
    """Pick one real frame pair: frame_0010/frame_0011 of the first
    sequence that has them (BASELINE.json config 1 names that pair),
    falling back to the first adjacent pair found."""
    from glob import glob
    img_root = os.path.join(sintel_root, "training", render)
    for seq in sorted(os.listdir(img_root)):
        a = os.path.join(img_root, seq, "frame_0010.png")
        b = os.path.join(img_root, seq, "frame_0011.png")
        if os.path.isfile(a) and os.path.isfile(b):
            return a, b
    for seq in sorted(os.listdir(img_root)):
        frames = sorted(glob(os.path.join(img_root, seq, "frame_*.png")))
        if len(frames) >= 2:
            return frames[0], frames[1]
    raise FileNotFoundError(f"no frame pairs under {img_root}")


def oracle_reference_flow(im1_rgb, im2_rgb, ckpt_path: str, variant: str):
    """The reference's canonical pipeline (``script_pwc.py:43-81``) run on
    CPU torch with the real weights — resize to /64, BGR /255, forward,
    ×20, resize back with u·W/W64, v·H/H64 vector rescale."""
    import cv2
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from oracles.torch_pwcnet import OraclePWC

    from opticalflow_tpu.models.torch_import import load_torch_state_dict

    net = OraclePWC(variant=variant).eval()
    sd = load_torch_state_dict(ckpt_path)
    own = net.state_dict()
    mapped = {f"m.{k}": torch.from_numpy(v) for k, v in sd.items()
              if f"m.{k}" in own}  # skips the dead deconv2 in real ckpts
    missing = set(own) - set(mapped)
    if missing:
        raise KeyError(f"oracle is missing {sorted(missing)[:4]}... "
                       f"({len(missing)} keys) from {ckpt_path}")
    net.load_state_dict(mapped)

    h, w = im1_rgb.shape[:2]
    h64 = int(ceil(h / 64.0) * 64)
    w64 = int(ceil(w / 64.0) * 64)
    tens = []
    for im in (im1_rgb, im2_rgb):
        im = cv2.resize(im, (w64, h64))
        im = im[:, :, ::-1]                   # RGB -> BGR
        im = 1.0 * im / 255.0
        tens.append(torch.from_numpy(
            np.transpose(im, (2, 0, 1)).copy()).float()[None])
    with torch.no_grad():
        flo = net(torch.cat(tens, 1), train=False)
    flo = (flo[0] * 20.0).numpy()
    flo = np.swapaxes(np.swapaxes(flo, 0, 1), 1, 2)
    u = cv2.resize(flo[:, :, 0], (w, h)) * (w / float(w64))
    v = cv2.resize(flo[:, :, 1], (w, h)) * (h / float(h64))
    return np.dstack((u, v)).astype(np.float32)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import numpy as np

    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.checkpoints import load_params

    rows = []  # (name, value_str, passed or None)

    # 1. import --------------------------------------------------------
    try:
        params = load_params(args.ckpt, variant=args.variant)
        rows.append(("checkpoint import", os.path.basename(args.ckpt), True))
    except Exception as e:
        rows.append(("checkpoint import", f"{type(e).__name__}: {e}", False))
        _print_table(rows)
        return 1

    import jax.numpy as jnp
    engine = FlowEngine(
        PWCDCNet(variant=args.variant, dtype=jnp.float32,
                 precision="highest"), params)

    # 2. canonical-pair EPE delta vs the reference pipeline ------------
    if args.sintel_root and not args.skip_oracle:
        from opticalflow_tpu.io.images import load_image
        p1, p2 = canonical_pair(args.sintel_root, args.renders[0])
        im1, im2 = load_image(p1), load_image(p2)
        ref = oracle_reference_flow(im1, im2, args.ckpt, args.variant)
        ours = engine.flow_from_pair(im1, im2, preset="bgr_unit",
                                     size_mode="resize")
        delta = float(np.mean(np.hypot(*(ours - ref).transpose(2, 0, 1))))
        rows.append((f"EPE delta vs reference pipeline "
                     f"({os.path.basename(os.path.dirname(p1))}/"
                     f"{os.path.basename(p1)[:-4]})",
                     f"{delta:.2e} px (budget {EPE_DELTA_BUDGET})",
                     delta <= EPE_DELTA_BUDGET))

    # 3. Sintel clean/final EPE ----------------------------------------
    if args.sintel_root:
        from opticalflow_tpu.evaluate import evaluate_sintel
        for render in args.renders:
            res = evaluate_sintel(engine, args.sintel_root, render=render,
                                  preset="bgr_unit", batch=args.batch,
                                  limit=args.limit)
            target = SINTEL_PUBLISHED[render]
            ok = abs(res["epe"] - target) <= PUBLISHED_TOL
            partial = f" (first {args.limit})" if args.limit else ""
            rows.append((f"Sintel {render} EPE{partial}",
                         f"{res['epe']:.3f} (published {target:.2f} "
                         f"± {PUBLISHED_TOL})",
                         ok if args.expect_published else None))

    # 4. optional KITTI ------------------------------------------------
    if args.kitti_root:
        from opticalflow_tpu.evaluate import evaluate_kitti
        res = evaluate_kitti(engine, args.kitti_root, year=args.kitti_year,
                             preset="bgr_unit", batch=args.batch,
                             limit=args.limit)
        rows.append((f"KITTI{args.kitti_year} EPE / Fl-all",
                     f"{res['epe']:.3f} / {res['fl_all']:.2f}%", None))

    _print_table(rows)
    gates = [ok for _, _, ok in rows if ok is not None]
    return 0 if all(gates) else 1


def _print_table(rows) -> None:
    print("=" * 72)
    print("REAL-DATA REHEARSAL")
    print("=" * 72)
    for name, value, ok in rows:
        status = {True: "PASS", False: "FAIL", None: "info"}[ok]
        print(f"[{status:>4}] {name}: {value}")
    print("=" * 72)


if __name__ == "__main__":
    sys.exit(main())
