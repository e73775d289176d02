"""Grab frame N of a video as a PNG (fixture generator — the reference's
``capture_frame.py`` capability)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Save one video frame as PNG")
    p.add_argument("video")
    p.add_argument("frame", type=int)
    p.add_argument("out", nargs="?", default=None)
    args = p.parse_args(argv)

    import cv2
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        print(f"error: cannot open {args.video}", file=sys.stderr)
        return 1
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if not 0 <= args.frame < total:
        print(f"error: frame {args.frame} out of range (video has {total})",
              file=sys.stderr)
        cap.release()
        return 1
    cap.set(cv2.CAP_PROP_POS_FRAMES, args.frame)
    ok, frame = cap.read()
    cap.release()
    if not ok:
        print(f"error: failed to decode frame {args.frame}", file=sys.stderr)
        return 1
    out = args.out or f"{args.video}frame_{args.frame}.png"
    cv2.imwrite(out, frame)
    print(f"wrote {out} ({frame.shape[1]}x{frame.shape[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
