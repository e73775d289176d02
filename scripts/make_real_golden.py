"""Generate the real-frame golden fixtures for tests/test_real_golden.py.

Reproducible one-shot (run from repo root):

    python scripts/make_real_golden.py

Crops a real 180x318 frame pair (shifted overlapping windows of a real
video-frame grab, so the "flow" is a coherent ~(10, 6)px translation over
real texture) and renders the golden .flo through the REFERENCE pipeline
(/root/reference/script_pwc.py:43-81) with the torch-CPU oracle and
deterministic fake weights (torch.manual_seed(0), Kaiming, x0.5 — the same
recipe as tests/test_model_parity.py).  The test re-runs the pair through
the framework's own engine (float32, precision="highest") and asserts
EPE delta <= 1e-6 — turning the round-1 verify drive log (mean EPE delta
2.5e-8, COMPONENTS.md) into a committed regression test (VERDICT r2 task 5).
"""

import os
import sys
from math import ceil

import cv2
import numpy as np
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
from oracles.torch_pwcnet import OraclePWC  # noqa: E402

SRC = "/root/reference/output/00pwc_original.mp4frame_1000.png"
OUT = os.path.join(ROOT, "tests", "goldens")


def make_pair():
    frame = cv2.imread(SRC)  # BGR
    assert frame is not None, SRC
    im1 = frame[400:580, 800:1118]          # 180x318 (neither /64)
    im2 = frame[406:586, 810:1128]          # shifted (+6, +10)
    cv2.imwrite(os.path.join(OUT, "real_im1.png"), im1)
    cv2.imwrite(os.path.join(OUT, "real_im2.png"), im2)
    # return as RGB, as imageio/load_image would read them back
    return im1[..., ::-1], im2[..., ::-1]


def reference_pipeline(im1_rgb, im2_rgb, net):
    """Exact transcription of /root/reference/script_pwc.py:43-81."""
    im_all = [im1_rgb, im2_rgb]
    h, w = im_all[0].shape[:2]
    h64 = int(ceil(h / 64.0) * 64)
    w64 = int(ceil(w / 64.0) * 64)
    im_all = [cv2.resize(im, (w64, h64)) for im in im_all]
    tens = []
    for im in im_all:
        im = im[:, :, ::-1]                  # RGB -> BGR
        im = 1.0 * im / 255.0                # float64, like the reference
        im = np.transpose(im, (2, 0, 1))
        tens.append(torch.from_numpy(im.copy()).float()[None])
    x = torch.cat(tens, 1)
    with torch.no_grad():
        flo = net(x, train=False)
    flo = (flo[0] * 20.0).numpy()
    flo = np.swapaxes(np.swapaxes(flo, 0, 1), 1, 2)
    u = cv2.resize(flo[:, :, 0], (w, h)) * (w / float(w64))
    v = cv2.resize(flo[:, :, 1], (w, h)) * (h / float(h64))
    return np.dstack((u, v)).astype(np.float32)


def main():
    torch.manual_seed(0)
    net = OraclePWC(variant="new").eval()
    for p in net.parameters():
        p.data *= 0.5
    im1, im2 = make_pair()
    flow = reference_pipeline(im1, im2, net)
    sys.path.insert(0, ROOT)
    from opticalflow_tpu.io.flo import write_flo
    write_flo(os.path.join(OUT, "real_pair.flo"), flow)
    print(f"golden flow {flow.shape}, |flow| max {np.abs(flow).max():.4f}, "
          f"mean {np.abs(flow).mean():.4f}")


if __name__ == "__main__":
    main()
