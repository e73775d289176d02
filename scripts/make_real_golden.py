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


def pad_pipelines(im1_rgb, im2_rgb, net):
    """Both pad-path orders at 180x318 (pad (12, 2) -> quarter 48x80):

    * padref -- EXACT transcription of /root/reference/inference_kitti.py
      :208-224 (v2 preproc :176-179): unpad the QUARTER-res flow by the
      FULL-res pad counts (48x80 -> 36x78), then align_corners=True resize
      to (H, W) with anisotropic vector rescale;
    * pad -- the engine's corrected order (documented divergence): upsample
      the quarter flow to the padded size, vector-rescale, crop to (H, W).
    """
    import torch.nn.functional as F

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    def prep(im):
        t = torch.from_numpy(im.astype(np.float32) / 255.0).permute(2, 0, 1)
        return (t - mean) / std

    x = torch.cat([prep(im1_rgb), prep(im2_rgb)], 0)[None]
    H, W = im1_rgb.shape[:2]
    pad_h = (64 - H % 64) % 64
    pad_w = (64 - W % 64) % 64
    xp = F.pad(x, (0, pad_w, 0, pad_h), mode="replicate")
    with torch.no_grad():
        q = net(xp, train=False)                       # (1, 2, Hp/4, Wp/4)

    qr = q[..., : q.shape[-2] - pad_h, : q.shape[-1] - pad_w]
    ref = F.interpolate(qr, size=(H, W), mode="bilinear", align_corners=True)
    ref[:, 0] *= W / float(qr.shape[-1])
    ref[:, 1] *= H / float(qr.shape[-2])

    Hp, Wp = xp.shape[-2:]
    fix = F.interpolate(q, size=(Hp, Wp), mode="bilinear", align_corners=True)
    fix[:, 0] *= Wp / float(q.shape[-1])
    fix[:, 1] *= Hp / float(q.shape[-2])
    fix = fix[..., :H, :W]

    to_np = lambda t: t[0].permute(1, 2, 0).numpy().astype(np.float32)
    return to_np(fix), to_np(ref)


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
    pad, padref = pad_pipelines(im1, im2, net)
    write_flo(os.path.join(OUT, "real_pair_pad.flo"), pad)
    write_flo(os.path.join(OUT, "real_pair_padref.flo"), padref)
    d = np.mean(np.hypot(*(pad - padref).transpose(2, 0, 1)))
    print(f"pad goldens {pad.shape}; corrected-vs-reference order "
          f"mean EPE delta {d:.4f} (nonzero by design)")


if __name__ == "__main__":
    main()
