"""End-to-end streaming-overlay fps demo + honest stage breakdown.

Synthesizes a moving-texture clip, runs the real extract_video CLI on the
TPU (decode → batch → device forward → overlay → encode), and reports the
steady-state fps next to a per-stage breakdown:

  * decode-only fps (cv2.VideoCapture loop)
  * overlay+encode-only fps (host draw path with precomputed flow)
  * device-only pairs/s at this shape (chained on-device loop, bench method)
  * measured H2D bandwidth for one frame tensor (the relay bottleneck here)

The reference's hot loop is fully serial (pwc_extract_flow_video.py:219-308);
this pipeline overlaps all four stages.  Run:  python scripts/video_fps_demo.py [W H [frames]]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = int(sys.argv[1]) if len(sys.argv) > 1 else 320
H = int(sys.argv[2]) if len(sys.argv) > 2 else 192
N_FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 120
BATCH = int(sys.argv[4]) if len(sys.argv) > 4 else 8
UPLOAD = sys.argv[5] if len(sys.argv) > 5 else "bgr"
CLIP = f"/tmp/demo_{W}x{H}.mp4"
CKPT = "/tmp/demo_fake_pwc.pth.tar"


def make_clip():
    import cv2
    if os.path.exists(CLIP):
        return
    rng = np.random.RandomState(0)
    big = (rng.rand(H * 2, W * 2, 3) * 255).astype(np.uint8)
    big = cv2.GaussianBlur(big, (0, 0), 3)
    wr = cv2.VideoWriter(CLIP, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    for t in range(N_FRAMES):
        x0 = int(W / 2 + 40 * np.sin(t / 17.0))
        y0 = int(H / 2 + 30 * np.cos(t / 23.0))
        wr.write(big[y0:y0 + H, x0:x0 + W])
    wr.release()


def make_ckpt():
    if os.path.exists(CKPT):
        return
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from oracles.torch_pwcnet import OraclePWC
    m = OraclePWC("new")
    [p.data.mul_(0.5) for p in m.parameters()]
    sd = m.state_dict_flat()
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, CKPT)


def decode_only_fps():
    import cv2
    cap = cv2.VideoCapture(CLIP)
    n, t0 = 0, time.perf_counter()
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    cap.release()
    return n / (time.perf_counter() - t0)


def overlay_encode_fps():
    """(overlay-only, encode-only, serial overlay+encode) fps for the arrows
    path the CLI actually runs: device-decimated grid in, one polylines
    call, AsyncVideoWriter overlapping encode with drawing — so the
    effective stage bound is ~max(overlay, encode), not the serial sum."""
    import cv2
    from opticalflow_tpu.viz import overlay as ov
    rng = np.random.RandomState(1)
    frame = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    gflow = rng.rand(-(-H // 16), -(-W // 16), 2).astype(np.float32) * 4
    n = 64
    t0 = time.perf_counter()
    outs = [ov.arrow_overlay(frame, gflow, step=16, title="t", grid_step=16)
            for _ in range(n)]
    f_overlay = n / (time.perf_counter() - t0)
    wr = cv2.VideoWriter("/tmp/demo_overlay_only.mp4",
                         cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    t0 = time.perf_counter()
    for out in outs:
        wr.write(out)
    wr.release()
    f_encode = n / (time.perf_counter() - t0)
    wr = cv2.VideoWriter("/tmp/demo_overlay_only.mp4",
                         cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    t0 = time.perf_counter()
    for _ in range(n):
        wr.write(ov.arrow_overlay(frame, gflow, step=16, title="t",
                                  grid_step=16))
    wr.release()
    f_serial = n / (time.perf_counter() - t0)
    return f_overlay, f_encode, f_serial


def device_only_pairs_per_sec(h64, w64):
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    x0 = jax.random.uniform(key, (BATCH, h64, w64, 6), jnp.float32)
    LOOP = 20

    @jax.jit
    def bench(p, x):
        def body(i, acc):
            out = model.apply({"params": p}, x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    @jax.jit
    def ovh(x):
        return jnp.mean(x)

    float(ovh(x0)); float(bench(params, x0))
    t0 = time.perf_counter(); [float(ovh(x0)) for _ in range(3)]
    o = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter(); [float(bench(params, x0)) for _ in range(3)]
    per_step = ((time.perf_counter() - t0) / 3 - o) / LOOP
    return BATCH / per_step


def h2d_bandwidth(h64, w64):
    import jax
    import jax.numpy as jnp
    arr = np.zeros((BATCH + 1, h64, w64, 3), np.uint8)
    dev = jax.device_put(arr); dev.block_until_ready()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_put(arr).block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    return arr.nbytes / dt / 1e6, arr.nbytes / 1e6


def main():
    import cv2  # noqa: F401  (fail early if absent)
    make_clip()
    make_ckpt()
    h64, w64 = -(-H // 64) * 64, -(-W // 64) * 64

    print(f"== demo clip {W}x{H} ({N_FRAMES} frames), model at {w64}x{h64}, "
          f"batch {BATCH} ==", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "opticalflow_tpu.cli.extract_video",
         CLIP, f"/tmp/demo_out_{W}x{H}.mp4", "--ckpt", CKPT,
         "--mode", "arrows", "--batch", str(BATCH), "--flow-scale", "20",
         "--upload", UPLOAD],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    wall = time.perf_counter() - t0
    for line in r.stdout.splitlines():
        if "fps" in line or "params" in line:
            print("CLI:", line, flush=True)
    if r.returncode:
        print(r.stderr[-2000:])
        return 1
    print(f"CLI wall (incl. compile): {wall:.1f}s", flush=True)

    print(f"decode-only:        {decode_only_fps():8.1f} fps", flush=True)
    f_ov, f_enc, f_ser = overlay_encode_fps()
    print(f"overlay-only:       {f_ov:8.1f} fps (decimated-grid arrows)",
          flush=True)
    print(f"encode-only:        {f_enc:8.1f} fps (mp4v)", flush=True)
    print(f"overlay+encode:     {f_ser:8.1f} fps serial; async writer "
          f"bounds the stage at ~max(overlay, encode)", flush=True)
    bw, mb = h2d_bandwidth(h64, w64)
    print(f"H2D one window:     {bw:8.1f} MB/s ({mb:.2f} MB per {BATCH}+1 "
          f"frames -> {bw / (mb / (BATCH + 1)):.1f} frames/s ceiling)",
          flush=True)
    print(f"device-only:        {device_only_pairs_per_sec(h64, w64):8.1f} "
          f"pairs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
