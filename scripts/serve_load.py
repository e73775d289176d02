"""Load-test the HTTP serving layer: JSON(base64 PNG) vs raw-tensor posts.

Drives a real in-process FlowServer (random-init weights, bf16 fast path)
with concurrent HTTP clients and reports req/s + latency percentiles +
batch occupancy per request encoding.  The JSON path pays base64 inflation
and PNG decode on the 1-core host; the octet-stream path posts the two raw
uint8 frames with an ``X-Frame-Shape`` header (see ``serve.py``).

    python scripts/serve_load.py [H W] [clients] [reqs_per_client] [dp] \
                                 [max_batch] [max_delay_ms] [buckets]

``clients=1`` with ``max_delay_ms=0`` measures single-request latency
(p50 = the serving-path time-to-result through the relay, VERDICT r4
task 3); ``max_batch=1`` additionally compiles the B=1 program instead
of padding each lone request to 8.  ``buckets`` is ``auto`` (default:
power-of-two launch sizes — lone requests ride the B=1 program) or
``none`` (legacy: every launch padded to max_batch) or a comma list.

``dp`` ≥ 1 routes dispatch through the data-parallel mesh code path
(NamedSharding over the first ``dp`` devices; on a single chip dp=1 still
exercises the sharded program — VERDICT r3 task 2 evidence).

No reference counterpart (the reference has no serving layer).
"""
from __future__ import annotations

import http.client
import struct
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_mode(port: int, mode: str, frames, clients: int, reqs: int):
    import base64
    import json

    import cv2

    h, w, _ = frames[0].shape
    lat: list = []
    errs: list = []
    lock = threading.Lock()

    # pre-build every request body OUTSIDE the timed region: client-side
    # PNG encode would otherwise pollute json latencies and steal CPU from
    # the server on this 1-core host, overstating the raw path's advantage
    if mode == "json":
        b64 = [base64.b64encode(
            cv2.imencode(".png", f[:, :, ::-1])[1]).decode() for f in frames]
        bodies = [json.dumps({"im1": b64[i], "im2": b64[(i + 1) % len(b64)],
                              "size_mode": "resize", "timeout": 120})
                  for i in range(len(frames))]
        headers = {"Content-Type": "application/json"}
    else:
        bodies = [frames[i].tobytes() + frames[(i + 1) % len(frames)].tobytes()
                  for i in range(len(frames))]
        headers = {"Content-Type": "application/octet-stream",
                   "X-Frame-Shape": f"{h}x{w}x3", "X-Timeout": "120"}

    def one_client(cid: int):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for r in range(reqs):
            t0 = time.perf_counter()
            conn.request("POST", "/v1/flow",
                         bodies[(cid + r) % len(bodies)], headers)
            resp = conn.getresponse()
            data = resp.read()
            dt = time.perf_counter() - t0
            with lock:
                if resp.status != 200:
                    errs.append(data[:200])
                else:
                    tag, fw, fh = struct.unpack("<fii", data[:12])
                    assert (fh, fw) == (h, w), (fh, fw)
                    lat.append(dt)
        conn.close()

    t0 = time.perf_counter()
    threads = [threading.Thread(target=one_client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
    return {"mode": mode, "req_s": round(len(lat) / wall, 1),
            "wall_s": round(wall, 2), "ok": len(lat), "errors": len(errs),
            "p50_s": round(pct(0.50), 2), "p99_s": round(pct(0.99), 2),
            "err_sample": errs[:2]}


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    clients = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reqs = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    dp = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    max_batch = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    delay_ms = float(sys.argv[7]) if len(sys.argv) > 7 else 20.0
    bspec = sys.argv[8] if len(sys.argv) > 8 else "auto"
    buckets = (None if bspec == "none" else "auto" if bspec == "auto"
               else [int(v) for v in bspec.split(",")])

    import jax
    import jax.numpy as jnp

    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.serve import FlowServer, make_http_server

    model = PWCDCNet(dtype=jnp.bfloat16, precision="fast")
    init = jax.jit(model.init)
    params = init(jax.random.PRNGKey(0),
                  jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    mesh = None
    if dp:
        from opticalflow_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:dp])
        print(f"sharded dispatch over {dp} device(s)", flush=True)
    engine = FlowEngine(model, params, flow_scale=20.0, mesh=mesh)
    server = FlowServer(engine, max_batch=max_batch, max_delay_ms=delay_ms,
                        preset="bgr_unit", bucket_sizes=buckets)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(4)]
    print(f"warmup compile at {h}x{w} (buckets {server.bucket_sizes}) ...",
          flush=True)
    t0 = time.perf_counter()
    server.warmup(h, w, size_modes=("resize",))
    print(f"warm in {time.perf_counter() - t0:.1f}s", flush=True)

    try:
        for mode in ("json", "raw"):
            # metrics are cumulative; diff snapshots for per-mode occupancy
            before = server.metrics.snapshot()
            stats = run_mode(port, mode, frames, clients, reqs)
            after = server.metrics.snapshot()
            db = after["batches"] - before["batches"]
            docc = (after["mean_batch_occupancy"] * after["batches"]
                    - before["mean_batch_occupancy"] * before["batches"])
            stats["mean_occupancy"] = round(docc / db, 2) if db else 0.0
            print(stats, flush=True)
    finally:
        httpd.shutdown()
        server.close()
        httpd.server_close()


if __name__ == "__main__":
    main()
