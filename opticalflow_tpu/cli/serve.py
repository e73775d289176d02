"""Serving CLI: HTTP optical-flow endpoint with dynamic batching.

    python -m opticalflow_tpu.cli.serve --ckpt pwc_net.pth.tar --port 8080

Then:  POST /v1/flow  {"im1": <base64 image>, "im2": <base64 image>}
→ Middlebury .flo bytes.   GET /healthz, GET /metrics for probes.

No reference counterpart (the reference has no serving layer); the TPU
rationale and the batching design live in ``opticalflow_tpu/serve.py``.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PWC-Net flow serving (TPU)")
    p.add_argument("--ckpt", default="./pwc_net.pth.tar")
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--preset", default="bgr_unit")
    p.add_argument("--flow-scale", type=float, default=20.0)
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="bfloat16",
                   help="bfloat16 fast path by default for serving")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--bucket-sizes", default="auto", metavar="auto|none|N,..",
                   help="allowed padded launch sizes; partial batches pad "
                        "to the smallest fitting bucket so a lone request "
                        "rides the B=1 program instead of shipping "
                        "max-batch frames (default auto = powers of two "
                        "up to max-batch; none = always pad to max-batch, "
                        "one compile per shape)")
    p.add_argument("--data-parallel", default="1", metavar="N|all",
                   help="shard each dispatched batch across N chips "
                        "(data-parallel mesh; 'all' = every visible device; "
                        "max-batch must divide by N). Default 1 = "
                        "single-device")
    p.add_argument("--warmup", metavar="HxW", default=None,
                   help="pre-compile for this frame size, e.g. 436x1024")
    p.add_argument("--warmup-modes", default="resize,pad",
                   help="comma-separated size modes --warmup compiles "
                        "(default resize,pad). Add pad_ref if clients will "
                        "request it — an unwarmed mode's first request "
                        "holds the dispatch thread through a cold "
                        "full-model compile (minutes)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.serve import FlowServer, make_http_server
    from opticalflow_tpu.train.checkpoints import load_params

    # flag-shaped mistakes fail BEFORE the checkpoint load: bucket spec
    # parse + range (mesh divisibility is re-checked by
    # FlowServer._resolve_buckets) and the --data-parallel spec
    if args.bucket_sizes in ("auto", "none"):
        buckets = None if args.bucket_sizes == "none" else "auto"
    else:
        try:
            buckets = [int(v) for v in args.bucket_sizes.split(",") if v]
        except ValueError:
            raise SystemExit(
                f"--bucket-sizes must be 'auto', 'none' or a comma list of "
                f"ints, got {args.bucket_sizes!r}")
        for b in buckets:
            if b < 1 or b > args.max_batch:
                raise SystemExit(
                    f"--bucket-sizes value {b} outside "
                    f"[1, max-batch={args.max_batch}]")
    from opticalflow_tpu.parallel.mesh import resolve_data_parallel
    try:
        mesh = resolve_data_parallel(args.data_parallel)
    except ValueError as e:
        raise SystemExit(str(e))
    model = PWCDCNet(
        variant=args.variant,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        precision="fast" if args.dtype == "bfloat16" else "highest")
    params = load_params(args.ckpt, variant=args.variant)
    if mesh is not None:
        # max-batch/bucket divisibility by the mesh width is validated by
        # FlowServer._resolve_buckets below (ValueError -> SystemExit)
        ndev = mesh.shape["data"]
        print(f"data-parallel serving over {ndev} devices "
              f"(max {-(-args.max_batch // ndev)} pairs/device/batch)")
    engine = FlowEngine(model, params, flow_scale=args.flow_scale, mesh=mesh)
    try:
        server = FlowServer(engine, max_batch=args.max_batch,
                            max_delay_ms=args.max_delay_ms,
                            preset=args.preset, bucket_sizes=buckets)
    except ValueError as e:
        raise SystemExit(str(e))
    if args.warmup:
        h, w = (int(v) for v in args.warmup.split("x"))
        modes = tuple(m.strip() for m in args.warmup_modes.split(",") if m)
        # compile the exact programs requests will hit: the padded u8
        # pipelines at this frame shape, one per (size mode, bucket).
        # Multiple buckets = multiple compiles — one-time per machine via
        # the persistent XLA cache, but budget startup time accordingly.
        server.warmup(h, w, size_modes=modes)
        print(f"warmed up buckets={server.bucket_sizes} at {h}x{w} "
              f"(modes: {', '.join(modes)})")
    httpd = make_http_server(server, args.host, args.port)

    import signal
    import threading

    def _shutdown(signum, frame):
        # serve_forever() returns after shutdown(); must be called from
        # another thread or it deadlocks inside the handler
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _shutdown)
    except ValueError:
        pass   # embedded off the main thread: no signal-driven drain
    print(f"serving on http://{args.host}:{args.port}  "
          f"(max_batch={args.max_batch}, delay={args.max_delay_ms}ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # Drain order matters: the dispatcher must finish queued requests
        # first (handler threads are parked on their events), then
        # server_close() joins the handler threads so responses finish
        # writing before the process exits.
        server.close()
        httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
