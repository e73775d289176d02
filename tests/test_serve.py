"""Serving layer: dynamic batching semantics + HTTP round trip."""

import base64
import http.client
import json
import threading
import time

import numpy as np
import pytest


class _FakeEngine:
    """Counts launches; 'flow' = mean of the pair, broadcast to (H, W, 2)."""

    def __init__(self):
        self.calls = []  # batch sizes as launched (padded)

    def flow_from_pairs(self, im1s, im2s, *, preset, size_mode):
        self.calls.append(len(im1s))
        out = []
        for a, b in zip(im1s, im2s):
            h, w = a.shape[:2]
            val = (a.astype(np.float32).mean()
                   + b.astype(np.float32).mean())
            out.append(np.full((h, w, 2), val, np.float32))
        time.sleep(0.01)  # make batching windows observable
        return np.stack(out)


def _img(seed, h=8, w=12):
    return np.random.RandomState(seed).randint(
        0, 255, (h, w, 3), np.uint8)


def test_concurrent_requests_share_a_batch():
    from opticalflow_tpu.serve import FlowServer
    eng = _FakeEngine()
    srv = FlowServer(eng, max_batch=4, max_delay_ms=200)
    try:
        results = {}

        def call(i):
            results[i] = srv.flow(_img(i), _img(100 + i), timeout=10)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        for i in range(4):
            exp = (_img(i).astype(np.float32).mean()
                   + _img(100 + i).astype(np.float32).mean())
            np.testing.assert_allclose(results[i][0, 0, 0], exp, rtol=1e-6)
        # all four rode few launches; every launch padded to an allowed
        # bucket size (auto buckets for max_batch=4: 1, 2, 4)
        assert sum(eng.calls) <= 4 * 4
        assert all(c in (1, 2, 4) for c in eng.calls)
        snap = srv.metrics.snapshot()
        assert snap["requests"] == 4
        assert snap["mean_batch_occupancy"] >= 1.0
    finally:
        srv.close()


def test_mixed_shapes_bucketed_not_mixed():
    from opticalflow_tpu.serve import FlowServer
    eng = _FakeEngine()
    srv = FlowServer(eng, max_batch=4, max_delay_ms=30)
    try:
        outs = {}

        def call(i, h):
            outs[i] = srv.flow(_img(i, h=h), _img(50 + i, h=h), timeout=10)

        threads = [threading.Thread(target=call, args=(i, 8 + 8 * (i % 2)))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        shapes = {outs[i].shape for i in range(6)}
        assert shapes == {(8, 12, 2), (16, 12, 2)}
    finally:
        srv.close()


def test_bucketed_dispatch_pads_to_smallest_bucket():
    """A lone request must ride the B=1 program, not ship max_batch frames
    (the measured 10× single-request relay penalty, PERF.md round 5)."""
    from opticalflow_tpu.serve import FlowServer
    eng = _FakeEngine()
    srv = FlowServer(eng, max_batch=8, max_delay_ms=1)
    try:
        assert srv.bucket_sizes == [1, 2, 4, 8]
        srv.flow(_img(0), _img(1), timeout=10)
        assert eng.calls == [1]          # not padded to 8

        # three concurrent requests pad to the 4-bucket (or split across
        # smaller buckets under timing races — never a non-bucket size)
        outs = {}

        def call(i):
            outs[i] = srv.flow(_img(i), _img(40 + i), timeout=10)

        srv.max_delay = 0.2              # let them share a batch
        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(outs) == 3
        assert all(c in (1, 2, 4, 8) for c in eng.calls[1:])
    finally:
        srv.close()


def test_bucket_sizes_resolution_and_validation():
    from types import SimpleNamespace

    from opticalflow_tpu.serve import FlowServer
    eng = _FakeEngine()

    # legacy single-program behavior: always pad to max_batch
    srv = FlowServer(eng, max_batch=8, max_delay_ms=1, bucket_sizes=None)
    try:
        assert srv.bucket_sizes == [8]
        srv.flow(_img(0), _img(1), timeout=10)
        assert eng.calls == [8]
    finally:
        srv.close()

    # explicit list: sorted, max_batch appended
    srv = FlowServer(eng, max_batch=6, max_delay_ms=1, bucket_sizes=[2, 1])
    try:
        assert srv.bucket_sizes == [1, 2, 6]
    finally:
        srv.close()

    # invalid specs fail loudly at construction
    for bad in ([0], [9], "banana", [3, -1]):
        with pytest.raises(ValueError):
            FlowServer(eng, max_batch=8, bucket_sizes=bad)

    # sharded engine: buckets restricted to multiples of the data axis
    sharded = _FakeEngine()
    sharded.mesh = SimpleNamespace(shape={"data": 4})
    srv = FlowServer(sharded, max_batch=8, max_delay_ms=1)
    try:
        assert srv.bucket_sizes == [4, 8]
        srv.flow(_img(0), _img(1), timeout=10)
        assert sharded.calls == [4]      # lone request -> smallest multiple
    finally:
        srv.close()
    with pytest.raises(ValueError):      # bucket not divisible by the mesh
        FlowServer(sharded, max_batch=8, bucket_sizes=[2, 8])
    with pytest.raises(ValueError):      # max_batch itself must divide
        FlowServer(sharded, max_batch=6)


def test_server_warmup_compiles_every_bucket():
    """warmup() must pre-compile one program per bucket — a bucket's first
    request otherwise pays a minutes-long compile on the dispatch thread."""
    from opticalflow_tpu.serve import FlowServer

    class _Warm(_FakeEngine):
        def __init__(self):
            super().__init__()
            self.warmed = []

        def warmup(self, height, width, *, batch, preset, size_modes):
            self.warmed.append((height, width, batch, tuple(size_modes)))

    eng = _Warm()
    srv = FlowServer(eng, max_batch=8, max_delay_ms=1, preset="bgr_unit")
    try:
        srv.warmup(48, 64, size_modes=("resize",))
        assert eng.warmed == [(48, 64, b, ("resize",)) for b in (1, 2, 4, 8)]
    finally:
        srv.close()


def test_error_propagates_and_server_survives():
    from opticalflow_tpu.serve import FlowServer

    class _Boom(_FakeEngine):
        def flow_from_pairs(self, im1s, im2s, **kw):
            if len(self.calls) == 0:
                self.calls.append(0)
                raise RuntimeError("boom")
            return super().flow_from_pairs(im1s, im2s, **kw)

    eng = _Boom()
    srv = FlowServer(eng, max_batch=2, max_delay_ms=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            srv.flow(_img(0), _img(1), timeout=10)
        out = srv.flow(_img(2), _img(3), timeout=10)  # still serving
        assert out.shape == (8, 12, 2)
        assert srv.metrics.snapshot()["errors"] == 1
    finally:
        srv.close()


def test_http_round_trip_with_real_engine(tmp_path):
    """End-to-end: HTTP POST (b64 PNGs) → dispatcher → real tiny model →
    .flo bytes; /healthz and /metrics served alongside."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.io.flo import TAG_FLOAT
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.serve import FlowServer, make_http_server
    import struct

    model = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    import jax
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    engine = FlowEngine(model, params, flow_scale=20.0)
    srv = FlowServer(engine, max_batch=2, max_delay_ms=5)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        im = _img(0, h=48, w=60)
        ok, png = cv2.imencode(".png", im[:, :, ::-1])
        assert ok
        b64 = base64.b64encode(png.tobytes()).decode()
        # generous request timeout: the first CPU compile of the model can
        # exceed the server's 60 s default
        body = json.dumps({"im1": b64, "im2": b64,
                           "timeout": 600}).encode()

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/flow", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data
        tag, w, h = struct.unpack("<fii", data[:12])
        assert abs(tag - TAG_FLOAT) < 1e-3 and (h, w) == (48, 60)
        flow = np.frombuffer(data[12:], "<f4").reshape(h, w, 2)
        assert np.isfinite(flow).all()

        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b'{"ok": true}'
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        assert m["requests"] == 1 and m["errors"] == 0

        # identical pair through the engine directly must match the HTTP path
        direct = engine.flow_from_pair(im, im)
        np.testing.assert_allclose(flow, direct, atol=1e-5)
    finally:
        httpd.shutdown()
        srv.close()
        httpd.server_close()   # joins the (non-daemon) handler threads


def test_http_raw_tensor_endpoint():
    """octet-stream POST (raw uint8 frames + X-Frame-Shape) must return the
    same flow as the JSON path without any PNG decode, and malformed
    headers/bodies must 400 (not 500)."""
    pytest.importorskip("cv2")  # make_http_server imports cv2 at build time
    import struct
    from opticalflow_tpu.io.flo import TAG_FLOAT
    from opticalflow_tpu.serve import FlowServer, make_http_server

    eng = _FakeEngine()
    srv = FlowServer(eng, max_batch=2, max_delay_ms=1)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        im1, im2 = _img(0, h=10, w=14), _img(1, h=10, w=14)
        body = im1.tobytes() + im2.tobytes()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/v1/flow", body, {
            "Content-Type": "application/octet-stream",
            "X-Frame-Shape": "10x14x3", "X-Timeout": "30"})
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data
        tag, w, h = struct.unpack("<fii", data[:12])
        assert abs(tag - TAG_FLOAT) < 1e-3 and (h, w) == (10, 14)
        flow = np.frombuffer(data[12:], "<f4").reshape(h, w, 2)
        exp = (im1.astype(np.float32).mean()
               + im2.astype(np.float32).mean())
        np.testing.assert_allclose(flow[0, 0, 0], exp, rtol=1e-6)

        # malformed shape header -> 400
        conn.request("POST", "/v1/flow", body, {
            "Content-Type": "application/octet-stream",
            "X-Frame-Shape": "banana"})
        assert conn.getresponse().status == 400
        # body length mismatch -> 400
        conn.request("POST", "/v1/flow", body[:-7], {
            "Content-Type": "application/octet-stream",
            "X-Frame-Shape": "10x14x3"})
        assert conn.getresponse().status == 400
        # media types are case-insensitive (RFC 7231): an uppercase
        # Content-Type must still route to the raw parser
        conn.request("POST", "/v1/flow", body, {
            "Content-Type": "Application/Octet-Stream; charset=binary",
            "X-Frame-Shape": "10x14x3"})
        assert conn.getresponse().status == 200
        # client mistakes must 400 at parse time, not 500 from the engine:
        # inf timeout would make Event.wait raise; bad size_mode would
        # burn a padded device batch per LB retry
        for hdrs in ({"X-Timeout": "inf"}, {"X-Timeout": "-3"},
                     {"X-Size-Mode": "stretch"}):
            conn.request("POST", "/v1/flow", body, {
                "Content-Type": "application/octet-stream",
                "X-Frame-Shape": "10x14x3", **hdrs})
            resp = conn.getresponse()
            assert resp.status == 400, (hdrs, resp.read())
        # pad_ref on a frame the reference's unpad order would empty
        # (10x14: pad 54 >= 16 = hp/4) is a client mistake too -> 400
        conn.request("POST", "/v1/flow", body, {
            "Content-Type": "application/octet-stream",
            "X-Frame-Shape": "10x14x3", "X-Size-Mode": "pad_ref"})
        resp = conn.getresponse()
        assert resp.status == 400 and b"pad_ref" in resp.read()
    finally:
        httpd.shutdown()
        srv.close()
        httpd.server_close()


def test_close_drains_queued_requests():
    """close() must let already-queued requests finish (SIGTERM drain):
    callers are parked on their events and would otherwise hang/drop."""
    import time as _time

    gate = threading.Event()   # holds the first batch on "device"

    class _GatedEngine:
        def flow_from_pairs(self, im1s, im2s, preset="bgr_unit",
                            size_mode="resize"):
            gate.wait(10)
            h, w = im1s[0].shape[:2]
            return np.zeros((len(im1s), h, w, 2), np.float32)

    from opticalflow_tpu.serve import FlowServer
    srv = FlowServer(_GatedEngine(), max_batch=1, max_delay_ms=1)
    im = np.zeros((8, 8, 3), np.uint8)
    results = {}

    def _req(i):
        results[i] = srv.flow(im, im, timeout=10)

    threads = [threading.Thread(target=_req, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    deadline = _time.monotonic() + 5
    while len(srv._queue) < 2 and _time.monotonic() < deadline:
        _time.sleep(0.01)   # first request on "device", two more queued
    assert len(srv._queue) >= 2
    drained = []
    closer = threading.Thread(
        target=lambda: drained.append(srv.close(timeout=10)))
    closer.start()
    _time.sleep(0.05)
    gate.set()              # release the in-flight batch; queue drains
    closer.join(timeout=10)
    assert drained == [True]
    for t in threads:
        t.join(timeout=10)
    assert sorted(results) == [0, 1, 2]
    with pytest.raises(RuntimeError, match="shut down"):
        srv.flow(im, im, timeout=1)


def test_abandoned_request_not_dispatched():
    """A request whose caller timed out must be dropped from the queue, not
    spent on a padded device batch (review finding: overload collapse)."""
    from opticalflow_tpu.serve import FlowServer

    gate = threading.Event()

    class _Slow(_FakeEngine):
        def flow_from_pairs(self, im1s, im2s, **kw):
            out = super().flow_from_pairs(im1s, im2s, **kw)
            gate.wait(10)  # hold the dispatcher on the first launch
            return out

    eng = _Slow()
    srv = FlowServer(eng, max_batch=1, max_delay_ms=1)
    try:
        t1 = threading.Thread(
            target=lambda: srv.flow(_img(0), _img(1), timeout=10))
        t1.start()
        time.sleep(0.2)  # dispatcher is now blocked inside launch #1
        with pytest.raises(TimeoutError):
            srv.flow(_img(2), _img(3), timeout=0.05)  # abandoned in queue
        gate.set()
        t1.join()
        out = srv.flow(_img(4), _img(5), timeout=10)  # healthy request
        assert out.shape == (8, 12, 2)
        # launches: the first (blocked) one + the healthy one; NOT the
        # abandoned request
        assert len(eng.calls) == 2
    finally:
        gate.set()
        srv.close()


def test_metrics_snapshot_during_traffic():
    """GET /metrics races request completions; snapshot must not blow up on
    concurrent deque mutation (review finding)."""
    from opticalflow_tpu.serve import FlowServer
    eng = _FakeEngine()
    srv = FlowServer(eng, max_batch=2, max_delay_ms=1)
    errs = []

    def snap_loop():
        try:
            for _ in range(300):
                srv.metrics.snapshot()
        except Exception as e:  # pragma: no cover - the bug
            errs.append(e)

    try:
        t = threading.Thread(target=snap_loop)
        t.start()
        for i in range(40):
            srv.flow(_img(i), _img(i + 1), timeout=10)
        t.join()
        assert not errs
        assert srv.metrics.snapshot()["requests"] == 40
    finally:
        srv.close()


@pytest.mark.slow
def test_sharded_serving_matches_single_device():
    """Multi-chip serving (VERDICT r3 task 2): a FlowServer over a
    mesh-sharded engine must (a) return byte-identical results to calling
    that same sharded engine directly (the serving layer adds zero
    numerics), and (b) agree with single-device serving to reduction-order
    tolerance.  Every dispatch is padded to max_batch=8, so each launch
    divides the 8-device data axis."""
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.parallel import mesh as meshlib
    from opticalflow_tpu.serve import FlowServer

    model = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    mesh = meshlib.make_mesh(jax.devices()[:8])
    eng8 = FlowEngine(model, params, flow_scale=20.0, mesh=mesh)
    eng1 = FlowEngine(model, params, flow_scale=20.0)

    pairs = [(_img(i, h=48, w=60), _img(100 + i, h=48, w=60))
             for i in range(5)]

    srv8 = FlowServer(eng8, max_batch=8, max_delay_ms=100)
    srv1 = FlowServer(eng1, max_batch=8, max_delay_ms=100)
    try:
        out8, out1 = {}, {}

        def call(store, srv, i):
            store[i] = srv.flow(*pairs[i], timeout=600)

        for store, srv in ((out8, srv8), (out1, srv1)):
            threads = [threading.Thread(target=call, args=(store, srv, i))
                       for i in range(5)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()

        # (a) serving layer is numerics-free: byte-equal to the direct
        # sharded-engine call with the same padded batch
        im1s = [p[0] for p in pairs] + [pairs[-1][0]] * 3
        im2s = [p[1] for p in pairs] + [pairs[-1][1]] * 3
        direct = eng8.flow_from_pairs(im1s, im2s)
        for i in range(5):
            np.testing.assert_array_equal(out8[i], direct[i])
        # (b) sharded vs single-device: per-device program tiling may
        # reorder accumulations at the 1e-5 level (see test_engine.py)
        for i in range(5):
            np.testing.assert_allclose(out8[i], out1[i], atol=5e-5, rtol=1e-2)
        assert srv8.metrics.snapshot()["errors"] == 0
    finally:
        srv8.close()
        srv1.close()
