"""Multi-host (multi-process) data-parallel training.

The reference has no distributed layer at all (SURVEY.md §2.9); here the
DCN/multi-slice story is ``jax.distributed.initialize`` + a global mesh
(`parallel/mesh.py::distributed_init`).  Tested for real: two OS processes,
each owning 4 virtual CPU devices, form one 8-device mesh over Gloo
collectives and must produce the same train step as a single 8-device
process — same loss, same grad norm, identical across ranks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os
import sys
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from opticalflow_tpu.parallel import mesh as meshlib
# generous shutdown window: on a one-core host the ranks' interpreter
# teardown (buffer frees, cache writes) can skew by minutes
rank, count = meshlib.distributed_init(f"127.0.0.1:{port}", 2, pid,
                                       shutdown_timeout_seconds=1200)
assert (rank, count) == (pid, 2), (rank, count)
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

import numpy as np
from opticalflow_tpu.models.pwcnet import PWCDCNet
from opticalflow_tpu.train.trainer import (TrainConfig, create_train_state,
                                           make_train_step)

model = PWCDCNet(variant="new", precision="fast")
cfg = TrainConfig(loss="multiscale", optimizer="adamw", lr=1e-4)
state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg)
mesh = meshlib.make_mesh()
step = make_train_step(model, tx, cfg, mesh=mesh)

rng = np.random.RandomState(0)
images = rng.rand(8, 64, 64, 6).astype(np.float32)
flow = rng.randn(8, 64, 64, 2).astype(np.float32)
valid = np.ones((8, 64, 64), np.float32)
lo = pid * 4
batch = {"images": images[lo:lo + 4], "flow": flow[lo:lo + 4],
         "valid": valid[lo:lo + 4]}

state = meshlib.replicate(state, mesh)
batch = meshlib.shard_batch(batch, mesh)
# AOT-compile, then rendezvous: on one CPU core the two ranks' compiles
# finish minutes apart, which would blow Gloo's 30 s context-init window
# if the first execution triggered compilation implicitly.
step_c = step.lower(state, batch).compile()
meshlib.barrier("post_compile")
state, metrics = step_c(state, batch)
print("RESULT", pid, repr(float(metrics["loss"])),
      repr(float(metrics["grad_norm"])), flush=True)
"""


EVAL_WORKER = r"""
import os
import sys
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from opticalflow_tpu.parallel import mesh as meshlib
rank, count = meshlib.distributed_init(f"127.0.0.1:{port}", 2, pid,
                                       shutdown_timeout_seconds=1200)
assert (rank, count) == (pid, 2), (rank, count)
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from opticalflow_tpu.engine import FlowEngine
from opticalflow_tpu.evaluate import evaluate_pairs
from opticalflow_tpu.models.pwcnet import PWCDCNet
from opticalflow_tpu.serve import FlowServer

model = PWCDCNet(variant="new", precision="fast")
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 6)))["params"]
mesh = meshlib.make_mesh()
# De-skew after the init compile (it can finish minutes apart across
# ranks on a 1-core host) so the engine's coordination-service equality
# check and everything after start roughly aligned.  Engine construction
# itself performs NO device collective — params assemble process-locally
# (meshlib.replicate) precisely to keep Gloo's 30 s first-contact window
# out of the construction path.
meshlib.barrier("post_init")
engine = FlowEngine(model, params, mesh=mesh)

# Both processes feed the SAME global batch; the engine shards it over the
# global mesh and all-gathers the output back to every host (_fetch).
rng = np.random.RandomState(0)
im1s = [rng.randint(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(8)]
im2s = [rng.randint(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(8)]
gts = [rng.randn(64, 64, 2).astype(np.float32) for _ in range(8)]

# AOT-compile the forward FIRST (no execution!), then rendezvous.
# Actually RUNNING the program here would device_put the host batch onto
# the multi-process sharding, which asserts cross-process input equality
# via a Gloo allgather — and with ranks minutes apart mid-compile on a
# 1-core host, that first context init blows its 30 s window.  The same
# reason the train worker uses step.lower(...).compile().
x = np.stack([np.concatenate((a, b), axis=-1) for a, b in zip(im1s, im2s)])
engine._full_pad_u8.lower(engine.params,
                          jax.ShapeDtypeStruct(x.shape, x.dtype),
                          "bgr_unit", 64, 64).compile()
meshlib.barrier("post_forward_compile")

# --- direct sharded inference, output gathered to every host
flows = engine.flow_from_pairs(im1s, im2s, size_mode="pad")
print("FLOWSUM", pid, repr(float(np.abs(flows).sum())), flush=True)

# --- data-parallel evaluation (same program shape: batch 8, 64x64)
ds = [{"im1": a, "im2": b, "flow": g, "stem": f"p{i}"}
      for i, (a, b, g) in enumerate(zip(im1s, im2s, gts))]
res = evaluate_pairs(engine, ds, size_mode="pad", batch=8, verbose=False)
print("EVAL", pid, repr(res["epe"]), repr(res["fl_all"]), flush=True)

# --- serving dispatch across both processes: one request per rank with
# identical frames -> each rank's dispatch thread pads to max_batch=8 and
# runs the same global program (deterministic lockstep)
server = FlowServer(engine, max_batch=8, max_delay_ms=1)
flow = server.flow(im1s[0], im2s[0], size_mode="pad")
server.close()
print("SERVE", pid, repr(float(np.abs(flow).sum())), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_process_shard_disjoint_common_length():
    from opticalflow_tpu.data.loader import process_shard

    ds = list(range(11))
    shards = [process_shard(ds, p, 3) for p in range(3)]
    assert all(len(s) == 11 // 3 for s in shards)
    seen = [s.ds[i] for s in shards for i in s.indices]
    assert len(seen) == len(set(seen))  # disjoint
    assert set(seen) <= set(ds)


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    # workers run FIRST (the parent sits idle on communicate()) — running
    # the in-process reference beforehand leaves ~6 GB of live buffers and
    # a busy runner competing with the ranks on this one-core host
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = os.environ.copy()
    # the workers configure their own 4-device CPU platform; drop the test
    # runner's 8-device force flag so the two don't fight
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(p)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-4000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, pid, loss, gn = line.split()
        results[int(pid)] = (float(loss), float(gn))

    # identical across ranks (it is one global program)
    assert results[0] == results[1]

    # single-process reference on this test runner's own 8 CPU devices
    import jax

    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.parallel import mesh as meshlib
    from opticalflow_tpu.train.trainer import (TrainConfig,
                                               create_train_state,
                                               make_train_step)

    model = PWCDCNet(variant="new", precision="fast")
    cfg = TrainConfig(loss="multiscale", optimizer="adamw", lr=1e-4)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg)
    mesh = meshlib.make_mesh()
    step = make_train_step(model, tx, cfg, mesh=mesh)
    rng = np.random.RandomState(0)
    batch = {"images": rng.rand(8, 64, 64, 6).astype(np.float32),
             "flow": rng.randn(8, 64, 64, 2).astype(np.float32),
             "valid": np.ones((8, 64, 64), np.float32)}
    state = meshlib.replicate(state, mesh)
    _, ref_metrics = step(state, meshlib.shard_batch(batch, mesh))

    # equal to the single-process 8-device step (Gloo vs in-process
    # all-reduce may reassociate float sums)
    np.testing.assert_allclose(results[0][0], float(ref_metrics["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(results[0][1],
                               float(ref_metrics["grad_norm"]), rtol=2e-4)


@pytest.mark.slow
def test_two_process_eval_and_serving_match_single_process(tmp_path):
    """VERDICT r4 task 6: the serving dispatcher and evaluate_pairs driven
    across 2 OS processes × 4 devices (Gloo) must equal the single-process
    8-device result.  The inference path has no reductions, so unlike the
    train step the numbers should match exactly."""
    script = tmp_path / "eval_worker.py"
    script.write_text(EVAL_WORKER)
    port = _free_port()
    env = os.environ.copy()
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(p)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    got = {}  # tag -> {pid: values}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-4000:]
        for line in out.splitlines():
            if line.startswith(("FLOWSUM", "EVAL", "SERVE")):
                parts = line.split()
                got.setdefault(parts[0], {})[int(parts[1])] = tuple(
                    float(v) for v in parts[2:])
    for tag in ("FLOWSUM", "EVAL", "SERVE"):
        assert set(got[tag]) == {0, 1}, got
        assert got[tag][0] == got[tag][1], (tag, got[tag])

    # single-process reference on this runner's own 8 CPU devices
    import jax
    import jax.numpy as jnp

    from opticalflow_tpu.engine import FlowEngine
    from opticalflow_tpu.evaluate import evaluate_pairs
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.parallel import mesh as meshlib
    from opticalflow_tpu.serve import FlowServer

    model = PWCDCNet(variant="new", precision="fast")
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 6)))["params"]
    engine = FlowEngine(model, params, mesh=meshlib.make_mesh())
    rng = np.random.RandomState(0)
    im1s = [rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(8)]
    im2s = [rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(8)]
    gts = [rng.randn(64, 64, 2).astype(np.float32) for _ in range(8)]

    flows = engine.flow_from_pairs(im1s, im2s, size_mode="pad")
    np.testing.assert_allclose(got["FLOWSUM"][0][0],
                               float(np.abs(flows).sum()), rtol=1e-6)

    ds = [{"im1": a, "im2": b, "flow": g, "stem": f"p{i}"}
          for i, (a, b, g) in enumerate(zip(im1s, im2s, gts))]
    res = evaluate_pairs(engine, ds, size_mode="pad", batch=8, verbose=False)
    np.testing.assert_allclose(got["EVAL"][0],
                               (res["epe"], res["fl_all"]), rtol=1e-6)

    server = FlowServer(engine, max_batch=8, max_delay_ms=1)
    flow = server.flow(im1s[0], im2s[0], size_mode="pad")
    server.close()
    np.testing.assert_allclose(got["SERVE"][0][0],
                               float(np.abs(flow).sum()), rtol=1e-6)
