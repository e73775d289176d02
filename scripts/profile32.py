"""Op-level device profile of the headline bench program (B=32, bf16 fast).

Traces the same fori-loop program bench.py times (so the XLA compile cache is
reused), converts the xplane capture to HLO op stats, and prints the top ops
by self time.  Run on the TPU:  python scripts/profile32.py [flags...]
(flags forwarded to the model like bench_flags.py, e.g. use_blocked_lvl1=0)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, LOOP_N, BATCH = 448, 1024, 20, 32
LOGDIR = "/tmp/oftpu_profile"


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet

    global BATCH
    flags = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            BATCH = int(v)
        else:
            flags[k] = bool(int(v))

    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast",
                     **flags)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    x0 = jax.random.uniform(key, (BATCH, H, W, 6), jnp.float32)

    @jax.jit
    def bench(p, x):
        def body(i, acc):
            out = model.apply({"params": p}, x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    float(bench(params, x0))  # compile (cached) + warm

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    float(bench(params, x0))
    jax.profiler.stop_trace()

    pbs = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", pbs, flush=True)
    if not pbs:
        return 1
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("hlo_op_stats", "op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(pbs, tool, {})
            out = f"/tmp/profile32_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
            break
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
