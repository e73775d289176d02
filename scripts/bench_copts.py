"""bench_flags variant that passes XLA compiler options to the TPU compile.

TPU-only flags can't go through XLA_FLAGS here (the local CPU XLA client
aborts on unknown flags); they must ride the compile request:

    python scripts/bench_copts.py batch=8 xla_tpu_scoped_vmem_limit_kib=98304

Every non-batch/h/w key=value argv pair is forwarded verbatim as a
compiler option of the benched program.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, LOOP_N, REPEATS = 448, 1024, 20, 3


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet

    copts = {}
    batch = 8
    global H, W
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "h":
            H = int(v)
        elif k == "w":
            W = int(v)
        else:
            copts[k] = v

    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    x0 = jax.random.uniform(key, (batch, H, W, 6), jnp.float32)

    def bench_fn(p, x):
        def body(i, acc):
            out = model.apply({"params": p}, x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    bench = (jax.jit(bench_fn).lower(params, x0)
             .compile(compiler_options=copts or None))

    @jax.jit
    def overhead(x):
        return jnp.mean(x)

    float(overhead(x0)); float(bench(params, x0))
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        float(overhead(x0))
    ovh = (time.perf_counter() - t0) / REPEATS
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        float(bench(params, x0))
    per_step = ((time.perf_counter() - t0) / REPEATS - ovh) / LOOP_N
    print(json.dumps({"copts": copts, "batch": batch,
                      "ms_per_batch": round(per_step * 1000, 2),
                      "pairs_per_sec": round(batch / per_step, 2)}))


if __name__ == "__main__":
    main()
