"""Chunked-dispatch bench: run a large batch as lax.map over B=chunk steps.

Round-3 measured a sharp batch-8 throughput peak (329 pairs/s/chip) with
larger monolithic programs landing 10-30% lower (B=10 -> 226, B=32 -> 295)
and B>=96 OOMing.  Hypothesis: mapping the B=8 program over sub-chunks
INSIDE one jit program keeps the peak schedule at any multiple-of-8 batch
and flattens both the cliff and the memory knee.

    python scripts/bench_chunked.py batch=32 chunk=8
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

    batch, chunk = 32, 8
    global H, W, LOOP_N
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "batch":
            batch = int(v)
        elif k == "chunk":
            chunk = int(v)
        elif k == "h":
            H = int(v)
        elif k == "w":
            W = int(v)
        elif k == "loop":
            LOOP_N = int(v)
    assert batch % chunk == 0, (batch, chunk)
    k_chunks = batch // chunk

    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    x0 = jax.random.uniform(key, (k_chunks, chunk, H, W, 6), jnp.float32)

    @jax.jit
    def bench(p, x):
        def body(i, acc):
            out = jax.lax.map(
                lambda c: model.apply({"params": p}, c),
                x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.mean(out)
        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    @jax.jit
    def overhead(x):
        return jnp.mean(x)

    float(overhead(x0))
    t0 = time.perf_counter()
    float(bench(params, x0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        float(overhead(x0))
    ovh = (time.perf_counter() - t0) / REPEATS
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        float(bench(params, x0))
    per_step = ((time.perf_counter() - t0) / REPEATS - ovh) / LOOP_N
    print(json.dumps({"batch": batch, "chunk": chunk,
                      "compile_s": round(compile_s, 1),
                      "ms_per_batch": round(per_step * 1000, 2),
                      "pairs_per_sec": round(batch / per_step, 2)}))


if __name__ == "__main__":
    main()
