"""Training-step throughput: supervised multiscale fine-tune, one chip.

Mirrors the reference's fine-tune regime (train2.py: multiscale Charbonnier,
AdamW, grad-clip) at the KITTI crop the reference trains with (320×896,
``train.py:112-118``). Chained-loop timing like bench.py.

    python scripts/bench_train.py [batch] [remat] [grad_accum]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 320, 896          # reference fine-tune crop (train.py:115)
LOOP_N = 10
REPEATS = 3
# Algebraic flops of one fwd+bwd+AdamW pair at (H, W), no remat, from XLA
# lowering-level cost_analysis on the CPU backend (the axon backend can't
# report it — same story as bench.py's FLOPS_PER_PAIR).  ≈2.98× the
# forward at this crop.  Guarded by tests/test_bench_pins.py; re-pin with
# any default-graph or trainer change.  Remat modes execute MORE flops
# than this pin (recompute), so mfu is only emitted for remat=off.
TRAIN_FLOPS_PER_PAIR = 3.36399e11


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.trainer import (TrainConfig,
                                               create_train_state,
                                               make_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # argv[2]: remat mode — 0 (off), 1 (full forward), or "l2" (selective)
    raw = sys.argv[2] if len(sys.argv) > 2 else "0"
    remat = raw if raw == "l2" else bool(int(raw))
    accum = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    cfg = TrainConfig(loss="multiscale", optimizer="adamw", lr=1e-4,
                      remat=remat, grad_accum=accum)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   sample_shape=(1, 64, 64, 6))
    step = make_train_step(model, tx, cfg)

    key = jax.random.PRNGKey(1)
    batch_data = {
        "images": jax.random.uniform(key, (batch, H, W, 6), jnp.float32),
        "flow": jax.random.normal(key, (batch, H, W, 2), jnp.float32) * 4,
        "valid": jnp.ones((batch, H, W), jnp.float32),
    }

    @jax.jit
    def chain(state, data):
        def body(i, s):
            d = {k: (v + i.astype(jnp.float32) * 1e-6
                     if v.dtype == jnp.float32 else v)
                 for k, v in data.items()}
            s2, _ = step(s, d)
            return s2
        return jax.lax.fori_loop(0, LOOP_N, body, state)

    @jax.jit
    def overhead(data):
        return jnp.float32(0) + jnp.mean(data["images"])

    float(overhead(batch_data))
    out = chain(state, batch_data)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        float(overhead(batch_data))
    ovh = (time.perf_counter() - t0) / REPEATS

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        jax.block_until_ready(chain(state, batch_data))
    per_step = ((time.perf_counter() - t0) / REPEATS - ovh) / LOOP_N

    rec = {
        "metric": f"train_step_{H}x{W}_pairs_per_sec_per_chip",
        "batch": batch, "remat": str(remat), "grad_accum": accum,
        "ms_per_step": round(per_step * 1000, 2),
        "pairs_per_sec": round(batch / per_step, 2),
    }
    if not remat:  # pin only covers the no-recompute graph
        rec["mfu"] = round(
            TRAIN_FLOPS_PER_PAIR * batch / per_step / 197e12, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
