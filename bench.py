"""Headline benchmark: Sintel-resolution frame-pairs/sec/chip.

Measures sustained inference throughput of the full forward (bf16 compute,
f32 flow heads/accumulation) at Sintel 436×1024 padded to 448×1024 — the
BASELINE.json north-star config (target ≥200 frame-pairs/sec/chip, v5e).

Methodology: N forwards chained in one on-device ``lax.fori_loop`` with a
single scalar readback, minus the measured per-call overhead — per-call
host-side timing is unreliable on relayed/async TPU runtimes (dispatch can
return before completion, and per-call overhead here is ~30 ms).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
scoreboard-depth fields {"latency_ms", "batch", "mfu"} (VERDICT r3 #6) —
the driver parser reads the first four; the extras make efficiency
regressions visible, not just the pinned-batch throughput.
"""

from __future__ import annotations

import json
import time

BASELINE_PAIRS_PER_SEC = 200.0  # BASELINE.json north_star
H, W = 448, 1024                # Sintel 436x1024 padded to /64
# Algebraic flops of one forward pair at (H, W) on the DEFAULT graph
# (bf16-fast, B=8 ⇒ blocked-auto ON), from XLA lowering-level
# cost_analysis on the CPU backend.  The axon backend can't produce this
# (None / 45×-low through the relay), so bench.py falls back to this pin
# for the mfu field.  Guarded by tests/test_bench_pins.py — re-pin there
# and here together with any default-graph change (same trigger as
# scripts/reseed_bench_cache.py).
FLOPS_PER_PAIR = 1.80522e11
# B=8 is the measured throughput peak on v5e (round-3 sweep, PERF.md):
# the blocked level-1/2 pipeline (auto-on below pair-batch 32) clears
# 329 pairs/s/chip there vs 297 at the former B=64 config; neighbors
# B=6/10/12 land far lower (237/226/258), so the peak is batch-exact.
BATCH = 8
LOOP_N = 20
REPEATS = 3


def main() -> None:
    # ~/.cache is wiped on machine resets; the repo carries a seed of the
    # warm compilation cache so this bench never hits the ~8-10 min cold
    # remote-AOT compile under the driver's time budget (see
    # opticalflow_tpu/utils/cache_seed.py and the round-2 postmortem).
    from opticalflow_tpu.utils.cache_seed import restore_cache_seed
    restore_cache_seed(verbose=False)

    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet, FLOW_SCALE

    n_dev = jax.local_device_count()
    batch = BATCH * n_dev

    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    key = jax.random.PRNGKey(0)
    # jit the init: run eagerly it is thousands of relay round-trips
    # (~30 ms each ≈ 4-5 min of pure dispatch latency); as one compiled
    # program it is seconds, and the executable rides the persistent cache.
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    x0 = jax.random.uniform(key, (batch, H, W, 6), jnp.float32)

    @jax.jit
    def bench(p, x):
        def body(i, acc):
            out = model.apply({"params": p},
                              x + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.mean(out * FLOW_SCALE)
        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    @jax.jit
    def overhead(x):
        return jnp.mean(x)

    float(overhead(x0))
    t0 = time.perf_counter()
    float(bench(params, x0))  # compile + warmup
    compile_s = time.perf_counter() - t0

    # Cold-cache guard: if the warmup hit a cold compile (~8-10 min via the
    # remote AOT service when the persistent XLA cache misses), drop to one
    # repeat so the driver's time budget still captures an honest number.
    repeats = 1 if compile_s > 60.0 else REPEATS

    t0 = time.perf_counter()
    for _ in range(repeats):
        float(overhead(x0))
    ovh = (time.perf_counter() - t0) / repeats

    # Keep whatever repeats complete: a relay hiccup after the warmup must
    # not cost the recorded number (the warmup already proved one full run).
    times = []
    try:
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(bench(params, x0))
            times.append(time.perf_counter() - t0)
    except Exception:
        if not times:
            raise
    per_step = (sum(times) / len(times) - ovh) / LOOP_N

    per_chip = batch / per_step / n_dev
    rec = {
        "metric": "sintel_448x1024_frame_pairs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PAIRS_PER_SEC, 3),
        # one dispatched step, ms (the serving-relevant time-to-result;
        # per-pair amortized = this / batch).  batch is the ACTUAL timed
        # batch (BATCH per device × n_dev) so latency_ms/batch stays
        # consistent on multi-device hosts.
        "latency_ms": round(per_step * 1e3, 3),
        "batch": batch,
        "n_dev": n_dev,
    }
    # MFU from XLA's lowering-level cost analysis (algebraic flops of the
    # lowered forward).  The axon backend returns None from
    # Lowered.cost_analysis() and its COMPILED-level analysis is unusable
    # through the relay (measured 45× low), so fall back to FLOPS_PER_PAIR,
    # pinned from the CPU backend for this exact default graph and guarded
    # by tests/test_bench_pins.py.  Peak: v5e bf16 ≈ 197 TFLOP/s
    # (PERF.md "headroom").
    flops_per_step = FLOPS_PER_PAIR * batch
    try:
        low = jax.jit(lambda x: model.apply({"params": params}, x)).lower(
            jax.ShapeDtypeStruct((batch, H, W, 6), jnp.float32))
        analysis = low.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        if analysis is not None and "flops" in analysis:
            flops_per_step = float(analysis["flops"])
    except Exception:
        pass  # keep the pinned fallback
    rec["mfu"] = round(flops_per_step / per_step / (197e12 * n_dev), 4)

    # Single-pair device latency (VERDICT r4 task 3): the canonical contract
    # is a single-pair CLI (reference script_pwc.py:34-39), so B=1 on-device
    # latency is a scoreboard metric alongside the batched throughput.
    # Same chained-loop methodology; B=1 on ONE device (x0 is unsharded, so
    # slicing n_dev rows would time a batch-n_dev single-device program —
    # and a different auto-flag graph — on multi-device hosts).
    x1 = x0[:1]
    try:
        t0 = time.perf_counter()
        float(bench(params, x1))  # compile (cached via seed) + warm
        b1_compile_s = time.perf_counter() - t0
        b1_repeats = 1 if b1_compile_s > 60.0 else repeats
        times1 = []
        for _ in range(b1_repeats):
            t0 = time.perf_counter()
            float(bench(params, x1))
            times1.append(time.perf_counter() - t0)
        rec["latency_b1_ms"] = round(
            (sum(times1) / len(times1) - ovh) / LOOP_N * 1e3, 3)
    except Exception:
        pass  # B=1 latency is auxiliary; never cost the headline record
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
