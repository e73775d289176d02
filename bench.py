"""Headline benchmark: Sintel-resolution frame-pairs/sec/chip.

Measures sustained inference throughput of the full jit pipeline (forward +
×20 descale) at Sintel 436×1024 padded to 448×1024, the BASELINE.json
north-star config (target ≥200 frame-pairs/sec/chip on TPU v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 200.0  # BASELINE.json north_star
H, W = 448, 1024                # Sintel 436x1024 padded to /64


def main() -> None:
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet, FLOW_SCALE

    n_dev = jax.local_device_count()
    batch = 8 * n_dev

    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]

    @jax.jit
    def step(params, x):
        return model.apply({"params": params}, x) * FLOW_SCALE

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(batch, H, W, 6).astype(np.float32))
          for _ in range(2)]

    # warmup / compile
    np.asarray(step(params, xs[0]))

    # NB: this environment's TPU runs behind an async relay where
    # block_until_ready can return before device completion — force a real
    # device->host transfer per iteration to time honestly.
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(step(params, xs[i % 2]))
    dt = time.perf_counter() - t0

    pairs_per_sec = iters * batch / dt
    per_chip = pairs_per_sec / n_dev
    print(json.dumps({
        "metric": "sintel_448x1024_frame_pairs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(per_chip / BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
