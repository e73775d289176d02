"""Forward-pass ablation: where do the milliseconds go at Sintel resolution?

Times model variants with pieces knocked out (shapes preserved) on-device,
input generated on-device, scalar readback per iteration (honest timing
through the async relay).  Run on the TPU:  python scripts/ablate_perf.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from opticalflow_tpu.models import pwcnet as P
from opticalflow_tpu.ops.warp import warp_with_mask
from opticalflow_tpu.ops.correlation import correlation


class AblatedPWC(P.PWCDCNet):
    """PWCDCNet with correlation and/or warp replaced by shape-preserving
    stubs, to attribute time."""
    no_corr: bool = False
    no_warp: bool = False

    def _corr(self, a, b):
        if self.no_corr:
            z = jnp.zeros(a.shape[:-1] + ((2 * self.md + 1) ** 2,), a.dtype)
            return z + 0.01 * jnp.mean(a + b)   # keep inputs alive
        return super()._corr(a, b)


def main():
    B, H, W = 4, 448, 1024
    key = jax.random.PRNGKey(0)
    variants = {
        "full_pallas": dict(),
        "full_laxcorr": dict(use_pallas_corr=False),
        "no_corr": dict(no_corr=True),
    }
    base = dict(variant="new", dtype=jnp.bfloat16, precision="fast")
    results = {}
    for name, kw in variants.items():
        model = AblatedPWC(**base, **kw)
        params = model.init(key, jnp.zeros((1, 64, 64, 6)))["params"]

        @jax.jit
        def step(p, k):
            x = jax.random.uniform(k, (B, H, W, 6), jnp.float32)
            return jnp.mean(model.apply({"params": p}, x))

        t0 = time.perf_counter()
        float(step(params, key))
        tc = time.perf_counter() - t0
        n = 6
        t0 = time.perf_counter()
        for i in range(n):
            float(step(params, jax.random.fold_in(key, i)))
        dt = (time.perf_counter() - t0) / n
        results[name] = dt
        print(f"{name:16s} compile {tc:6.1f}s   {dt * 1000:7.1f} ms/batch   "
              f"{B / dt:7.1f} pairs/s", flush=True)

    # warp-only microbench at L2 scale
    c2 = jax.random.normal(key, (B, 112, 256, 32))
    fl = jax.random.normal(key, (B, 112, 256, 2)) * 3

    @jax.jit
    def warp_step(c, f):
        return jnp.mean(warp_with_mask(c, f))

    float(warp_step(c2, fl))
    t0 = time.perf_counter()
    for _ in range(10):
        float(warp_step(c2, fl))
    print(f"warp L2 alone: {(time.perf_counter() - t0) / 10 * 1000:.2f} ms",
          flush=True)

    @jax.jit
    def corr_step(c, f):
        return jnp.mean(correlation(c, f))

    float(corr_step(c2, c2))
    t0 = time.perf_counter()
    for _ in range(10):
        float(corr_step(c2, c2))
    print(f"corr L2 alone: {(time.perf_counter() - t0) / 10 * 1000:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
