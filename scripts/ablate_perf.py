"""Forward-pass ablation: where do the milliseconds go at Sintel resolution?

Times model variants with pieces knocked out (shapes preserved) on-device,
input generated on-device, scalar readback per iteration (honest timing
through the async relay).  Run on the TPU:  python scripts/ablate_perf.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn

from opticalflow_tpu.models import pwcnet as P
from opticalflow_tpu.ops.warp import warp_with_mask
from opticalflow_tpu.ops.correlation import correlation
from opticalflow_tpu.models import pwcnet as _pw


class AblatedPWC(P.PWCDCNet):
    """PWCDCNet with pieces replaced by shape-preserving stubs."""
    no_corr: bool = False
    no_warp: bool = False
    no_dense: bool = False

    def _corr(self, a, b):
        if self.no_corr:
            z = jnp.zeros(a.shape[:-1] + ((2 * self.md + 1) ** 2,), a.dtype)
            return z + 0.01 * jnp.mean(a + b)   # keep inputs alive
        return super()._corr(a, b)

    def _dense_block(self, x, level):
        if self.no_dense:
            # one cheap projection to the expected channel count
            pad = sum(P.ESTIMATOR_CHANNELS)
            return jnp.concatenate(
                [x, jnp.broadcast_to(jnp.mean(x, -1, keepdims=True),
                                     x.shape[:-1] + (pad,))], axis=-1)
        return super()._dense_block(x, level)


def main():
    B, H, W = 4, 448, 1024
    key = jax.random.PRNGKey(0)
    variants = {
        "full_pallas": dict(),
        "no_warp": dict(no_warp=True),
        "no_dense": dict(no_dense=True),
        "no_corr_warp": dict(no_corr=True, no_warp=True),
    }
    base = dict(variant="new", dtype=jnp.bfloat16, precision="fast")
    results = {}
    for name, kw in variants.items():
        no_warp = kw.pop("no_warp", False)
        model = AblatedPWC(**base, **kw)
        if no_warp:
            _pw.warp_with_mask = lambda x, f, mask_threshold=0.9999: (
                x + 0.01 * jnp.mean(f))
        else:
            _pw.warp_with_mask = warp_with_mask
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



if __name__ == "__main__":
    main()
