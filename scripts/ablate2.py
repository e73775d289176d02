"""In-model ablation at B=32, honest chained-loop timing.

Each variant replaces one subsystem with a shape-preserving stub; the delta
vs the full model is that subsystem's true in-model cost (fusion included).
Run on the TPU:  python scripts/ablate2.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflow_tpu.models import pwcnet as P

B, H, W, LOOP_N = 32, 448, 1024, 20


class Ablated(P.PWCDCNet):
    no_corr: bool = False
    no_warp: bool = False
    no_dense: bool = False

    def _corr(self, a, b):
        if self.no_corr:
            z = jnp.zeros(a.shape[:-1] + ((2 * self.md + 1) ** 2,), a.dtype)
            return z + 0.01 * jnp.mean(a + b).astype(a.dtype)
        return super()._corr(a, b)

    def _dense_block(self, x, level):
        if self.no_dense:
            pad = sum(P.ESTIMATOR_CHANNELS)
            return jnp.concatenate(
                [x, jnp.broadcast_to(jnp.mean(x, -1, keepdims=True),
                                     x.shape[:-1] + (pad,))], axis=-1)
        return super()._dense_block(x, level)


def main():
    from opticalflow_tpu.ops.warp import warp_with_mask as real_warp
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (B, H, W, 6), jnp.float32)
    variants = {
        "full": {},
        "no_warp": {"no_warp": True},
        "no_dense": {"no_dense": True},
        "no_corr": {"no_corr": True},
        "no_fused_no_blocked": {"use_fused_estimator": False,
                                "use_blocked_lvl1": False},
    }
    for name, kw in variants.items():
        no_warp = kw.pop("no_warp", False)
        P.warp_with_mask = ((lambda x, f, mask_threshold=0.9999:
                             x * (1.0 + 0.01 * jnp.mean(f).astype(x.dtype)))
                            if no_warp else real_warp)
        model = Ablated(variant="new", dtype=jnp.bfloat16, precision="fast",
                        **kw)
        params = model.init(key, jnp.zeros((1, 64, 64, 6)))["params"]

        @jax.jit
        def run(p, x):
            def body(i, acc):
                out = model.apply({"params": p},
                                  x + i.astype(jnp.float32) * 1e-6)
                return acc + jnp.mean(out)
            return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

        float(run(params, x0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:22s} {best/LOOP_N*1000:7.2f} ms/batch "
              f"({B/(best/LOOP_N):6.1f} pairs/s)", flush=True)
    P.warp_with_mask = real_warp


if __name__ == "__main__":
    main()
