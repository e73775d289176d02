"""On-TPU parity probe: use_pallas_context on vs off (fast mode, B=2)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 192, 256, 6), jnp.float32)
    m0 = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast",
                  use_pallas_context=False)
    m1 = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast",
                  use_pallas_context=True)
    params = m0.init(key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]
    o0 = np.asarray(jax.jit(lambda p, v: m0.apply({"params": p}, v))(params, x))
    o1 = np.asarray(jax.jit(lambda p, v: m1.apply({"params": p}, v))(params, x))
    d = np.abs(o0 - o1)
    epe = np.sqrt(((o0 - o1) ** 2).sum(-1)).mean()
    print(f"max abs diff {d.max():.3e}  mean {d.mean():.3e}  EPE {epe:.3e}")
    assert d.max() < 5e-2, "pallas context path diverges beyond bf16 noise"
    print("OK")


if __name__ == "__main__":
    main()
