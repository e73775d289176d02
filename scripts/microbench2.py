"""Variant timing: original level-1 trio + conv2a vs the blocked chain.

Both compute the same endpoint (conv2a output at H/4 + the level-1 features
needed by nothing else), so wall-clock is directly comparable.
Run on the TPU:  python scripts/microbench2.py [B]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflow_tpu.models import pwcnet as P
from opticalflow_tpu.ops.convops import conv2d, leaky_relu
from opticalflow_tpu.ops import blocked as BL

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 448, 1024
LOOP_N = 30
DT = jnp.bfloat16


def chain_time(fn, *args, n=LOOP_N, repeats=3):
    @jax.jit
    def run(*a):
        def body(i, acc):
            out = fn(*(x + (i + acc).astype(x.dtype) * jnp.asarray(1e-12, x.dtype)
                       for x in a))
            return acc + jnp.mean(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    key = jax.random.PRNGKey(0)
    model = P.PWCDCNet(variant="new", dtype=DT, precision="fast")
    params = model.init(key, jnp.zeros((1, 64, 64, 6), jnp.float32))["params"]

    k1a = params["conv1a"]["kernel"]
    k1aa = params["conv1aa"]["kernel"]
    k1b = params["conv1b"]["kernel"]
    k2a = params["conv2a"]["kernel"]
    b1a, b1aa, b1b, b2a = (params[m]["bias"]
                           for m in ("conv1a", "conv1aa", "conv1b", "conv2a"))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2 * B, H, W, 3), DT)

    def orig(xx):
        y = leaky_relu(conv2d(xx, k1a.astype(DT), b1a, stride=2, padding=1,
                              out_dtype=jnp.float32)).astype(DT)
        y = leaky_relu(conv2d(y, k1aa.astype(DT), b1aa, stride=1, padding=1,
                              out_dtype=jnp.float32)).astype(DT)
        y = leaky_relu(conv2d(y, k1b.astype(DT), b1b, stride=1, padding=1,
                              out_dtype=jnp.float32)).astype(DT)
        z = leaky_relu(conv2d(y, k2a.astype(DT), b2a, stride=2, padding=1,
                              out_dtype=jnp.float32)).astype(DT)
        return jnp.mean(z)

    kb1a = BL.blocked_s2_kernel(k1a).astype(DT)
    kb1aa = BL.blocked_s1_kernel(k1aa).astype(DT)
    kb1b = BL.blocked_s1_kernel(k1b).astype(DT)
    kb2a = BL.blocked_consumer_kernel(k2a).astype(DT)
    bb1a = BL.to_blocked_bias(b1a)
    bb1aa = BL.to_blocked_bias(b1aa)
    bb1b = BL.to_blocked_bias(b1b)

    def blocked(xx):
        y = BL.conv_blocked_s2(xx, kb1a, out_dtype=jnp.float32)
        y = leaky_relu(y + bb1a).astype(DT)
        y = leaky_relu(BL.conv_blocked_s1(y, kb1aa, out_dtype=jnp.float32)
                       + bb1aa).astype(DT)
        y = leaky_relu(BL.conv_blocked_s1(y, kb1b, out_dtype=jnp.float32)
                       + bb1b).astype(DT)
        z = leaky_relu(BL.conv_blocked_consumer(y, kb2a,
                                                out_dtype=jnp.float32)
                       + b2a).astype(DT)
        return jnp.mean(z)

    t_orig = chain_time(orig, x)
    t_blk = chain_time(blocked, x)
    print(f"orig lvl1+conv2a    {t_orig*1000:8.3f} ms")
    print(f"blocked lvl1+conv2a {t_blk*1000:8.3f} ms   "
          f"({t_orig/t_blk:.2f}x)")


if __name__ == "__main__":
    main()
