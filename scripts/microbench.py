"""Per-stage microbenchmark at Sintel 448x1024 (honest chained-loop timing).

Times each forward-pass stage as its own on-device ``lax.fori_loop`` chain
with one scalar readback (the only reliable method behind the async relay —
see PERF.md "methodology").  Run on the TPU:

    python scripts/microbench.py [B]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflow_tpu.models import pwcnet as P
from opticalflow_tpu.ops.warp import warp_with_mask
from opticalflow_tpu.ops.correlation import correlation
from opticalflow_tpu.ops.convops import conv2d, leaky_relu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 448, 1024
LOOP_N = 30
DT = jnp.bfloat16


def chain_time(fn, *args, n=LOOP_N, repeats=3):
    """Seconds per call of fn(*args), fn chained n times on device."""
    @jax.jit
    def run(*a):
        def body(i, acc):
            out = fn(*(x + (i + acc).astype(x.dtype) * jnp.asarray(1e-12, x.dtype)
                       for x in a))
            return acc + jnp.mean(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))  # compile+warm
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

    def clr(x, mod, stride=1, padding=1, dilation=1):
        k = params[mod]["kernel"].astype(DT)
        b = params[mod]["bias"]
        return leaky_relu(conv2d(x, k, b, stride=stride, padding=padding,
                                 dilation=dilation,
                                 out_dtype=jnp.float32)).astype(DT)

    rng = np.random.RandomState(0)

    def report(name, t):
        print(f"{name:30s} {t*1000:8.3f} ms", flush=True)

    # ---- level-1 pyramid trio (2B batch) ----
    x1 = jnp.asarray(rng.rand(2 * B, H, W, 3), DT)

    def lvl1(x):
        x = clr(x, "conv1a", stride=2)
        x = clr(x, "conv1aa")
        return clr(x, "conv1b")
    report("lvl1_trio(2B)", chain_time(lvl1, x1))

    # ---- level-2 trio ----
    x2 = jnp.asarray(rng.rand(2 * B, H // 2, W // 2, 16), DT)

    def lvl2(x):
        x = clr(x, "conv2a", stride=2)
        x = clr(x, "conv2aa")
        return clr(x, "conv2b")
    report("lvl2_trio(2B)", chain_time(lvl2, x2))

    # ---- levels 3-6 trios ----
    x3 = jnp.asarray(rng.rand(2 * B, H // 4, W // 4, 32), DT)

    def lvl36(x):
        for lvl, ch in ((3, 64), (4, 96), (5, 128)):
            x = clr(x, f"conv{lvl}a", stride=2)
            x = clr(x, f"conv{lvl}aa")
            x = clr(x, f"conv{lvl}b")
        x = clr(x, "conv6aa", stride=2)
        x = clr(x, "conv6a")
        return clr(x, "conv6b")
    report("lvl3-6_trios(2B)", chain_time(lvl36, x3))

    # ---- L2 dense block (5 convs + concats), input 117ch at 112x256 ----
    xin = jnp.asarray(rng.rand(B, H // 4, W // 4, 117), DT)

    def dense2(x):
        for i in range(5):
            y = clr(x, f"conv2_{i}")
            x = jnp.concatenate((y, x), axis=-1)
        return x
    report("dense_block_L2", chain_time(dense2, xin))

    # ---- heads: predict_flow2 (565->2) + dc_conv1 (565->128) ----
    xf = jnp.asarray(rng.rand(B, H // 4, W // 4, 565), DT)

    def heads(x):
        k = params["predict_flow2"]["kernel"].astype(DT)
        b = params["predict_flow2"]["bias"]
        f = conv2d(x, k, None, stride=1, padding=1, out_dtype=DT)
        f = f.astype(jnp.float32) + b
        d = clr(x, "dc_conv1")
        return jnp.mean(f) + jnp.mean(d)
    report("pf2+dc1_heads", chain_time(heads, xf))

    # ---- context net (dc_conv1..7) ----
    def context(x):
        d = x
        for i, dil in enumerate((1, 2, 4, 8, 16, 1), start=1):
            d = clr(d, f"dc_conv{i}", padding=dil, dilation=dil)
        k = params["dc_conv7"]["kernel"].astype(DT)
        b = params["dc_conv7"]["bias"]
        f = conv2d(d, k, None, stride=1, padding=1, out_dtype=DT)
        return f.astype(jnp.float32) + b
    report("context_net(565in)", chain_time(context, xf))

    # ---- warp at L2 shape ----
    c2 = jnp.asarray(rng.rand(B, H // 4, W // 4, 64), DT)
    fl = jnp.asarray(rng.rand(B, H // 4, W // 4, 2) * 8 - 4, jnp.float32)
    report("warp_L2(64ch)", chain_time(
        lambda c, f: warp_with_mask(c, f, mask_threshold=0.9999), c2, fl))

    # ---- correlation at L2 (the big one) + all levels ----
    for lvl, ch in ((2, 32), (3, 64), (4, 96), (5, 128), (6, 196)):
        s = 2 ** lvl
        a = jnp.asarray(rng.rand(B, H // s, W // s, ch), DT)
        bb = jnp.asarray(rng.rand(B, H // s, W // s, ch), DT)
        report(f"corr_L{lvl}({H//s}x{W//s}x{ch})",
               chain_time(lambda u, v: correlation(u, v), a, bb))

    # ---- full forward ----
    x = jnp.asarray(rng.rand(B, H, W, 6), jnp.float32)
    report("FULL_forward", chain_time(
        lambda xx: model.apply({"params": params}, xx), x, n=15))


if __name__ == "__main__":
    main()
