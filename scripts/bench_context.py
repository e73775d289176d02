"""Context-net dilated-conv variant microbench (VERDICT round-2 task 2).

Times each dc_conv and the whole dc1..dc7 chain at the headline L2 shape
(quarter-res of 448x1024) under several lowerings:

  * xla      — lax.conv_general_dilated with rhs_dilation (current default)
  * s2b      — space-to-batch(d) + plain conv + batch-to-space (the per-conv
               transform pair measured neutral in round 2)
  * tap9     — nine shifted slices, each a 1x1-style matmul, accumulated
               (XLA fuses the slices into the dots; trades conv window
               handling for 9 reads)
  * dense    — zero-stuffed dense (2d+1)^2 kernel (d<=2 only; 25/9 FLOPs at
               plain-conv MXU utilization)

Run on the TPU:  python scripts/bench_context.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 112, 256          # quarter-res of the 448x1024 headline shape
LOOP_N = 30
DT = jnp.bfloat16

SPECS = [  # (name, Cin, Cout, d) — reference models/PWCNet.py:126-132
    ("dc1", 128, 128, 1),
    ("dc2", 128, 128, 2),
    ("dc3", 128, 128, 4),
    ("dc4", 128, 96, 8),
    ("dc5", 96, 64, 16),
    ("dc6", 64, 32, 1),
]


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


def leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def conv_xla(x, k, b, d):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return leaky(y + b).astype(x.dtype)


def conv_s2b(x, k, b, d):
    if d == 1:
        return conv_xla(x, k, b, 1)
    n, h, w, c = x.shape
    xs = x.reshape(n, h // d, d, w // d, d, c).transpose(0, 2, 4, 1, 3, 5)
    xs = xs.reshape(n * d * d, h // d, w // d, c)
    y = jax.lax.conv_general_dilated(
        xs, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = leaky(y + b).astype(x.dtype)
    co = y.shape[-1]
    y = y.reshape(n, d, d, h // d, w // d, co).transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(n, h, w, co)


def conv_tap9(x, k, b, d):
    n, h, w, c = x.shape
    co = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = jnp.zeros((n, h, w, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = jax.lax.dynamic_slice(
                xp, (0, ky * d, kx * d, 0), (n, h, w, c))
            acc = acc + jnp.einsum(
                "nhwc,cd->nhwd", tap, k[ky, kx],
                preferred_element_type=jnp.float32)
    return leaky(acc + b).astype(x.dtype)


def conv_dense(x, k, b, d):
    kk = 2 * d + 1
    kd = jnp.zeros((kk, kk) + k.shape[2:], k.dtype)
    kd = kd.at[::d, ::d].set(k)
    y = jax.lax.conv_general_dilated(
        x, kd, (1, 1), [(d, d), (d, d)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return leaky(y + b).astype(x.dtype)


VARIANTS = {"xla": conv_xla, "s2b": conv_s2b, "tap9": conv_tap9,
            "dense": conv_dense}


def main():
    rng = np.random.RandomState(0)
    print(f"== context variants at B={B}, {H}x{W}, bf16 ==")
    weights = {}
    for name, ci, co, d in SPECS:
        weights[name] = (
            jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, DT),
            jnp.asarray(rng.randn(co) * 0.01, jnp.float32))

    for name, ci, co, d in SPECS:
        x = jnp.asarray(rng.rand(B, H, W, ci), DT)
        k, b = weights[name]
        row = [f"{name} (d={d:2d}, {ci}->{co}):"]
        for vname, fn in VARIANTS.items():
            if vname == "dense" and d > 2:
                row.append(f"{vname}=-")
                continue
            if vname == "s2b" and d == 1:
                row.append(f"{vname}=-")
                continue
            t = chain_time(lambda xx, kk=k, bb=b, dd=d, f=fn: f(xx, kk, bb, dd), x)
            row.append(f"{vname}={t*1e3:6.2f}ms")
        print("  ".join(row), flush=True)

    # whole chains
    x0 = jnp.asarray(rng.rand(B, H, W, 128), DT)

    def chain(fn_by_d):
        def run(x):
            h = x
            for name, ci, co, d in SPECS:
                k, b = weights[name]
                h = fn_by_d(d)(h, k, b, d)
            return h
        return run

    t = chain_time(chain(lambda d: conv_xla), x0)
    print(f"chain all-xla:            {t*1e3:6.2f} ms", flush=True)
    t = chain_time(chain(lambda d: conv_tap9 if d > 1 else conv_xla), x0)
    print(f"chain tap9(d>1):          {t*1e3:6.2f} ms", flush=True)
    t = chain_time(chain(lambda d: conv_s2b if d > 1 else conv_xla), x0)
    print(f"chain s2b(d>1):           {t*1e3:6.2f} ms", flush=True)

    def mixed(d):
        if d == 2:
            return conv_dense
        if d > 2:
            return conv_tap9
        return conv_xla
    t = chain_time(chain(mixed), x0)
    print(f"chain dense2+tap9(d>2):   {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
