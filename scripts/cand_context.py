"""Candidate bench: context-net dilated convs — XLA dilated lowering vs
space-to-depth per-phase regular convs; plus per-conv breakdown.

Run on the TPU:  python scripts/cand_context.py [B]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 112, 256     # Sintel L2 grid
LOOP_N = 20
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


def conv(x, k, stride=1, pad=1, dil=1, out_dtype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def space_to_depth_d(x, d):
    b, h, w, c = x.shape
    x = x.reshape(b, h // d, d, w // d, d, c)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b * d * d, h // d, w // d, c)


def depth_to_space_d(y, d, b):
    bd, h, w, c = y.shape
    y = y.reshape(b, d, d, h, w, c)
    y = jnp.transpose(y, (0, 3, 1, 4, 2, 5))
    return y.reshape(b, h * d, w * d, c)


def dilated_via_s2d(x, k, d, out_dtype=jnp.float32):
    b = x.shape[0]
    xp = space_to_depth_d(x, d)
    y = conv(xp, k, pad=1, out_dtype=out_dtype)
    return depth_to_space_d(y, d, b)


def main():
    rng = np.random.RandomState(0)
    specs = [("dc_conv1", 565, 128, 1), ("dc_conv2", 128, 128, 2),
             ("dc_conv3", 128, 128, 4), ("dc_conv4", 128, 96, 8),
             ("dc_conv5", 96, 64, 16), ("dc_conv6", 64, 32, 1),
             ("dc_conv7", 32, 2, 1)]
    ks = {n: jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, DT)
          for n, ci, co, _ in specs}

    def report(name, t):
        print(f"{name:34s} {t*1000:8.3f} ms", flush=True)

    # per-conv, XLA dilated
    for n, ci, co, d in specs:
        x = jnp.asarray(rng.rand(B, H, W, ci), DT)
        report(f"{n}({ci}->{co},d={d}) xla",
               chain_time(lambda xx, k=ks[n], dd=d:
                          lrelu(conv(xx, k, pad=dd, dil=dd)).astype(DT), x))
        if d > 1:
            report(f"{n}({ci}->{co},d={d}) s2d",
                   chain_time(lambda xx, k=ks[n], dd=d:
                              lrelu(dilated_via_s2d(xx, k, dd)).astype(DT), x))

    # whole chain: xla vs s2d
    x565 = jnp.asarray(rng.rand(B, H, W, 565), DT)

    def chain_xla(x):
        for n, ci, co, d in specs:
            x = lrelu(conv(x, ks[n], pad=d, dil=d)).astype(DT)
        return x

    def chain_s2d(x):
        for n, ci, co, d in specs:
            if d == 1:
                x = lrelu(conv(x, ks[n], pad=1)).astype(DT)
            else:
                x = lrelu(dilated_via_s2d(x, ks[n], d)).astype(DT)
        return x

    report("context_chain xla", chain_time(chain_xla, x565))
    report("context_chain s2d", chain_time(chain_s2d, x565))

    # heads: pf2 (565->2) + dc1 (565->128) separate vs fused [dc1|pf]
    kpf = jnp.asarray(rng.randn(3, 3, 565, 2) * 0.05, DT)
    kdc = ks["dc_conv1"]
    kfused = jnp.concatenate([kdc, kpf], axis=-1)   # (3,3,565,130) dc-first

    def heads_sep(x):
        f = conv(x, kpf, out_dtype=DT)
        d = lrelu(conv(x, kdc)).astype(DT)
        return jnp.mean(f) + jnp.mean(d)

    def heads_fused(x):
        y = conv(x, kfused, out_dtype=jnp.float32)
        d = lrelu(y[..., :128]).astype(DT)
        f = y[..., 128:]
        return jnp.mean(f) + jnp.mean(d)

    report("heads separate", chain_time(heads_sep, x565))
    report("heads fused[dc|pf]", chain_time(heads_fused, x565))

    # fused including next context conv? pf2 + dc1 computed, then dc2 reads dc1
    # (just to see if the slice breaks fusion)
    def heads_fused_chain(x):
        y = conv(x, kfused, out_dtype=jnp.float32)
        d = lrelu(y[..., :128]).astype(DT)
        f = y[..., 128:]
        d = lrelu(conv(d, ks["dc_conv2"], pad=2, dil=2)).astype(DT)
        return jnp.mean(f) + jnp.mean(d)

    def heads_sep_chain(x):
        f = conv(x, kpf, out_dtype=DT)
        d = lrelu(conv(x, kdc)).astype(DT)
        d = lrelu(conv(d, ks["dc_conv2"], pad=2, dil=2)).astype(DT)
        return jnp.mean(f) + jnp.mean(d)

    report("heads+dc2 separate", chain_time(heads_sep_chain, x565))
    report("heads+dc2 fused", chain_time(heads_fused_chain, x565))


if __name__ == "__main__":
    main()
