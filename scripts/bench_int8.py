"""Microbench: does XLA-TPU lower int8 convolutions to the int8 MXU path?

v5e int8 peak is ~2x bf16 (394 vs 197 TOPS).  If an int8
`lax.conv_general_dilated` (preferred_element_type=int32) beats the same
conv in bf16, a post-training-quantized serving mode is worth building;
if it doesn't (XLA upcasts or the MXU int8 path isn't reachable), record
the negative in PERF.md and stop.

Times an on-device chained fori_loop like bench.py (per-call host timing
is unreliable through the relay — CLAUDE.md).

    python scripts/bench_int8.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

# L2-dense-block-ish shapes at the bench resolution (448x1024 quarter res
# is 112x256 at level 2; piece convs are ~128 in / 128 out 3x3)
B, H, W = 8, 112, 256
SHAPES = [
    (128, 128, "3x3 128->128"),
    (256, 128, "3x3 256->128"),
    (565, 128, "3x3 565->128 (dense head in)"),
]
LOOP_N = 200  # per-call overhead ~30 ms through the relay; amortize it


def timed(fn, x, w):
    """Chained fori_loop: each iteration's weights depend on the previous
    output (scalar feedback, no zero-multiplies XLA could fold), so the
    conv can neither be hoisted nor DCE'd; single scalar readback."""
    def body(i, wc):
        y = fn(x, wc)
        return wc + (jnp.max(y) % 3).astype(wc.dtype)

    @jax.jit
    def run(x, w):
        out = lax.fori_loop(0, LOOP_N, body, w)
        return jnp.sum(out.astype(jnp.float32))

    r = run(x, w)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(x, w)
    float(r)
    return (time.perf_counter() - t0) / LOOP_N


def main():
    dn = lax.conv_dimension_numbers((B, H, W, 1), (3, 3, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    for cin, cout, name in SHAPES:
        xk, wk = jax.random.split(jax.random.fold_in(key, cin))
        xb = jax.random.normal(xk, (B, H, W, cin), jnp.bfloat16)
        wb = jax.random.normal(wk, (3, 3, cin, cout), jnp.bfloat16)
        xi = (jax.random.normal(xk, (B, H, W, cin)) * 16).astype(jnp.int8)
        wi = (jax.random.normal(wk, (3, 3, cin, cout)) * 16).astype(jnp.int8)

        def conv_bf16(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        def conv_int8(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        # the realistic serving form: bf16 activations quantized inline
        # (dynamic per-tensor scale), int8 MXU conv, dequant + bias in f32.
        # If the VPU quant/dequant overhead eats the MXU win, int8 serving
        # isn't worth building.
        wscale = (jnp.max(jnp.abs(wb.astype(jnp.float32)), axis=(0, 1, 2))
                  / 127.0 + 1e-12)
        wq = jnp.clip(jnp.round(wb.astype(jnp.float32) / wscale),
                      -127, 127).astype(jnp.int8)

        def conv_qdq(x, w):
            xf = x.astype(jnp.float32)
            sx = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                xq, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (sx * wscale)).astype(jnp.bfloat16)

        def conv_qdq_static(x, w):
            # calibrated (static) activation scale: no on-line max reduce,
            # just an elementwise round/clip/cast XLA can fuse
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / 4.0)),
                          -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                xq, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32)
                    * ((4.0 / 127.0) * wscale)).astype(jnp.bfloat16)

        tb = timed(conv_bf16, xb, wb)
        ti = timed(conv_int8, xi, wi)
        tq = timed(conv_qdq, xb, wq)
        ts = timed(conv_qdq_static, xb, wq)
        flops = 2 * B * H * W * cin * cout * 9
        print(f"{name}: bf16 {tb*1e3:.3f} ms ({flops/tb/1e12:.1f} TFLOP/s)  "
              f"int8 {ti*1e3:.3f} ms ({flops/ti/1e12:.1f} TOP/s)  "
              f"x{tb/ti:.2f}   qdq {tq*1e3:.3f} ms  x{tb/tq:.2f}   "
              f"qdq-static {ts*1e3:.3f} ms  x{tb/ts:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
