"""Probe: does Mosaic lower a vectorized dynamic gather inside Pallas?

Tries three formulations of out[i] = x[idx[i]] on a (N, 128) VMEM value and
reports compile + correctness + a rough timing for each.  Decides whether a
Pallas bilinear-warp kernel can beat XLA's row-gather (11.8 ms at B=32).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M, C = 2048, 4096, 128

    def k_take(x_ref, i_ref, o_ref):
        x = x_ref[:]
        idx = i_ref[:]
        o_ref[:] = jnp.take(x, idx[:, 0], axis=0)

    def k_takealong(x_ref, i_ref, o_ref):
        x = x_ref[:]
        idx = i_ref[:]
        o_ref[:] = jnp.take_along_axis(
            x, jnp.broadcast_to(idx, (M, C)), axis=0)

    def k_loop(x_ref, i_ref, o_ref):
        def body(j, _):
            o_ref[pl.ds(j, 1)] = x_ref[pl.ds(i_ref[j, 0], 1)]
            return 0
        jax.lax.fori_loop(0, M, body, 0)

    x = jnp.asarray(np.random.RandomState(0).randn(N, C), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, N, (M, 1)),
                      jnp.int32)
    ref = np.asarray(x)[np.asarray(idx)[:, 0]]

    for name, kern in [("take", k_take), ("take_along", k_takealong),
                       ("loop_ds", k_loop)]:
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = jax.jit(f)(x, idx)
            ok = np.allclose(np.asarray(out), ref)

            @jax.jit
            def loop(x, idx, f=f):
                def body(i, acc):
                    return acc + jnp.sum(f(x, idx + i * 0))
                return jax.lax.fori_loop(0, 50, body, 0.0)

            float(loop(x, idx))
            t0 = time.perf_counter()
            float(loop(x, idx))
            dt = (time.perf_counter() - t0) / 50
            print(f"{name}: OK correct={ok}  {dt*1e6:.1f} us/call "
                  f"({M/dt/1e6:.1f} M rows/s)", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
