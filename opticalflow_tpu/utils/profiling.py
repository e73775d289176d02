"""Profiling & complexity: step timing, FLOP estimates, device traces.

TPU-native replacements for the reference's observability (SURVEY.md §5):
ptflops MACs/params print (``pwc_extract_flow_video.py:178-184``) becomes a
static cost analysis of the jitted program; wall-clock prints become a
``block_until_ready`` timing harness; ``jax.profiler`` gives perfetto traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["timeit", "flops_estimate", "param_count", "model_complexity",
           "trace"]


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2,
           **kwargs) -> Dict[str, float]:
    """Time a device function with proper async-dispatch handling."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is not None:   # warmup=0: caller already compiled/warmed
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters_per_s": 1.0 / dt}


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Static FLOP estimate from XLA's cost analysis of the lowered program."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_complexity(model, params, input_shape=(1, 384, 512, 6)) -> Dict:
    """Params + FLOPs at a given input size — the ptflops print equivalent."""
    import jax.numpy as jnp
    x = jnp.zeros(input_shape, jnp.float32)
    flops = flops_estimate(
        lambda p, xx: model.apply({"params": p}, xx), params, x)
    n = param_count(params)
    out = {"params": n, "params_m": n / 1e6, "input_shape": input_shape}
    if flops is not None:
        out["flops"] = flops
        out["gmacs"] = flops / 2e9
    return out


def per_layer_complexity(model, input_shape=(1, 384, 512, 6)) -> str:
    """Per-layer params/FLOPs/output-shape table (the reference's ptflops
    per-layer print, ``pwc_extract_flow_video.py:178-184``), rendered via
    ``flax.linen.tabulate`` with XLA-cost-analysis FLOPs per module."""
    import flax.linen as nn
    import jax.numpy as jnp
    fn = nn.tabulate(model, jax.random.PRNGKey(0), compute_flops=True,
                     depth=1, console_kwargs={"width": 200})
    return fn(jnp.zeros(input_shape, jnp.float32))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
