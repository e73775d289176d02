"""Weight pruning (the ``prun.py`` capability, done properly).

The reference applies global *random* unstructured pruning to 30% of conv
weights and saves nothing (``prun.py:15-24``).  Here:

  * :func:`magnitude_prune` — global unstructured magnitude pruning (keeps
    the largest |w|), the standard baseline;
  * :func:`random_prune` — the reference's random criterion, for parity;
  * :func:`sparsity_report` — per-layer and global sparsity stats.

Masks are applied by zeroing kernels — XLA's dense convs don't exploit
unstructured sparsity, so this is an accuracy/size experiment (exactly the
role it plays in the reference), not a speed path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["magnitude_prune", "random_prune", "sparsity_report"]


def _is_kernel(path) -> bool:
    return path[-1].key == "kernel"


def magnitude_prune(params, amount: float = 0.3):
    """Zero the globally-smallest |w| fraction across all conv kernels."""
    kernels = [(p, v) for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]
               if _is_kernel(p)]
    all_abs = np.concatenate([np.abs(np.asarray(v)).ravel()
                              for _, v in kernels])
    thresh = np.quantile(all_abs, amount)

    def prune_leaf(path, v):
        if not _is_kernel(path):
            return v
        return jnp.where(jnp.abs(v) <= thresh, 0.0, v)

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def random_prune(params, amount: float = 0.3, seed: int = 0):
    """The reference's criterion: drop a random fraction of each kernel."""
    key = jax.random.PRNGKey(seed)

    def prune_leaf(path, v):
        nonlocal key
        if not _is_kernel(path):
            return v
        key, sub = jax.random.split(key)
        keep = jax.random.uniform(sub, v.shape) >= amount
        return v * keep

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def sparsity_report(params) -> Dict[str, Tuple[int, float]]:
    """{layer: (num_weights, zero_fraction)} plus a '_global' row."""
    rep = {}
    total = zeros = 0
    for path, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not _is_kernel(path):
            continue
        name = "/".join(str(getattr(k, "key", k)) for k in path[:-1])
        arr = np.asarray(v)
        z = int((arr == 0).sum())
        rep[name] = (arr.size, z / arr.size)
        total += arr.size
        zeros += z
    rep["_global"] = (total, zeros / max(total, 1))
    return rep
