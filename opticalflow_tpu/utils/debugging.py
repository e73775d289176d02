"""Numerical debugging utilities (the SURVEY.md §5 sanitizer row).

The reference's only runtime checks are ``cudaGetLastError`` calls in the
CUDA kernels; the TPU-native equivalents here are:

  * :func:`nan_guard` — context manager enabling ``jax_debug_nans`` (XLA
    re-runs the offending op un-jitted and points at the producing line);
  * :func:`interpret_kernels` — force all Pallas kernels into interpreter
    mode (pure-Python execution with bounds checking) for kernel debugging;
  * :func:`check_finite` — assert a pytree of arrays is finite, reporting
    the offending leaf paths (useful around checkpoint import and loss
    computation).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import numpy as np

__all__ = ["nan_guard", "interpret_kernels", "check_finite"]


@contextlib.contextmanager
def nan_guard() -> Iterator[None]:
    """Raise at the op that first produces a NaN inside jitted code."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def interpret_kernels() -> Iterator[None]:
    """Run Pallas TPU kernels in interpreter mode within the context."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def check_finite(tree, name: str = "tree") -> None:
    """Raise ValueError naming every non-finite leaf in a pytree."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            label = "/".join(str(getattr(k, "key", k)) for k in path)
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{label} ({n_bad}/{arr.size} non-finite)")
    if bad:
        raise ValueError(f"non-finite values in {name}: " + "; ".join(bad))
