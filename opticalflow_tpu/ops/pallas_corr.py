"""Pallas TPU kernel for the PWC-Net correlation cost volume.

Hot configuration only (kernel_size=1, stride1=stride2=1, pad==md): the one
the reference instantiates (``models/PWCNet.py:71``).  Falls back to the lax
implementation elsewhere.  Implemented in a later milestone; ``supported``
gates dispatch in :mod:`opticalflow_tpu.ops.correlation`.
"""

from __future__ import annotations

import jax

__all__ = ["supported", "correlation_pallas"]


def supported(x: jax.Array) -> bool:  # pragma: no cover - stub
    return False


def correlation_pallas(f1, f2, *, max_displacement: int = 4):  # pragma: no cover
    raise NotImplementedError("Pallas correlation kernel lands in a later milestone")
