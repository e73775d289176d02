"""Checkpoint save/restore: Orbax for native checkpoints, plus the torch
importer for reference ``.pth(.tar)`` files.

Replaces the reference's three ad-hoc ``torch.save`` layouts (SURVEY.md §5)
with one structured Orbax layout ``{params, opt_state, step, metadata}`` and
tolerant loading of all the torch layouts via
``opticalflow_tpu.models.torch_import``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["load_params", "save_train_state", "restore_train_state",
           "latest_step"]

_TORCH_SUFFIXES = (".pth", ".pth.tar", ".pt", ".tar")


def load_params(path: str, variant: str = "new"):
    """Load model params from a torch checkpoint or an Orbax directory."""
    if os.path.isdir(path):
        return restore_train_state(path)["params"]
    if path.endswith(_TORCH_SUFFIXES):
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"checkpoint not found: {path!r} (pass --ckpt with a valid "
                f"torch .pth(.tar) file or an Orbax checkpoint directory)")
        from opticalflow_tpu.models.torch_import import import_checkpoint
        return import_checkpoint(path, variant=variant)
    raise ValueError(
        f"unrecognized checkpoint {path!r}: expected a torch file "
        f"({'/'.join(_TORCH_SUFFIXES)}) or an Orbax checkpoint directory")


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_train_state(directory: str, step: int, params, opt_state=None,
                     metadata: Optional[Dict[str, Any]] = None) -> str:
    """Write ``{directory}/step_{step}`` with params (+optional optimizer
    state); JSON-able metadata goes to a ``step_{step}.meta.json`` sidecar
    (Orbax's StandardCheckpointer only takes array pytrees).  Returns the
    checkpoint path."""
    payload = {"params": jax.tree.map(np.asarray, params),
               "step": np.asarray(step)}
    if opt_state is not None:
        payload["opt_state"] = jax.tree.map(np.asarray, opt_state)
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _ckptr()
    ckptr.save(path, payload, force=True)
    # StandardCheckpointer is async (writes land on a tmp dir until
    # finalized) — block so the checkpoint is durable before we return.
    ckptr.wait_until_finished()
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)
    return path


def latest_step(directory: str) -> Optional[int]:
    """Largest step among ``step_*`` checkpoints in ``directory``."""
    if not os.path.isdir(directory):
        return None
    steps = [int(n.split("_", 1)[1]) for n in os.listdir(directory)
             if n.startswith("step_") and n.split("_", 1)[1].isdigit()
             and os.path.isdir(os.path.join(directory, n))]
    return max(steps) if steps else None


def restore_train_state(path: str, like: Optional[Dict[str, Any]] = None
                        ) -> Dict[str, Any]:
    """Restore a checkpoint written by :func:`save_train_state`.

    ``path`` may be a specific ``step_N`` directory or a run directory, in
    which case the latest step is restored (the reference's ``--resume``
    behavior, ``train.py:134-139``).  Pass ``like`` (a pytree with the same
    keys, e.g. ``{"params": ..., "opt_state": tx.init(params), "step": 0}``)
    to restore custom containers such as optax optimizer states — without it
    Orbax returns plain nested dicts/lists.
    """
    base = os.path.abspath(path)
    name = os.path.basename(base.rstrip("/"))
    if not name.startswith("step_"):
        step = latest_step(base)
        if step is None:
            raise FileNotFoundError(f"no step_* checkpoints under {base}")
        base = os.path.join(base, f"step_{step}")
    if like is not None:
        out = dict(_ckptr().restore(base, like))
    else:
        out = dict(_ckptr().restore(base))
    meta_path = base + ".meta.json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            out["metadata"] = json.load(f)
    return out
