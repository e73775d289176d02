"""PyTorch checkpoint ⇄ JAX param-tree conversion for PWCDCNet.

The canonical weights (``pwc_net.pth.tar``) and all fine-tuned checkpoints of
the reference are torch ``state_dict``s in one of three layouts in the wild
(reference ``models/PWCNet.py:500-506``, ``train.py:165-171``,
``train2.py:412-432``): flat, ``{'state_dict': ...}``, or
``{'model'/'model_state_dict': ...}``, possibly with ``module.`` DataParallel
prefixes (stripped at ``train.py:148``).  This module converts any of them
into the NHWC/HWIO param pytree of :class:`opticalflow_tpu.models.pwcnet.PWCDCNet`:

  * Conv2d weights: OIHW → HWIO transpose;
  * ConvTranspose2d weights (IOHW): spatial flip + transpose to the HWIO
    kernel of the equivalent forward conv over the 2×-dilated input (see
    ``opticalflow_tpu.ops.convops.deconv2d``);
  * biases copied as-is.

The reverse direction (:func:`export_state_dict`) produces a torch-layout
state_dict so checkpoints trained here remain loadable by the reference.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

__all__ = ["import_checkpoint", "import_state_dict", "export_state_dict",
           "load_torch_state_dict"]

# torch modules whose weights need ConvTranspose2d handling
_DECONV_PREFIXES = ("deconv", "upfeat")
# torch Sequential(conv, LeakyReLU) wraps these with a ".0" index
_BARE_CONV_PREFIXES = ("predict_flow", "dc_conv7")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat {name: ndarray} dict (CPU).

    Accepts all reference layouts and strips ``module.`` prefixes.
    """
    import torch  # CPU torch, only needed for interop

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, Mapping):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in data and isinstance(data[key], Mapping):
                data = data[key]
                break
    sd = {}
    for k, v in data.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        else:
            v = np.asarray(v)
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v
    return sd


def _is_deconv(name: str) -> bool:
    return name.startswith(_DECONV_PREFIXES)


def _split_torch_key(key: str):
    """'conv1a.0.weight' → ('conv1a', 'weight'); 'predict_flow2.weight' →
    ('predict_flow2', 'weight')."""
    parts = key.split(".")
    if len(parts) == 3 and parts[1] == "0":
        return parts[0], parts[2]
    if len(parts) == 2:
        return parts[0], parts[1]
    return None, None


def import_state_dict(sd: Mapping[str, np.ndarray], variant: str = "new"):
    """Convert a flat torch state_dict into the PWCDCNet flax params tree."""
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    unused = []
    for key, val in sd.items():
        mod, kind = _split_torch_key(key)
        if mod is None:
            unused.append(key)
            continue
        if mod == "deconv2":
            # created but never applied in the reference forward
            # (models/PWCNet.py:124 vs :256-268) — skip, matching behavior.
            unused.append(key)
            continue
        entry = params.setdefault(mod, {})
        if kind == "bias":
            entry["bias"] = jnp.asarray(val, jnp.float32)
        elif kind == "weight":
            w = np.asarray(val, np.float32)
            if _is_deconv(mod):
                # IOHW ConvTranspose2d weight → HWIO equivalent-conv kernel
                w = np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1)
            else:
                # OIHW → HWIO
                w = w.transpose(2, 3, 1, 0)
            entry["kernel"] = jnp.asarray(np.ascontiguousarray(w))
        else:
            unused.append(key)
    return params


def import_checkpoint(path: str, variant: str = "new"):
    """torch checkpoint file → flax params tree (the reference-weights
    importer demanded by the fidelity target)."""
    return import_state_dict(load_torch_state_dict(path), variant=variant)


def export_state_dict(params: Mapping, variant: str = "new") -> Dict[str, np.ndarray]:
    """flax params tree → torch-layout flat state_dict (numpy values).

    Inverse of :func:`import_state_dict`; lets checkpoints trained in this
    framework be consumed by the PyTorch reference.  The unused ``deconv2``
    of the reference module is synthesized as zeros so
    ``load_state_dict(strict=True)`` succeeds there.
    """
    sd: Dict[str, np.ndarray] = {}
    for mod, entry in params.items():
        bare = mod.startswith(_BARE_CONV_PREFIXES)
        wkey = f"{mod}.weight" if bare or _is_deconv(mod) else f"{mod}.0.weight"
        bkey = f"{mod}.bias" if bare or _is_deconv(mod) else f"{mod}.0.bias"
        w = np.asarray(entry["kernel"], np.float32)
        if _is_deconv(mod):
            w = np.flip(w.transpose(2, 3, 0, 1), axis=(2, 3))
        else:
            w = w.transpose(3, 2, 0, 1)
        sd[wkey] = np.ascontiguousarray(w)
        sd[bkey] = np.asarray(entry["bias"], np.float32)
    if variant == "new" and "deconv2.weight" not in sd:
        sd["deconv2.weight"] = np.zeros((2, 2, 4, 4), np.float32)
        sd["deconv2.bias"] = np.zeros((2,), np.float32)
    return sd
