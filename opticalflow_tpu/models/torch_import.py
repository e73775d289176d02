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

import functools
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

__all__ = ["import_checkpoint", "import_state_dict", "export_state_dict",
           "load_torch_state_dict", "expected_param_shapes",
           "validate_params"]

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


@functools.lru_cache(maxsize=8)
def expected_param_shapes(variant: str = "new", md: int = 4):
    """Expected ``{module: {param: shape}}`` for a PWCDCNet variant.

    Derived by abstract-tracing the flax model (``jax.eval_shape`` — no
    compute, no device), so it can never drift from the actual architecture.
    """
    import jax
    from opticalflow_tpu.models.pwcnet import PWCDCNet

    model = PWCDCNet(variant=variant, md=md)
    tree = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 6), jnp.float32))["params"]
    return {mod: {k: tuple(v.shape) for k, v in entry.items()}
            for mod, entry in tree.items()}


def _torch_key(mod: str, kind: str) -> str:
    """Render a param location in the torch checkpoint's own naming
    (Sequential convs carry a '.0' index; bare modules don't)."""
    suffix = "weight" if kind == "kernel" else kind
    bare = mod.startswith(_BARE_CONV_PREFIXES) or _is_deconv(mod)
    return f"{mod}.{suffix}" if bare else f"{mod}.0.{suffix}"


def validate_params(params: Mapping, unused, variant: str, md: int = 4):
    """Diff an imported params tree against the model's expected tree.

    Raises ``ValueError`` naming every missing key, unexpected key, and
    shape mismatch (in torch state_dict naming, so the error is actionable
    for the checkpoint the user actually has).  A truncated checkpoint or a
    wrong-variant one fails here with a clear report instead of an opaque
    flax apply error later (reference's silently-tolerant loads:
    ``models/PWCNet.py:497-520``, ``train.py:142-154``).
    """
    expected = expected_param_shapes(variant, md)
    missing, unexpected, mismatched = [], list(unused), []
    for mod, spec in expected.items():
        got = params.get(mod, {})
        for kind, shape in spec.items():
            if kind not in got:
                missing.append(_torch_key(mod, kind))
            elif tuple(got[kind].shape) != shape:
                mismatched.append(
                    f"{_torch_key(mod, kind)}: got {tuple(got[kind].shape)}"
                    f" (torch-converted), expected {shape}")
    unexpected += [_torch_key(mod, kind) for mod in params
                   if mod not in expected for kind in params[mod]]
    if missing or unexpected or mismatched:
        lines = [f"state_dict does not match PWCDCNet variant={variant!r}"
                 f" md={md}:"]
        if missing:
            lines.append("  missing keys: " + ", ".join(sorted(missing)))
        if unexpected:
            lines.append("  unexpected keys: " + ", ".join(sorted(unexpected)))
        if mismatched:
            lines.append("  shape mismatches:\n    " + "\n    ".join(mismatched))
        lines.append("  (hint: wrong --variant? truncated checkpoint?"
                     " pass strict=False to load anyway)")
        raise ValueError("\n".join(lines))


def import_state_dict(sd: Mapping[str, np.ndarray], variant: str = "new",
                      md: int = 4, strict: bool = True):
    """Convert a flat torch state_dict into the PWCDCNet flax params tree.

    With ``strict=True`` (default) the result is validated against the
    model's expected param tree — missing/unexpected keys and shape
    mismatches raise a ``ValueError`` naming them all.
    """
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
    if strict:
        validate_params(params, unused, variant, md)
    return params


def import_checkpoint(path: str, variant: str = "new", md: int = 4,
                      strict: bool = True):
    """torch checkpoint file → flax params tree (the reference-weights
    importer demanded by the fidelity target)."""
    return import_state_dict(load_torch_state_dict(path), variant=variant,
                             md=md, strict=strict)


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
