"""Deployable-artifact export + parity harness.

The reference's ONNX path (``pth2onnx.py`` + ``onnx_pth_compare.py``) exists
to (a) produce a runtime-independent artifact and (b) quantify its numerical
agreement with the source model.  The TPU-native equivalents:

  * :func:`export_stablehlo` — serialize the jitted forward with
    ``jax.export`` (StableHLO bytes + loadable call signature).  Unlike the
    reference's ONNX fallback, the exported graph uses the *CUDA-path*
    correlation semantics, so there is no factor-C mismatch to audit
    (``correlation.py:35`` vs ``correlation_cuda_kernel.cu:143`` — a real
    reference bug this design removes);
  * :func:`load_exported` — rehydrate and call the artifact;
  * :func:`parity_check` — run source model and artifact on one input and
    produce the reference harness's full metric set
    (``onnx_pth_compare.py:133-201``) plus a 2×2 comparison report image.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["export_stablehlo", "load_exported", "parity_check"]


def export_stablehlo(model, params, path: str,
                     input_shape: Tuple[int, ...] = (1, 256, 256, 6),
                     flow_scale: float = 20.0,
                     dynamic: Optional[str] = None) -> str:
    """Serialize the forward (input → descaled quarter-res flow) to disk.

    ``dynamic`` mirrors the reference's dynamic ONNX axes
    (``pth2onnx.py:77-89``, which marks batch/H/W dynamic):

      * ``None`` — shape-specialized artifact at ``input_shape``;
      * ``"batch"`` — symbolic batch axis ``(b, H, W, 6)``; one artifact
        serves every batch size;
      * ``"all"`` — full shape polymorphism ``(b, 64*h, 64*w, 6)``.  H and W
        stay /64-constrained by construction (six stride-2 levels), exactly
        like the reference model itself — the symbolic dims encode that.

    Measured boundaries (probed on jax 0.9, see tests/test_export_prune.py):

      * ``use_blocked_lvl1="auto"`` (the model default) resolves blocked
        vs plain by comparing the batch to 32 at trace time — inconclusive
        under a symbolic batch (``InconclusiveDimensionOperation``).  Build
        the export model with ``use_blocked_lvl1=False`` (or True).
      * ``use_pallas_corr=True`` embeds a TPU-only Mosaic custom call when
        traced on TPU (non-portable artifact), and its VMEM-fit gate is
        itself inconclusive under symbolic H/W.  Build the export model
        with ``use_pallas_corr=False``; the lax correlation lowers to
        portable StableHLO and is bit-compatible (CUDA-mean semantics).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    def fwd(x):
        return model.apply({"params": params}, x) * flow_scale

    if dynamic is None:
        aval = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    elif dynamic == "batch":
        h, w = input_shape[1:3]
        aval = jax.ShapeDtypeStruct(
            jex.symbolic_shape(f"b, {h}, {w}, 6"), jnp.float32)
    elif dynamic == "all":
        aval = jax.ShapeDtypeStruct(
            jex.symbolic_shape("b, 64*h, 64*w, 6"), jnp.float32)
    else:
        raise ValueError(f"dynamic must be None, 'batch' or 'all', "
                         f"got {dynamic!r}")
    try:
        exported = jex.export(jax.jit(fwd))(aval)
    except Exception as e:
        if dynamic and "inconclusive" in str(e).lower():
            raise ValueError(
                "dynamic export needs a batch-independent graph: construct "
                "the model with use_blocked_lvl1=False (and "
                "use_pallas_corr=False for a portable artifact) — the "
                "default 'auto' gate compares the symbolic batch to 32"
            ) from e
        raise
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Load a serialized artifact → callable(x) on the current backend."""
    from jax import export as jex
    with open(path, "rb") as f:
        exported = jex.deserialize(f.read())
    return exported.call


def parity_check(model, params, artifact_path: str,
                 input_shape=(1, 256, 256, 6), flow_scale: float = 20.0,
                 report_image: Optional[str] = None,
                 seed: int = 0) -> Dict[str, float]:
    """Source model vs exported artifact on one random input."""
    import jax.numpy as jnp
    from opticalflow_tpu.utils.metrics import parity_report

    rng = np.random.RandomState(seed)
    x = rng.rand(*input_shape).astype(np.float32)
    src = np.asarray(model.apply({"params": params}, jnp.asarray(x))
                     * flow_scale)
    art = np.asarray(load_exported(artifact_path)(jnp.asarray(x)))
    rep = parity_report(art, src)
    if report_image:
        _write_report_image(src[0], art[0], rep, report_image)
    return rep


def _write_report_image(src_flow, art_flow, rep, path):
    """2×2 comparison figure: both flow colorings, |Δ| map, metric text
    (the reference harness's overlay report, ``onnx_pth_compare.py:281-349``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from opticalflow_tpu.viz.colorwheel import flow_to_color

    err = np.sqrt(((src_flow - art_flow) ** 2).sum(-1))
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    axes[0, 0].imshow(flow_to_color(src_flow))
    axes[0, 0].set_title("source model")
    axes[0, 1].imshow(flow_to_color(art_flow))
    axes[0, 1].set_title("exported artifact")
    im = axes[1, 0].imshow(err, cmap="magma")
    axes[1, 0].set_title("EPE map")
    fig.colorbar(im, ax=axes[1, 0], fraction=0.046)
    axes[1, 1].axis("off")
    text = "\n".join(f"{k}: {v:.6g}" for k, v in rep.items())
    axes[1, 1].text(0.02, 0.98, text, va="top", family="monospace",
                    fontsize=9)
    for ax in axes.flat[:3]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
