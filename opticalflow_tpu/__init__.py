"""opticalflow_tpu — a TPU-native optical-flow framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of the PWC-Net reference stack
(usseez/OpticalFlow): pyramid/warp/cost-volume optical flow, KITTI & Sintel
evaluation, streaming video flow extraction with visualization, supervised /
self-supervised / epipolar-filtered fine-tuning, checkpoint import/export,
and a data-parallel multi-chip runtime — designed TPU-first:

  * NHWC layouts everywhere (MXU-friendly convs),
  * one jit-compiled program covering preprocess → network → postprocess,
  * the correlation cost volume as a Pallas TPU kernel with a lax fallback,
  * scaling via ``jax.sharding.Mesh`` + collectives, not host loops.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache (first PWC compile is ~1 min on TPU;
    cached reloads are seconds).  Opt out with OPTICALFLOW_TPU_CACHE=0."""
    # single source of truth for the path: utils.cache_seed.cache_dir()
    # (the repo-seeding machinery must restore into the same directory)
    from opticalflow_tpu.utils.cache_seed import cache_dir
    path = cache_dir()
    if path in ("", "0"):
        return
    try:
        import jax
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()

from opticalflow_tpu.models.pwcnet import PWCDCNet, pwc_dc_net, pwc_dc_net_old

__all__ = ["PWCDCNet", "pwc_dc_net", "pwc_dc_net_old", "__version__"]
