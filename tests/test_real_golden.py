"""Real-frame end-to-end golden regression for the canonical CLI pipeline.

The fixtures (tests/goldens/real_{im1,im2}.png + real_pair.flo) are produced
by ``scripts/make_real_golden.py``: a real 180x318 video-frame crop pair run
through an exact transcription of the REFERENCE pipeline
(``script_pwc.py:43-81`` — distorting resize to /64, BGR /255, forward, x20,
quarter-res flow resized back with u*W/W64 rescale) on the torch-CPU oracle
with deterministic fake weights.  This turns the round-1 verify drive log
(mean EPE delta 2.5e-8 vs the reference pipeline, COMPONENTS.md) into a
committed regression test on real image content (VERDICT round-2 task 5).
"""

import os

import numpy as np
import torch

import jax.numpy as jnp

from opticalflow_tpu.engine import FlowEngine
from opticalflow_tpu.io.flo import read_flo
from opticalflow_tpu.io.images import load_image
from opticalflow_tpu.models.pwcnet import PWCDCNet
from opticalflow_tpu.models.torch_import import import_state_dict
from oracles.torch_pwcnet import OraclePWC

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _fake_params():
    # identical recipe to scripts/make_real_golden.py (and the verify skill)
    torch.manual_seed(0)
    net = OraclePWC(variant="new")
    for p in net.parameters():
        p.data *= 0.5
    return import_state_dict(net.state_dict_flat(), variant="new")


def test_real_pair_matches_reference_pipeline_golden():
    params = _fake_params()
    model = PWCDCNet(variant="new", dtype=jnp.float32, precision="highest")
    engine = FlowEngine(model, params, flow_scale=20.0)
    im1 = load_image(os.path.join(GOLD, "real_im1.png"))
    im2 = load_image(os.path.join(GOLD, "real_im2.png"))
    flow = engine.flow_from_pair(im1, im2, preset="bgr_unit",
                                 size_mode="resize")
    golden = read_flo(os.path.join(GOLD, "real_pair.flo"))
    assert flow.shape == golden.shape == (180, 318, 2)
    epe_delta = float(np.mean(np.hypot(*(flow - golden).transpose(2, 0, 1))))
    assert epe_delta <= 1e-6, f"EPE delta vs golden: {epe_delta:.3e}"


def test_real_pair_pad_mode_goldens():
    """Pad-path goldens at a KITTI-like non-/64 shape (180x318, pad (12, 2))
    on real frames (VERDICT r3 task 1): "pad" is the engine's corrected
    order, "pad_ref" the reference's exact ``inference_kitti.py:216-224``
    order — both torch-oracle-rendered by ``scripts/make_real_golden.py``
    and intentionally ~0.026 mean EPE apart (documented divergence,
    ``FlowEngine.flow_from_pair``)."""
    params = _fake_params()
    model = PWCDCNet(variant="new", dtype=jnp.float32, precision="highest")
    engine = FlowEngine(model, params, flow_scale=1.0)
    im1 = load_image(os.path.join(GOLD, "real_im1.png"))
    im2 = load_image(os.path.join(GOLD, "real_im2.png"))
    flows = {}
    for mode in ("pad", "pad_ref"):
        flow = engine.flow_from_pair(im1, im2, preset="rgb_imagenet",
                                     size_mode=mode)
        suffix = "pad" if mode == "pad" else "padref"
        golden = read_flo(os.path.join(GOLD, f"real_pair_{suffix}.flo"))
        assert flow.shape == golden.shape == (180, 318, 2)
        d = float(np.mean(np.hypot(*(flow - golden).transpose(2, 0, 1))))
        assert d <= 1e-6, f"{mode}: EPE delta vs golden {d:.3e}"
        flows[mode] = flow
    gap = float(np.mean(np.hypot(
        *(flows["pad"] - flows["pad_ref"]).transpose(2, 0, 1))))
    assert gap > 1e-3   # the divergence is real, not a relabeling
