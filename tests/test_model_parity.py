"""End-to-end parity: JAX PWCDCNet vs a torch-CPU oracle with shared weights.

Mirrors the reference's own parity methodology (``onnx_pth_compare.py``):
identical inputs and weights through two implementations, compared with tight
float32 tolerances.  Weights flow through the real importer
(``torch state_dict → flax params``), so this also validates the checkpoint
importer the fidelity target depends on.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from opticalflow_tpu.models.pwcnet import PWCDCNet
from opticalflow_tpu.models.torch_import import (import_state_dict,
                                                 export_state_dict)
from oracles.torch_pwcnet import OraclePWC


@pytest.fixture(scope="module", params=["new", "old"])
def pair(request):
    variant = request.param
    torch.manual_seed(0)
    oracle = OraclePWC(variant=variant).eval()
    # scale weights down: random kaiming weights at 565-ch depth explode
    for p in oracle.parameters():
        p.data *= 0.5
    params = import_state_dict(oracle.state_dict_flat(), variant=variant)
    model = PWCDCNet(variant=variant, use_pallas_corr=False)
    return variant, oracle, model, params


def _run_pair(oracle, model, params, h, w, train=False, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(1, h, w, 6).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2), train=train)
    out = model.apply({"params": params}, jnp.asarray(x), train=train)
    if not train:
        ref, out = (ref,), (out,)
    return [(np.asarray(o), r.permute(0, 2, 3, 1).numpy())
            for o, r in zip(out, ref)]


def test_eval_forward_parity(pair):
    _, oracle, model, params = pair
    (ours, ref), = _run_pair(oracle, model, params, 64, 128)
    assert ours.shape == ref.shape == (1, 16, 32, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_train_forward_parity(pair):
    _, oracle, model, params = pair
    results = _run_pair(oracle, model, params, 64, 64, train=True)
    assert len(results) == 5  # flow2..flow6
    for ours, ref in results:
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_state_dict_round_trip(pair):
    variant, oracle, _, params = pair
    sd = export_state_dict(params, variant=variant)
    orig = oracle.state_dict_flat()
    for k, v in orig.items():
        if k.startswith("deconv2."):
            continue  # unused in forward; zero-synthesized on export
        np.testing.assert_array_equal(sd[k], v.numpy(), err_msg=k)
    # exported dict must load strict into a fresh torch oracle
    fresh = OraclePWC(variant=variant)
    fresh.load_state_dict({f"m.{k}": torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()
                           if not k.startswith("deconv2.")}, strict=False)


def test_param_count_matches_reference():
    """PWC-Net is ≈9.4M params (SURVEY.md §6)."""
    model = PWCDCNet()
    import jax
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 6)))["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    oracle = OraclePWC()
    n_ref = sum(p.numel() for k, p in oracle.named_parameters()
                if "deconv2." not in k)
    assert n == n_ref
    assert 9_000_000 < n < 10_000_000


@pytest.mark.slow
def test_generic_max_displacement_model():
    """md is a hyperparameter, not a constant: an md=2 model must build and
    run with (2·2+1)² = 25 correlation channels."""
    import jax
    model = PWCDCNet(variant="new", md=2, use_pallas_corr=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 6)))["params"]
    # estimator input at L6 = nd = 25 channels
    assert params["conv6_0"]["kernel"].shape[2] == 25
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.zeros((1, 64, 64, 6)))
    assert out.shape == (1, 16, 16, 2)


def _realistic_pair(variant="new", h=256, w=512):
    """Oracle + imported params with flow-head biases injected so flows reach
    realistic magnitudes (O(10-20 px) after the x20 descale) — the regime
    where the warp/packed-gather fidelity budget actually lives (the default
    random-weight fixtures produce sub-pixel flows)."""
    torch.manual_seed(0)
    oracle = OraclePWC(variant=variant).eval()
    for p in oracle.parameters():
        p.data *= 0.5
    sd = oracle.state_dict_flat()
    # flow-head bias shifts give each level's flow a real magnitude...
    for lvl, (bu, bv) in ((6, (2.0, -1.5)), (5, (1.5, 1.0)),
                          (4, (1.0, -0.8)), (3, (0.8, 0.6)),
                          (2, (0.5, -0.4))):
        sd[f"predict_flow{lvl}.bias"] = sd[f"predict_flow{lvl}.bias"] + \
            torch.tensor([bu, bv])
    # ...and bilinear flow-upsampling deconvs let it cascade down the
    # pyramid (random deconv weights would scramble the shift), so the
    # warps see multi-pixel displacements like the published checkpoint
    lin = torch.tensor([1.0, 3.0, 3.0, 1.0]) / 4.0
    bil = torch.outer(lin, lin)
    for lvl in (6, 5, 4, 3):
        wk = torch.zeros(2, 2, 4, 4)
        wk[0, 0] = bil
        wk[1, 1] = bil
        sd[f"deconv{lvl}.weight"] = wk
    oracle.load_state_dict({f"m.{k}": v for k, v in sd.items()},
                           strict=False)
    params = import_state_dict(sd, variant=variant)
    model = PWCDCNet(variant=variant, use_pallas_corr=False)
    return oracle, model, params


@pytest.mark.slow
def test_realistic_scale_parity_256x512():
    """Eval parity at 256x512 with O(10px) flow magnitudes (atol matches the
    2e-4 budget PERF.md states for the bf16 path; this runs f32/highest)."""
    oracle, model, params = _realistic_pair()
    (ours, ref), = _run_pair(oracle, model, params, 256, 512)
    assert ours.shape == (1, 64, 128, 2)
    # the flows must actually be large, else this test proves nothing
    mag = np.hypot(ref[..., 0], ref[..., 1]) * 20.0
    assert mag.mean() > 5.0, f"flow magnitudes too small: {mag.mean():.2f}px"
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_realistic_scale_parity_sintel_448x1024():
    """Full Sintel-padded resolution (BASELINE north-star shape)."""
    oracle, model, params = _realistic_pair()
    (ours, ref), = _run_pair(oracle, model, params, 448, 1024)
    assert ours.shape == (1, 112, 256, 2)
    mag = np.hypot(ref[..., 0], ref[..., 1]) * 20.0
    assert mag.mean() > 5.0
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
