"""Export (StableHLO artifact) parity, pruning, profiling, selfsup metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.models.pwcnet import PWCDCNet
from opticalflow_tpu.models import prune
from opticalflow_tpu.utils import profiling


@pytest.fixture(scope="module")
def small_model():
    model = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 6)))["params"]
    return model, params


def test_export_round_trip_parity(tmp_path, small_model):
    from opticalflow_tpu.export import export_stablehlo, parity_check
    model, params = small_model
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, params, path, input_shape=(1, 64, 64, 6))
    rep = parity_check(model, params, path, input_shape=(1, 64, 64, 6),
                       report_image=str(tmp_path / "report.png"))
    assert rep["epe_mean"] < 1e-5
    assert rep["agree@0.25"] == 100.0
    assert (tmp_path / "report.png").exists()


@pytest.mark.slow
def test_export_dynamic_axes(tmp_path, small_model):
    """The reference exports ONNX with dynamic batch/H/W axes
    (``pth2onnx.py:77-89``); one ``dynamic="all"`` artifact must serve
    multiple batch sizes AND multiple /64 frame sizes (VERDICT r3 task 3).
    The graph must be batch-independent: the module-scoped model already
    uses use_pallas_corr=False, and blocked lvl1 must be off."""
    from opticalflow_tpu.export import export_stablehlo, load_exported
    model = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                     use_blocked_lvl1=False)
    _, params = small_model      # same param tree, flag is graph-only

    path = str(tmp_path / "dyn.stablehlo")
    export_stablehlo(model, params, path, dynamic="all")
    fn = load_exported(path)

    def direct(x):
        return model.apply({"params": params}, jnp.asarray(x)) * 20.0

    for b, h, w in ((1, 64, 64), (3, 64, 64), (2, 128, 192)):
        x = np.random.RandomState(b).rand(b, h, w, 6).astype(np.float32)
        got = np.asarray(fn(jnp.asarray(x)))
        assert got.shape == (b, h // 4, w // 4, 2)
        np.testing.assert_allclose(got, np.asarray(direct(x)),
                                   atol=1e-5, rtol=1e-5)

    # boundary: the default batch-gated blocked lvl1 cannot trace with a
    # symbolic batch — the error must say how to fix it
    auto = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    with pytest.raises(ValueError, match="use_blocked_lvl1"):
        export_stablehlo(auto, params, str(tmp_path / "x.stablehlo"),
                         dynamic="batch")


@pytest.mark.slow
def test_magnitude_prune(small_model):
    _, params = small_model
    pruned = prune.magnitude_prune(params, amount=0.3)
    rep = prune.sparsity_report(pruned)
    total, frac = rep["_global"]
    assert 0.25 < frac < 0.35
    # biases untouched
    np.testing.assert_array_equal(pruned["conv1a"]["bias"],
                                  params["conv1a"]["bias"])


def test_random_prune(small_model):
    _, params = small_model
    pruned = prune.random_prune(params, amount=0.3, seed=0)
    _, frac = prune.sparsity_report(pruned)["_global"]
    assert 0.25 < frac < 0.35


def test_model_complexity(small_model):
    model, params = small_model
    rep = profiling.model_complexity(model, params,
                                     input_shape=(1, 64, 64, 6))
    assert 9_000_000 < rep["params"] < 10_000_000
    assert rep["params_m"] == pytest.approx(rep["params"] / 1e6)


def test_timeit(small_model):
    model, params = small_model
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    x = jnp.zeros((1, 64, 64, 6))
    t = profiling.timeit(fn, params, x, iters=2, warmup=1)
    assert t["mean_s"] > 0


def test_selfsup_metrics(small_model):
    from opticalflow_tpu.train.validate import selfsup_metrics
    model, params = small_model
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 6).astype(np.float32))
    m = selfsup_metrics(model, params, images)
    assert 0.0 <= float(m["oob_ratio"]) <= 1.0
    assert np.isfinite(float(m["photometric"]))
    assert np.isfinite(float(m["fb_cycle"]))


def test_per_layer_complexity_table(small_model):
    """The reference prints per-layer MACs/params at model load
    (pwc_extract_flow_video.py:178-184); ours must list every module with
    per-module FLOPs, not just the aggregate."""
    model, _ = small_model
    txt = profiling.per_layer_complexity(model, (1, 64, 64, 6))
    for mod in ("conv1a", "conv6b", "conv2_4", "predict_flow2", "dc_conv7"):
        assert mod in txt, mod
    assert "flops" in txt and "params" in txt
