"""Guard bench.py's pinned flops/pair constant (VERDICT r4 task 4).

The axon TPU backend cannot produce a usable ``cost_analysis`` (None at
lowering level; 45×-low at compiled level through the relay), so bench.py's
``mfu`` field rests on ``FLOPS_PER_PAIR`` measured once on the CPU backend.
This test recomputes that number for the CURRENT default bench graph — any
default-graph change that forgets the re-pin fails here instead of silently
skewing the driver-visible mfu.
"""

import jax
import jax.numpy as jnp

import bench


def test_flops_per_pair_pin_matches_cost_analysis():
    from opticalflow_tpu.models.pwcnet import PWCDCNet

    # exactly the bench.py program: bf16 fast, B=BATCH at (H, W) —
    # blocked-auto resolves from the pair-batch, so the batch matters
    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    p_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 6), jnp.float32))["params"]
    x_shape = jax.ShapeDtypeStruct(
        (bench.BATCH, bench.H, bench.W, 6), jnp.float32)

    low = jax.jit(
        lambda p, x: model.apply({"params": p}, x)).lower(p_shapes, x_shape)
    analysis = low.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    assert analysis is not None and "flops" in analysis, (
        "CPU backend stopped reporting lowering-level cost analysis — "
        "the bench.py mfu pin can no longer be validated this way")

    flops_per_pair = float(analysis["flops"]) / bench.BATCH
    rel = abs(flops_per_pair - bench.FLOPS_PER_PAIR) / bench.FLOPS_PER_PAIR
    assert rel < 0.01, (
        f"bench.py FLOPS_PER_PAIR pin ({bench.FLOPS_PER_PAIR:.6g}) is "
        f"{rel:.1%} off the current default graph's cost analysis "
        f"({flops_per_pair:.6g}) — the default graph changed; re-pin the "
        f"constant in bench.py (and reseed the XLA cache, CLAUDE.md)")


def test_train_flops_per_pair_pin_matches_cost_analysis():
    """Same guard for scripts/bench_train.py's fwd+bwd+AdamW pin."""
    import importlib

    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.trainer import (TrainConfig,
                                               create_train_state,
                                               make_train_step)

    bt = importlib.import_module("scripts.bench_train")
    B = 8  # the recommended single-chip config (PERF.md)
    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    cfg = TrainConfig(loss="multiscale", optimizer="adamw", lr=1e-4)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   sample_shape=(1, 64, 64, 6))
    step = make_train_step(model, tx, cfg)
    data = {
        "images": jax.ShapeDtypeStruct((B, bt.H, bt.W, 6), jnp.float32),
        "flow": jax.ShapeDtypeStruct((B, bt.H, bt.W, 2), jnp.float32),
        "valid": jax.ShapeDtypeStruct((B, bt.H, bt.W), jnp.float32),
    }
    st_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    analysis = jax.jit(step).lower(st_shapes, data).cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    assert analysis is not None and "flops" in analysis

    flops_per_pair = float(analysis["flops"]) / B
    rel = (abs(flops_per_pair - bt.TRAIN_FLOPS_PER_PAIR)
           / bt.TRAIN_FLOPS_PER_PAIR)
    assert rel < 0.01, (
        f"bench_train.py TRAIN_FLOPS_PER_PAIR pin "
        f"({bt.TRAIN_FLOPS_PER_PAIR:.6g}) is {rel:.1%} off the current "
        f"train step's cost analysis ({flops_per_pair:.6g}) — re-pin it")
