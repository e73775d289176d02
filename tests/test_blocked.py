"""Blocked (space-to-depth) conv transforms: exact vs the plain convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops import blocked as BL
from opticalflow_tpu.ops.convops import conv2d


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def _japply(m):
    """Jitted apply: ONE persisted-cacheable program per (model, shape)
    instead of an eager op-by-op dispatch of the full 60-conv net (the
    former dominant cost of this file, ~170 s/run)."""
    return jax.jit(lambda p, x, train=False:
                   m.apply({"params": p}, x, train=train),
                   static_argnames="train")


def _jinit(m, key, x):
    return jax.jit(m.init)(key, x)["params"]


def test_blocked_s2_matches_plain():
    """conv1a form: 3→16 stride-2 at even sizes."""
    x = _rand((2, 32, 48, 3), 0)
    k = _rand((3, 3, 3, 16), 1) * 0.2
    ref = conv2d(x, k, None, stride=2, padding=1)
    blk = BL.conv_blocked_s2(x, BL.blocked_s2_kernel(k))
    out = BL.depth_to_space(blk)
    assert out.shape == ref.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_blocked_s1_matches_plain():
    """conv1aa/conv1b form: 16→16 stride-1 applied in block space."""
    xp = _rand((1, 16, 24, 16), 2)          # pixel layout
    k = _rand((3, 3, 16, 16), 3) * 0.2
    ref = conv2d(xp, k, None, stride=1, padding=1)
    # space-to-depth the input, run blocked, back
    b, h, w, c = xp.shape
    xb = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4 * c)
    out = BL.depth_to_space(BL.conv_blocked_s1(xb, BL.blocked_s1_kernel(k)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_blocked_consumer_matches_plain():
    """conv2a form: stride-2 conv reading the blocked layout directly."""
    xp = _rand((2, 16, 24, 16), 4)
    k = _rand((3, 3, 16, 32), 5) * 0.2
    ref = conv2d(xp, k, None, stride=2, padding=1)
    b, h, w, c = xp.shape
    xb = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4 * c)
    out = BL.conv_blocked_consumer(xb, BL.blocked_consumer_kernel(k))
    assert out.shape == ref.shape == (2, 8, 12, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_blocked_s2_to_blocked_matches_plain():
    """conv2a form keeping the output blocked: stride-2 conv reading AND
    producing the 2×2-block layout (needs the pixel grid % 4 == 0)."""
    xp = _rand((2, 16, 24, 16), 14)
    k = _rand((3, 3, 16, 32), 15) * 0.2
    ref = conv2d(xp, k, None, stride=2, padding=1)
    b, h, w, c = xp.shape
    xb = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4 * c)
    yb = BL.conv_blocked_s2_to_blocked(xb, BL.blocked_s2_to_blocked_kernel(k))
    out = BL.depth_to_space(yb)
    assert out.shape == ref.shape == (2, 8, 12, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_full_level1_chain_blocked():
    """conv1a→conv1aa→conv1b→conv2a entirely in block space (the form the
    model uses: the un-blocked level-1 tensor never materializes)."""
    from opticalflow_tpu.ops.convops import leaky_relu
    x = _rand((1, 64, 64, 3), 6)
    k1a = _rand((3, 3, 3, 16), 7) * 0.2
    k1aa = _rand((3, 3, 16, 16), 8) * 0.2
    k1b = _rand((3, 3, 16, 16), 9) * 0.2
    k2a = _rand((3, 3, 16, 32), 10) * 0.2
    b1a, b1aa, b1b, b2a = (_rand((16,), 11) * 0.1, _rand((16,), 12) * 0.1,
                           _rand((16,), 13) * 0.1, _rand((32,), 14) * 0.1)

    ref = leaky_relu(conv2d(x, k1a, b1a, stride=2, padding=1))
    ref = leaky_relu(conv2d(ref, k1aa, b1aa, stride=1, padding=1))
    lvl1 = leaky_relu(conv2d(ref, k1b, b1b, stride=1, padding=1))
    ref2 = leaky_relu(conv2d(lvl1, k2a, b2a, stride=2, padding=1))

    y = BL.conv_blocked_s2(x, BL.blocked_s2_kernel(k1a))
    y = leaky_relu(y + BL.to_blocked_bias(b1a))
    y = leaky_relu(BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1aa))
                   + BL.to_blocked_bias(b1aa))
    y = leaky_relu(BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1b))
                   + BL.to_blocked_bias(b1b))
    lvl1_blk = y
    out2 = leaky_relu(BL.conv_blocked_consumer(
        lvl1_blk, BL.blocked_consumer_kernel(k2a)) + b2a)

    np.testing.assert_allclose(np.asarray(BL.depth_to_space(lvl1_blk)),
                               np.asarray(lvl1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_model_blocked_lvl1_matches_unblocked():
    """PWCDCNet(use_blocked_lvl1=True) must match the plain fast-mode model
    bit-near-exactly (same params, same tree) and keep gradients flowing."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    import jax.tree_util as jtu
    x = _rand((1, 64, 128, 6), 20) * 0.2 + 0.5
    m0 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=False)
    m1 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=True)
    params = _jinit(m0, jax.random.PRNGKey(0), x)
    p1 = _jinit(m1, jax.random.PRNGKey(0), x)
    assert jtu.tree_structure(params) == jtu.tree_structure(p1)
    assert all(a.shape == b.shape for a, b in
               zip(jtu.tree_leaves(params), jtu.tree_leaves(p1)))
    o0 = _japply(m0)(params, x)
    o1 = _japply(m1)(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-5, rtol=1e-4)
    g = jax.jit(jax.grad(lambda p: float(0) + jnp.sum(
        m1.apply({"params": p}, x, train=True)[0] ** 2)))(params)
    assert float(jnp.linalg.norm(g["conv1a"]["kernel"])) > 0


def test_s2d_dilated_conv_matches_plain():
    """Dilated 3×3 conv via dilation phases == XLA dilated conv, exactly."""
    from opticalflow_tpu.ops.convops import leaky_relu
    for d in (2, 4, 8, 16):
        x = _rand((2, 32, 64, 8), 30 + d)
        k = _rand((3, 3, 8, 12), 40 + d) * 0.2
        ref = conv2d(x, k, None, stride=1, padding=d, dilation=d)
        xb = BL.space_to_depth_d(x, d)
        yb = conv2d(xb, k, None, stride=1, padding=1)
        out = BL.depth_to_space_d(yb, d, x.shape[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_model_piece_dense_matches_plain():
    """Producer-piece level-2 dense block (use_piece_dense) must match the
    plain fast-mode model with identical params, incl. under grad."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    import jax.tree_util as jtu
    x = _rand((2, 64, 128, 6), 60) * 0.2 + 0.5
    m0 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=False, use_piece_dense=False)
    m1 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=False, use_piece_dense=True)
    params = _jinit(m0, jax.random.PRNGKey(0), x)
    p1 = _jinit(m1, jax.random.PRNGKey(0), x)
    assert jtu.tree_structure(params) == jtu.tree_structure(p1)
    assert all(a.shape == b.shape for a, b in
               zip(jtu.tree_leaves(params), jtu.tree_leaves(p1)))
    o0 = _japply(m0)(params, x)
    o1 = _japply(m1)(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-5, rtol=1e-4)
    # training branch + gradients through the sliced-kernel form
    t0 = _japply(m0)(params, x, train=True)
    t1 = _japply(m1)(params, x, train=True)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
    g0 = jax.jit(jax.grad(lambda p: jnp.sum(
        m0.apply({"params": p}, x, train=True)[0] ** 2)))(params)
    g1 = jax.jit(jax.grad(lambda p: jnp.sum(
        m1.apply({"params": p}, x, train=True)[0] ** 2)))(params)
    for name in ("conv2_0", "conv2_4", "predict_flow2", "dc_conv1", "conv1a"):
        np.testing.assert_allclose(np.asarray(g1[name]["kernel"]),
                                   np.asarray(g0[name]["kernel"]),
                                   atol=2e-4, rtol=1e-3)


def test_fused_up_deconvs_match_plain():
    """One 4-lane [deconv|upfeat] deconv per level must match the two
    separate Deconvs with identical params (tree unchanged), incl. grad."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    import jax.tree_util as jtu
    x = _rand((1, 64, 128, 6), 90) * 0.2 + 0.5
    m0 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  fuse_up_deconvs=False)
    m1 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  fuse_up_deconvs=True)
    params = _jinit(m0, jax.random.PRNGKey(0), x)
    p1 = _jinit(m1, jax.random.PRNGKey(0), x)
    assert jtu.tree_structure(params) == jtu.tree_structure(p1)
    o0 = _japply(m0)(params, x)
    o1 = _japply(m1)(params, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-5, rtol=1e-4)
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        m1.apply({"params": p}, x, train=True)[0] ** 2)))(params)
    for name in ("deconv3", "upfeat3", "deconv6", "upfeat6"):
        assert float(jnp.linalg.norm(g[name]["kernel"])) > 0, name


def test_fused_up_deconvs_old_variant():
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    x = _rand((1, 64, 64, 6), 91) * 0.2 + 0.5
    m0 = PWCDCNet(variant="old", precision="fast", use_pallas_corr=False,
                  fuse_up_deconvs=False)
    m1 = PWCDCNet(variant="old", precision="fast", use_pallas_corr=False,
                  fuse_up_deconvs=True)
    params = _jinit(m0, jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(_japply(m1)(params, x)),
        np.asarray(_japply(m0)(params, x)),
        atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_bf16_fast_model_differentiates():
    """bfloat16 + fast must be trainable end-to-end: the blocked conv path
    once emitted f32-out convs with bf16 kernels, whose transpose has no
    rule (caught by scripts/bench_train.py on TPU)."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    x = _rand((1, 64, 128, 6), 70) * 0.2 + 0.5
    m = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast",
                 use_pallas_corr=False)
    params = _jinit(m, jax.random.PRNGKey(0), x)
    g = jax.jit(jax.grad(lambda p: jnp.sum(jnp.stack(
        [jnp.sum(f.astype(jnp.float32) ** 2)
         for f in m.apply({"params": p}, x, train=True)]))))(params)
    for name in ("conv1a", "conv2a", "conv2_0", "predict_flow2", "dc_conv5"):
        assert float(jnp.linalg.norm(g[name]["kernel"])) > 0, name


def test_highest_precision_keeps_plain_path():
    """Checkpoint-parity mode must not take the re-ordered blocked path."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    m = PWCDCNet(variant="new", precision="highest", use_pallas_corr=False)
    # the pyramid gate: blocked only in fast mode
    assert m.precision == "highest"
    x = _rand((1, 64, 64, 6), 21)
    params = _jinit(m, jax.random.PRNGKey(0), x)
    out = _japply(m)(params, x)
    assert out.shape == (1, 16, 16, 2)


def test_resolve_blocked_lvl1_auto():
    from opticalflow_tpu.models.pwcnet import (_BLOCKED_AUTO_MAX_BATCH,
                                               resolve_blocked_lvl1)
    assert resolve_blocked_lvl1("auto", 1) is True
    assert resolve_blocked_lvl1("auto", _BLOCKED_AUTO_MAX_BATCH - 1) is True
    assert resolve_blocked_lvl1("auto", _BLOCKED_AUTO_MAX_BATCH) is False
    assert resolve_blocked_lvl1("auto", 64) is False
    assert resolve_blocked_lvl1(True, 64) is True
    assert resolve_blocked_lvl1(False, 1) is False


def test_resolve_fuse_up_auto():
    from opticalflow_tpu.models.pwcnet import (_FUSE_UP_AUTO_MIN_BATCH,
                                               resolve_fuse_up)
    assert resolve_fuse_up("auto", 1) is False
    assert resolve_fuse_up("auto", _FUSE_UP_AUTO_MIN_BATCH - 1) is False
    assert resolve_fuse_up("auto", _FUSE_UP_AUTO_MIN_BATCH) is True
    assert resolve_fuse_up("auto", 8) is True
    assert resolve_fuse_up(True, 1) is True
    assert resolve_fuse_up(False, 64) is False


def test_fuse_up_auto_is_exact_across_the_threshold():
    """The default "auto" flag must produce identical outputs on either
    side of its batch threshold (same params, fused vs unfused program)."""
    from opticalflow_tpu.models.pwcnet import (_FUSE_UP_AUTO_MIN_BATCH,
                                               PWCDCNet)
    b = _FUSE_UP_AUTO_MIN_BATCH
    x = _rand((b, 64, 64, 6), 92) * 0.2 + 0.5
    m = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    params = _jinit(m, jax.random.PRNGKey(0), x[:1])
    big = np.asarray(_japply(m)(params, x))        # fused program (B >= 4)
    one = np.asarray(_japply(m)(params, x[:1]))    # unfused program (B=1)
    np.testing.assert_allclose(one, big[:1], atol=1e-5, rtol=1e-4)


def test_model_auto_matches_explicit_small_batch():
    """"auto" at a small batch must produce the blocked graph's numbers
    (which test_model_blocked_lvl1_matches_unblocked ties to the plain
    path); shapes/param tree are unchanged either way."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    x = _rand((2, 64, 64, 6), 21) * 0.2 + 0.5
    auto = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False)
    expl = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                    use_blocked_lvl1=True)
    params = _jinit(auto, jax.random.PRNGKey(0), x)
    oa = _japply(auto)(params, x)
    oe = _japply(expl)(params, x)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(oe))
